"""Author candidate DAWG cases — batch 4: EXISTS in value position
(BIND / || / IF), enabled by translator._materialize_exists.
Dumps to /tmp/dawg_candidates.json for scripts/dawg_verify.py.
"""

import json

XSD = "http://www.w3.org/2001/XMLSchema#"


def u(v):
    return {"type": "uri", "value": v}


def lit(v, dt=None, lang=None):
    d = {"type": "literal", "value": v}
    if dt:
        d["datatype"] = (XSD + dt) if not dt.startswith("http") else dt
    if lang:
        d["xml:lang"] = lang
    return d


CASES = []


def case(name, data, query, results=None, **kw):
    c = {"name": name, "data": data, "query": query}
    if results is not None:
        c["results"] = results
    c.update(kw)
    CASES.append(c)


DATA = (
    '<urn:a> <urn:knows> <urn:b> .\n'
    '<urn:a> <urn:knows> <urn:c> .\n'
    '<urn:b> <urn:name> "B" .'
)
case(
    "bind-exists-boolean-value",
    DATA,
    "SELECT ?y ?named WHERE { <urn:a> <urn:knows> ?y "
    "BIND(EXISTS { ?y <urn:name> ?nm } AS ?named) }",
    [{"y": u("urn:b"), "named": lit("true", "boolean")},
     {"y": u("urn:c"), "named": lit("false", "boolean")}],
)
case(
    "bind-not-exists-value",
    DATA,
    "SELECT ?y ?anon WHERE { <urn:a> <urn:knows> ?y "
    "BIND(NOT EXISTS { ?y <urn:name> ?nm } AS ?anon) }",
    [{"y": u("urn:b"), "anon": lit("false", "boolean")},
     {"y": u("urn:c"), "anon": lit("true", "boolean")}],
)
case(
    "filter-exists-under-or",
    '<urn:a> <urn:knows> <urn:b> .\n<urn:a> <urn:knows> <urn:c> .\n'
    '<urn:b> <urn:name> "B" .\n<urn:c> <urn:vip> <urn:yes> .\n'
    '<urn:a> <urn:knows> <urn:d> .',
    "SELECT ?y WHERE { <urn:a> <urn:knows> ?y "
    "FILTER(EXISTS { ?y <urn:name> ?nm } || EXISTS { ?y <urn:vip> ?v }) }",
    [{"y": u("urn:b")}, {"y": u("urn:c")}],
)
case(
    "if-exists-condition",
    DATA,
    'SELECT ?y ?tag WHERE { <urn:a> <urn:knows> ?y '
    'BIND(IF(EXISTS { ?y <urn:name> ?nm }, "named", "anon") AS ?tag) }',
    [{"y": u("urn:b"), "tag": lit("named")},
     {"y": u("urn:c"), "tag": lit("anon")}],
)
case(
    "optional-filter-exists-or",
    '<urn:a> <urn:knows> <urn:b> .\n<urn:b> <urn:name> "B" .\n'
    '<urn:b> <urn:vip> <urn:yes> .\n<urn:a> <urn:knows> <urn:c> .\n'
    '<urn:c> <urn:name> "C" .',
    # OPTIONAL whose lifted filter has EXISTS under ||: b qualifies via
    # vip, c does not (no vip, no flag)
    "SELECT ?y ?nm WHERE { <urn:a> <urn:knows> ?y OPTIONAL { "
    "?y <urn:name> ?nm FILTER(EXISTS { ?y <urn:vip> ?v } || "
    "EXISTS { ?y <urn:flag> ?f }) } }",
    [{"y": u("urn:b"), "nm": lit("B")}, {"y": u("urn:c")}],
)

json.dump({"cases": CASES}, open("/tmp/dawg_candidates.json", "w"), indent=1)
print(f"{len(CASES)} cases written")
