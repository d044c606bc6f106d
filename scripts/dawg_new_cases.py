"""Author candidate DAWG cases — batch 5: negated property sets with
inverse members, CONSTRUCT WHERE shorthand, ORDER BY aggregate alias,
regex anchors, hash builtins, string-function lang propagation.
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


def i(n):
    return lit(str(n), "integer")


CASES = []


def case(name, data, query, results=None, **kw):
    c = {"name": name, "data": data, "query": query}
    if results is not None:
        c["results"] = results
    c.update(kw)
    CASES.append(c)


case(
    "path-nps-with-inverse-member",
    "<urn:a> <urn:p> <urn:b> .\n<urn:c> <urn:q> <urn:a> .",
    # !(z|^q): any forward edge not labelled z, plus any backward edge
    # not labelled q. Forward: (a,b) via p and (c,a) via q. Backward:
    # (b,a) via ^p only (^q excluded).
    "SELECT ?x ?y WHERE { ?x !(<urn:z>|^<urn:q>) ?y }",
    [{"x": u("urn:a"), "y": u("urn:b")},
     {"x": u("urn:c"), "y": u("urn:a")},
     {"x": u("urn:b"), "y": u("urn:a")}],
)
case(
    "path-nps-inverse-only",
    "<urn:a> <urn:p> <urn:b> .\n<urn:a> <urn:q> <urn:c> .",
    # !(^p): backward edges not labelled p -> only ^q contributes (c,a);
    # the component has no forward members, so NO forward edge matches
    "SELECT ?x ?y WHERE { ?x !(^<urn:p>) ?y }",
    [{"x": u("urn:c"), "y": u("urn:a")}],
)
case(
    "construct-where-shorthand",
    '<urn:a> <urn:p> "1" .\n<urn:b> <urn:q> <urn:c> .',
    "CONSTRUCT WHERE { ?s <urn:p> ?o }",
    construct_ntriples=['<urn:a> <urn:p> "1" .'],
)
case(
    "order-by-aggregate-alias",
    "<urn:a> <urn:t> <urn:x> .\n<urn:a> <urn:t> <urn:y> .\n"
    "<urn:b> <urn:t> <urn:x> .\n<urn:c> <urn:t> <urn:x> .\n"
    "<urn:c> <urn:t> <urn:y> .\n<urn:c> <urn:t> <urn:z> .",
    "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s <urn:t> ?o } GROUP BY ?s "
    "ORDER BY DESC(?n) ?s",
    [{"s": u("urn:c"), "n": i(3)}, {"s": u("urn:a"), "n": i(2)},
     {"s": u("urn:b"), "n": i(1)}],
    ordered=True,
)
case(
    "regex-anchors",
    '<urn:a> <urn:v> "hello" .\n<urn:b> <urn:v> "othello!" .',
    'SELECT ?s WHERE { ?s <urn:v> ?v FILTER(REGEX(?v, "^h.*o$")) }',
    [{"s": u("urn:a")}],
)
case(
    "regex-escaped-dot",
    '<urn:a> <urn:v> "a.b" .\n<urn:b> <urn:v> "axb" .',
    'SELECT ?s WHERE { ?s <urn:v> ?v FILTER(REGEX(?v, "a\\\\.b")) }',
    [{"s": u("urn:a")}],
)
case(
    "md5-sha256-of-string",
    '<urn:a> <urn:v> "abc" .',
    'SELECT ?s WHERE { ?s <urn:v> ?v '
    'FILTER(MD5(?v) = "900150983cd24fb0d6963f7d28e17f72" && '
    'SHA256(?v) = '
    '"ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad") }',
    [{"s": u("urn:a")}],
)
case(
    "strbefore-keeps-lang",
    '<urn:a> <urn:p> "abc"@en .',
    'SELECT ?r WHERE { <urn:a> <urn:p> ?s BIND(STRBEFORE(?s, "b") AS ?r) }',
    [{"r": lit("a", lang="en")}],
)
case(
    "replace-keeps-lang",
    '<urn:a> <urn:p> "abcabc"@fr .',
    'SELECT ?r WHERE { <urn:a> <urn:p> ?s '
    'BIND(REPLACE(?s, "b", "-") AS ?r) }',
    [{"r": lit("a-ca-c", lang="fr")}],
)
case(
    "contains-case-sensitive",
    '<urn:a> <urn:v> "Hello World" .',
    'SELECT ?s WHERE { ?s <urn:v> ?v '
    'FILTER(CONTAINS(?v, "World") && !CONTAINS(?v, "world")) }',
    [{"s": u("urn:a")}],
)
case(
    "sameterm-distinguishes-datatype",
    '<urn:a> <urn:v> "1"^^<' + XSD + 'integer> .\n'
    '<urn:b> <urn:v> "1"^^<' + XSD + 'double> .',
    # = is numeric value equality (both match); sameTerm is not
    "SELECT ?s WHERE { ?s <urn:v> ?v "
    'FILTER(?v = 1 && !sameTerm(?v, "1"^^<' + XSD + 'double>)) }',
    [{"s": u("urn:a")}],
)
case(
    "union-bind-scoped-to-branch",
    '<urn:a> <urn:p> "1"^^<' + XSD + 'integer> .\n'
    '<urn:b> <urn:q> "2"^^<' + XSD + 'integer> .',
    'SELECT ?s ?tag WHERE { { ?s <urn:p> ?v BIND("left" AS ?tag) } '
    "UNION { ?s <urn:q> ?v } }",
    [{"s": u("urn:a"), "tag": lit("left")}, {"s": u("urn:b")}],
)

json.dump({"cases": CASES}, open("/tmp/dawg_candidates.json", "w"), indent=1)
print(f"{len(CASES)} cases written")
