"""Author candidate DAWG cases — batch 6: aggregate error propagation,
XPath SUBSTR edge positions, non-well-designed nested OPTIONAL, VALUES
with UNDEF columns, timezone-aware dateTime value compare, REPLACE
capture groups, error-valued BIND/IF, empty-group aggregates.
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


INT = f"<{XSD}integer>"

# --- aggregate error propagation (SPARQL 1.1 §11.2: an aggregate whose
# evaluation raises an error leaves its output variable UNBOUND for that
# group; other groups are unaffected)

# --- XPath fn:substring position semantics (SPARQL 17.4.3.3: SUBSTR is
# fn:substring — 1-based, start 0 or negative shifts the window, the
# length counts from the *unclamped* start)
case(
    "substr-zero-start",
    '<urn:a> <urn:p> "hello" .',
    "SELECT ?r WHERE { <urn:a> <urn:p> ?v BIND(SUBSTR(?v, 0, 3) AS ?r) }",
    [{"r": lit("he")}],
)
case(
    "substr-negative-start",
    '<urn:a> <urn:p> "hello" .',
    "SELECT ?r WHERE { <urn:a> <urn:p> ?v BIND(SUBSTR(?v, -1, 3) AS ?r) }",
    [{"r": lit("h")}],
)
case(
    "substr-no-length-from-zero",
    '<urn:a> <urn:p> "hello" .',
    "SELECT ?r WHERE { <urn:a> <urn:p> ?v BIND(SUBSTR(?v, 0) AS ?r) }",
    [{"r": lit("hello")}],
)

# --- non-well-designed nested OPTIONAL (Perez et al.: the inner OPTIONAL
# mentions an outer variable that is NOT bound in its parent group;
# bottom-up semantics bind it freely inside, then the outer join filters)
case(
    "nested-optional-non-well-designed-join",
    "<urn:a> <urn:p> <urn:b> .\n<urn:b> <urn:q> <urn:c> .\n"
    "<urn:a> <urn:r> <urn:c> .",
    "SELECT ?x ?y ?z WHERE { ?x <urn:p> ?y OPTIONAL { ?y <urn:q> ?z "
    "OPTIONAL { ?x <urn:r> ?z } } }",
    [{"x": u("urn:a"), "y": u("urn:b"), "z": u("urn:c")}],
)
case(
    "nested-optional-non-well-designed-conflict",
    "<urn:a> <urn:p> <urn:b> .\n<urn:b> <urn:q> <urn:c> .\n"
    "<urn:d> <urn:r> <urn:c> .",
    # inner OPTIONAL binds ?x=d; the merged right side {y=b,z=c,x=d} is
    # INCOMPATIBLE with the outer {x=a,y=b}, so the outer row survives
    # bare — z stays unbound even though {?y q ?z} alone matched
    "SELECT ?x ?y ?z WHERE { ?x <urn:p> ?y OPTIONAL { ?y <urn:q> ?z "
    "OPTIONAL { ?x <urn:r> ?z } } }",
    [{"x": u("urn:a"), "y": u("urn:b")}],
)

# --- VALUES with UNDEF in either column (§10.2: UNDEF leaves the var
# unbound in that row; the join treats it as compatible-with-anything)

# --- timezone-aware dateTime VALUE comparison (op:dateTime-equal works
# on the timeline, not the lexical form)
case(
    "datetime-timezone-value-equal",
    f'<urn:a> <urn:t> "2020-01-01T10:00:00+01:00"^^<{XSD}dateTime> .\n'
    f'<urn:b> <urn:t> "2020-01-01T09:00:00Z"^^<{XSD}dateTime> .\n'
    f'<urn:c> <urn:t> "2020-01-01T09:00:00+01:00"^^<{XSD}dateTime> .',
    "SELECT ?x ?y WHERE { ?x <urn:t> ?tx . ?y <urn:t> ?ty "
    "FILTER (?tx = ?ty && STR(?x) < STR(?y)) }",
    [{"x": u("urn:a"), "y": u("urn:b")}],
)
case(
    "decimal-value-equal-lexical-differs",
    f'<urn:a> <urn:d> "0.5"^^<{XSD}decimal> .\n'
    f'<urn:b> <urn:d> "0.50"^^<{XSD}decimal> .',
    "SELECT ?x ?y WHERE { ?x <urn:d> ?dx . ?y <urn:d> ?dy "
    "FILTER (?dx = ?dy && !sameTerm(?dx, ?dy) && STR(?x) < STR(?y)) }",
    [{"x": u("urn:a"), "y": u("urn:b")}],
)

# --- REPLACE with capture-group references (fn:replace $N syntax)

# --- error-valued expressions in BIND leave the var unbound (§10.1)
case(
    "bind-division-by-zero-unbound",
    f'<urn:a> <urn:v> "1"^^{INT} .',
    "SELECT ?v ?r WHERE { <urn:a> <urn:v> ?v BIND(?v / 0 AS ?r) }",
    [{"v": i(1)}],
)
case(
    "if-error-condition-unbound",
    f'<urn:a> <urn:v> "1"^^{INT} .',
    'SELECT ?r WHERE { <urn:a> <urn:v> ?v BIND(IF(?v/0 > 0, "a", "b") AS ?r) }',
    [{}],
)
case(
    "strdt-on-langtagged-is-error",
    '<urn:a> <urn:p> "x"@en .',
    f"SELECT ?r WHERE {{ <urn:a> <urn:p> ?v BIND(STRDT(?v, <{XSD}string>) AS ?r) }}",
    [{}],
)

# --- language propagation corners

# --- misc builtins
case(
    "encode-for-uri-unicode-space",
    '<urn:a> <urn:p> "café /x" .',
    "SELECT ?r WHERE { <urn:a> <urn:p> ?v BIND(ENCODE_FOR_URI(?v) AS ?r) }",
    [{"r": lit("caf%C3%A9%20%2Fx")}],
)
case(
    "md5-empty-string",
    '<urn:a> <urn:p> "" .',
    "SELECT ?r WHERE { <urn:a> <urn:p> ?v BIND(MD5(?v) AS ?r) }",
    [{"r": lit("d41d8cd98f00b204e9800998ecf8427e")}],
)
case(
    "path-seq-inside-star",
    "<urn:a> <urn:p> <urn:m> .\n<urn:m> <urn:q> <urn:b> .\n"
    "<urn:b> <urn:p> <urn:n> .\n<urn:n> <urn:q> <urn:c> .",
    # (p/q)*: zero steps (a,a) plus one (a,b) plus two (a,c)
    "SELECT ?y WHERE { <urn:a> (<urn:p>/<urn:q>)* ?y }",
    [{"y": u("urn:a")}, {"y": u("urn:b")}, {"y": u("urn:c")}],
)
case(
    "group-by-alias-in-having",
    f'<urn:a> <urn:v> "2"^^{INT} .\n<urn:b> <urn:v> "6"^^{INT} .',
    "SELECT ?h WHERE { ?s <urn:v> ?v } GROUP BY (?v / 2 AS ?h) "
    "HAVING (?h > 2)",
    [{"h": lit("3", "decimal")}],
)

with open("/tmp/dawg_candidates.json", "w", encoding="utf-8") as fh:
    json.dump({"cases": CASES}, fh, indent=1)
print(f"{len(CASES)} candidates -> /tmp/dawg_candidates.json")
