"""Author candidate DAWG cases (round-4 expansion: negation scoping,
subquery visibility, CONSTRUCT bnode isomorphism, aggregate error
propagation, expression corners) and dump them to /tmp/dawg_candidates.json
for scripts/dawg_verify.py.

Expected results are hand-derived from the SPARQL 1.1 Query spec (W3C REC
sparql11-query: section 8 Negation, 12 Subqueries, 16.2 CONSTRUCT, 18.5
aggregate evaluation incl. error propagation) — mirrors the reference's DAWG
harness intent (reference: src/dawg-tests/run.sh) with hand-authored cases.
"""

import json

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def u(v):
    return {"type": "uri", "value": v}


def lit(v, dt=None, lang=None):
    d = {"type": "literal", "value": v}
    if dt:
        d["datatype"] = XSD + dt if ":" not in dt.split("#")[0] or not dt.startswith("http") else dt
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


# ---------------------------------------------------------------- negation
PN = (
    '<urn:a> <urn:p> "1"^^<' + XSD + 'integer> .\n'
    '<urn:a> <urn:q> "1"^^<' + XSD + 'integer> .\n'
    '<urn:b> <urn:p> "2"^^<' + XSD + 'integer> .\n'
    '<urn:b> <urn:q> "3"^^<' + XSD + 'integer> .'
)
# Spec 8.3.3: the FILTER inside MINUS cannot see ?n (out of scope) -> the
# equality errors -> RHS empty -> nothing removed.
case(
    "minus-inner-filter-cannot-see-outer",
    PN,
    "SELECT ?x WHERE { ?x <urn:p> ?n MINUS { ?x <urn:q> ?m FILTER(?n = ?m) } }",
    [{"x": u("urn:a")}, {"x": u("urn:b")}],
)
# ...whereas NOT EXISTS substitutes the outer bindings, so ?n IS visible.
case(
    "notexists-sees-outer-var",
    PN,
    "SELECT ?x WHERE { ?x <urn:p> ?n FILTER NOT EXISTS { ?x <urn:q> ?m FILTER(?n = ?m) } }",
    [{"x": u("urn:b")}],
)
case(
    "double-negation-notexists",
    "<urn:a> <urn:p> <urn:b> .\n<urn:b> <urn:q> <urn:c> .\n"
    "<urn:c> <urn:r> <urn:d> .\n<urn:a> <urn:p> <urn:e> .\n"
    "<urn:e> <urn:q> <urn:f> .",
    "SELECT ?y WHERE { <urn:a> <urn:p> ?y FILTER NOT EXISTS { ?y <urn:q> ?z "
    "FILTER NOT EXISTS { ?z <urn:r> ?w } } }",
    [{"y": u("urn:b")}],
)
case(
    "notexists-inside-optional",
    '<urn:a> <urn:knows> <urn:b> .\n<urn:b> <urn:name> "B" .\n'
    '<urn:b> <urn:hidden> "1" .\n<urn:a> <urn:knows> <urn:c> .\n'
    '<urn:c> <urn:name> "C" .',
    "SELECT ?y ?nm WHERE { <urn:a> <urn:knows> ?y OPTIONAL { ?y <urn:name> ?nm "
    "FILTER NOT EXISTS { ?y <urn:hidden> ?h } } }",
    [{"y": u("urn:b")}, {"y": u("urn:c"), "nm": lit("C")}],
)
case(
    "minus-joins-on-bind-var",
    '<urn:a> <urn:p> "1"^^<' + XSD + 'integer> .\n'
    '<urn:b> <urn:p> "2"^^<' + XSD + 'integer> .\n'
    '<urn:skip> <urn:v> "2"^^<' + XSD + 'integer> .',
    "SELECT ?x WHERE { ?x <urn:p> ?n BIND(?n + 1 AS ?m) MINUS { <urn:skip> <urn:v> ?m } }",
    [{"x": u("urn:b")}],
)
case(
    "exists-keeps-all-matching",
    "<urn:a> <urn:p> <urn:b> .\n<urn:b> <urn:q> <urn:c> .\n"
    "<urn:a> <urn:p> <urn:d> .",
    "SELECT ?y WHERE { <urn:a> <urn:p> ?y FILTER EXISTS { ?y <urn:q> ?z } }",
    [{"y": u("urn:b")}],
)
case(
    "minus-unbound-side-disjoint",
    '<urn:a> <urn:p> "x" .\n<urn:z> <urn:q> "x" .',
    # RHS binds only ?o2: domains {s,o} vs {o2} are disjoint -> keep all
    "SELECT ?s WHERE { ?s <urn:p> ?o MINUS { <urn:z> <urn:q> ?o2 } }",
    [{"s": u("urn:a")}],
)

# ---------------------------------------------------------------- subquery
case(
    "subquery-agg-outer-filter",
    "<urn:a> <urn:knows> <urn:b> .\n<urn:a> <urn:knows> <urn:c> .\n"
    "<urn:b> <urn:knows> <urn:c> .",
    "SELECT ?s WHERE { { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <urn:knows> ?o } "
    "GROUP BY ?s } FILTER(?n >= 2) }",
    [{"s": u("urn:a")}],
)
case(
    "subquery-orderlimit-then-join",
    '<urn:a> <urn:score> "3"^^<' + XSD + 'integer> .\n'
    '<urn:b> <urn:score> "5"^^<' + XSD + 'integer> .\n'
    '<urn:c> <urn:score> "4"^^<' + XSD + 'integer> .\n'
    '<urn:b> <urn:name> "Bee" .',
    "SELECT ?nm WHERE { { SELECT ?x WHERE { ?x <urn:score> ?sc } "
    "ORDER BY DESC(?sc) LIMIT 1 } ?x <urn:name> ?nm }",
    [{"nm": lit("Bee")}],
)
case(
    "subquery-unprojected-var-invisible",
    '<urn:a> <urn:p> "1" .\n<urn:a> <urn:q> "2" .',
    # inner ?v is NOT projected, so the outer ?v is a fresh variable and
    # binds from the q triple
    "SELECT ?x ?v WHERE { { SELECT ?x WHERE { ?x <urn:p> ?v } } ?x <urn:q> ?v }",
    [{"x": u("urn:a"), "v": lit("2")}],
)
case(
    "subquery-values-inside",
    '<urn:a> <urn:p> "1" .\n<urn:c> <urn:p> "2" .\n<urn:b> <urn:p> "3" .',
    "SELECT ?x ?o WHERE { { SELECT ?x WHERE { VALUES ?x { <urn:a> <urn:b> } } } "
    "?x <urn:p> ?o }",
    [{"x": u("urn:a"), "o": lit("1")}, {"x": u("urn:b"), "o": lit("3")}],
)
case(
    "nested-subquery-count-distinct",
    '<urn:a> <urn:p> "1" .\n<urn:a> <urn:p> "2" .\n<urn:b> <urn:p> "3" .',
    "SELECT ?n WHERE { { SELECT (COUNT(?x) AS ?n) WHERE { "
    "{ SELECT DISTINCT ?x WHERE { ?x <urn:p> ?o } } } } }",
    [{"n": i(2)}],
)
case(
    "subquery-groupkey-joins-outer",
    "<urn:a> <urn:t> <urn:x> .\n<urn:a> <urn:t> <urn:y> .\n"
    '<urn:b> <urn:t> <urn:x> .\n<urn:a> <urn:name> "A" .\n'
    '<urn:b> <urn:name> "B" .',
    "SELECT ?nm ?n WHERE { ?s <urn:name> ?nm { SELECT ?s (COUNT(*) AS ?n) "
    "WHERE { ?s <urn:t> ?o } GROUP BY ?s } }",
    [{"nm": lit("A"), "n": i(2)}, {"nm": lit("B"), "n": i(1)}],
)

# ------------------------------------------------- CONSTRUCT bnode templates
case(
    "construct-bnode-fresh-per-row",
    '<urn:a> <urn:p> "1" .\n<urn:b> <urn:p> "2" .',
    "CONSTRUCT { ?x <urn:tagged> _:t } WHERE { ?x <urn:p> ?v }",
    construct_isomorphic=[
        "<urn:a> <urn:tagged> _:t0 .",
        "<urn:b> <urn:tagged> _:t1 .",
    ],
)
case(
    "construct-bnode-shared-within-row",
    '<urn:a> <urn:p> "1" .\n<urn:b> <urn:p> "2" .',
    "CONSTRUCT { ?x <urn:r> _:n . _:n <urn:val> ?v } WHERE { ?x <urn:p> ?v }",
    construct_isomorphic=[
        "<urn:a> <urn:r> _:n0 .",
        '_:n0 <urn:val> "1" .',
        "<urn:b> <urn:r> _:n1 .",
        '_:n1 <urn:val> "2" .',
    ],
)

# ------------------------------------------------ aggregate error handling
AG = (
    '<urn:g1> <urn:v> "1"^^<' + XSD + 'integer> .\n'
    '<urn:g1> <urn:v> "oops" .\n'
    '<urn:g2> <urn:v> "2"^^<' + XSD + 'integer> .\n'
    '<urn:g2> <urn:v> "3"^^<' + XSD + 'integer> .'
)
# Spec 18.5: an error in SUM's operand makes the aggregate error -> the
# variable is simply unbound for that group; the group row survives.
case(
    "sum-type-error-leaves-unbound",
    AG,
    "SELECT ?s (SUM(?x) AS ?sum) WHERE { ?s <urn:v> ?x } GROUP BY ?s",
    [{"s": u("urn:g1")}, {"s": u("urn:g2"), "sum": i(5)}],
)
case(
    "having-drops-error-group",
    AG,
    "SELECT ?s (SUM(?x) AS ?sum) WHERE { ?s <urn:v> ?x } GROUP BY ?s "
    "HAVING(?sum > 0)",
    [{"s": u("urn:g2"), "sum": i(5)}],
)
case(
    "empty-group-sum-zero-max-unbound",
    '<urn:a> <urn:p> "x" .',
    "SELECT (SUM(?x) AS ?s) (MAX(?x) AS ?m) (COUNT(?x) AS ?c) "
    "WHERE { ?y <urn:nosuch> ?x }",
    [{"s": i(0), "c": i(0)}],
)
case(
    "count-star-counts-partial-rows",
    "<urn:a> <urn:knows> <urn:b> .\n"
    '<urn:b> <urn:name> "B" .\n'
    "<urn:a> <urn:knows> <urn:c> .",
    "SELECT (COUNT(*) AS ?all) (COUNT(?nm) AS ?named) WHERE "
    "{ <urn:a> <urn:knows> ?y OPTIONAL { ?y <urn:name> ?nm } }",
    [{"all": i(2), "named": i(1)}],
)
case(
    "sum-distinct-vs-plain",
    '<urn:a> <urn:v> "1"^^<' + XSD + 'integer> .\n'
    '<urn:b> <urn:v> "1"^^<' + XSD + 'integer> .\n'
    '<urn:c> <urn:v> "2"^^<' + XSD + 'integer> .',
    "SELECT (SUM(?x) AS ?s) (SUM(DISTINCT ?x) AS ?sd) WHERE { ?d <urn:v> ?x }",
    [{"s": i(4), "sd": i(3)}],
)
case(
    "avg-error-group-isolated",
    AG,
    "SELECT ?s (AVG(?x) AS ?a) WHERE { ?s <urn:v> ?x } GROUP BY ?s",
    [{"s": u("urn:g1")},
     {"s": u("urn:g2"), "a": lit("2.5", "decimal")}],
)

print(json.dumps({"cases": CASES}, indent=1), file=open("/tmp/dawg_candidates.json", "w"))
print(f"{len(CASES)} cases written")
