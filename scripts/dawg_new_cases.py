"""Author candidate DAWG cases — batch 7 (VERDICT r4 #4): Update
operations inside GRAPH (the reference suite's update-silent /
update-where categories), VALUES multisets with UNDEF in join
positions, nested-subquery aggregate scoping, plus ORDER BY / path /
EXISTS breadth. Dumps to /tmp/dawg_candidates.json for
scripts/dawg_verify.py.

Every expectation below is hand-derived from the SPARQL 1.1 Query /
Update specs first, then cross-checked against the engine by the
verifier — disagreement means one of the two is wrong and gets
investigated, never excused silently.
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


def ucase(name, data, update, expect):
    CASES.append(
        {"name": name, "data": data, "update": update,
         "expect_nquads": expect}
    )


INT = f"<{XSD}integer>"
G1, G2 = "urn:g1", "urn:g2"

# =====================================================================
# 1. UPDATE operations inside GRAPH
# =====================================================================

ucase(
    "update-insert-data-graph",
    "",
    f'INSERT DATA {{ GRAPH <{G1}> {{ <urn:s> <urn:p> "v" }} }}',
    [f'<urn:s> <urn:p> "v" <{G1}> .'],
)

ucase(
    "update-insert-data-mixed-graphs",
    "",
    f'INSERT DATA {{ <urn:s> <urn:p> "d" . '
    f'GRAPH <{G1}> {{ <urn:s> <urn:p> "a" }} '
    f'GRAPH <{G2}> {{ <urn:s> <urn:p> "b" }} }}',
    [
        '<urn:s> <urn:p> "d" .',
        f'<urn:s> <urn:p> "a" <{G1}> .',
        f'<urn:s> <urn:p> "b" <{G2}> .',
    ],
)

ucase(
    "update-delete-data-graph-scoped",
    f'<urn:s> <urn:p> "v" .\n<urn:s> <urn:p> "v" <{G1}> .',
    f'DELETE DATA {{ GRAPH <{G1}> {{ <urn:s> <urn:p> "v" }} }}',
    ['<urn:s> <urn:p> "v" .'],  # only the named-graph copy goes
)

ucase(
    "update-delete-data-default-keeps-graph",
    f'<urn:s> <urn:p> "v" .\n<urn:s> <urn:p> "v" <{G1}> .',
    'DELETE DATA { <urn:s> <urn:p> "v" }',
    [f'<urn:s> <urn:p> "v" <{G1}> .'],
)

ucase(
    "update-delete-data-nonexistent-noop",
    '<urn:s> <urn:p> "v" .',
    f'DELETE DATA {{ GRAPH <{G1}> {{ <urn:s> <urn:p> "v" }} }}',
    ['<urn:s> <urn:p> "v" .'],
)

ucase(
    "update-insert-where-cross-graph",
    '<urn:a> <urn:p> "1"^^' + INT + ' .\n<urn:b> <urn:p> "2"^^' + INT
    + " .",
    f"INSERT {{ GRAPH <{G2}> {{ ?s <urn:q> ?o }} }} "
    "WHERE { ?s <urn:p> ?o }",
    [
        '<urn:a> <urn:p> "1"^^' + INT + " .",
        '<urn:b> <urn:p> "2"^^' + INT + " .",
        f'<urn:a> <urn:q> "1"^^' + INT + f" <{G2}> .",
        f'<urn:b> <urn:q> "2"^^' + INT + f" <{G2}> .",
    ],
)

ucase(
    "update-with-scopes-where-and-templates",
    f'<urn:a> <urn:p> "x" <{G1}> .\n<urn:a> <urn:p> "y" .',
    f"WITH <{G1}> DELETE {{ ?s <urn:p> ?o }} "
    "INSERT { ?s <urn:q> ?o } WHERE { ?s <urn:p> ?o }",
    [
        '<urn:a> <urn:p> "y" .',  # default graph untouched by WITH
        f'<urn:a> <urn:q> "x" <{G1}> .',
    ],
)

ucase(
    "update-with-insert-only",
    f'<urn:a> <urn:p> "x" <{G1}> .',
    f"WITH <{G1}> INSERT {{ ?s <urn:q> ?o }} WHERE {{ ?s <urn:p> ?o }}",
    [
        f'<urn:a> <urn:p> "x" <{G1}> .',
        f'<urn:a> <urn:q> "x" <{G1}> .',
    ],
)

ucase(
    "update-using-overrides-with",
    f'<urn:a> <urn:p> "g1" <{G1}> .\n<urn:a> <urn:p> "dft" .',
    # USING <g1> makes g1 the WHERE's default graph; WITH then only
    # scopes the templates (spec §3.1.3: USING overrides WITH for the
    # pattern). Grammar: UsingClause* sits AFTER the templates.
    f"WITH <{G2}> INSERT {{ ?s <urn:q> ?o }} USING <{G1}> "
    "WHERE { ?s <urn:p> ?o }",
    [
        f'<urn:a> <urn:p> "g1" <{G1}> .',
        '<urn:a> <urn:p> "dft" .',
        f'<urn:a> <urn:q> "g1" <{G2}> .',
    ],
)

ucase(
    "update-delete-where-graph-shorthand",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:a> <urn:p> "1" .',
    f"DELETE WHERE {{ GRAPH <{G1}> {{ ?s <urn:p> ?o }} }}",
    ['<urn:a> <urn:p> "1" .'],
)

ucase(
    "update-delete-where-graph-var-sweeps-named",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:a> <urn:p> "2" <{G2}> .\n'
    '<urn:a> <urn:p> "3" .',
    "DELETE WHERE { GRAPH ?g { ?s <urn:p> ?o } }",
    ['<urn:a> <urn:p> "3" .'],  # default graph is not a named graph
)

ucase(
    "update-insert-graph-var-tags-each-graph",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:b> <urn:p> "2" <{G2}> .',
    'INSERT { GRAPH ?g { ?s <urn:tag> "t" } } '
    "WHERE { GRAPH ?g { ?s <urn:p> ?o } }",
    [
        f'<urn:a> <urn:p> "1" <{G1}> .',
        f'<urn:b> <urn:p> "2" <{G2}> .',
        f'<urn:a> <urn:tag> "t" <{G1}> .',
        f'<urn:b> <urn:tag> "t" <{G2}> .',
    ],
)

ucase(
    "update-clear-graph",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:a> <urn:p> "2" .',
    f"CLEAR GRAPH <{G1}>",
    ['<urn:a> <urn:p> "2" .'],
)

ucase(
    "update-clear-default",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:a> <urn:p> "2" .',
    "CLEAR DEFAULT",
    [f'<urn:a> <urn:p> "1" <{G1}> .'],
)

ucase(
    "update-clear-named",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:a> <urn:p> "2" <{G2}> .\n'
    '<urn:a> <urn:p> "3" .',
    "CLEAR NAMED",
    ['<urn:a> <urn:p> "3" .'],
)

ucase(
    "update-clear-all",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:a> <urn:p> "2" .',
    "CLEAR ALL",
    [],
)

ucase(
    "update-drop-silent-nonexistent",
    '<urn:a> <urn:p> "1" .',
    "DROP SILENT GRAPH <urn:nope>",
    ['<urn:a> <urn:p> "1" .'],
)

ucase(
    "update-add-merges-keeps-source",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:b> <urn:p> "2" <{G2}> .',
    f"ADD <{G1}> TO <{G2}>",
    [
        f'<urn:a> <urn:p> "1" <{G1}> .',
        f'<urn:b> <urn:p> "2" <{G2}> .',
        f'<urn:a> <urn:p> "1" <{G2}> .',
    ],
)

ucase(
    "update-copy-overwrites-dest",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:b> <urn:p> "2" <{G2}> .',
    f"COPY <{G1}> TO <{G2}>",
    [
        f'<urn:a> <urn:p> "1" <{G1}> .',
        f'<urn:a> <urn:p> "1" <{G2}> .',
    ],
)

ucase(
    "update-move-drops-source-overwrites-dest",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:b> <urn:p> "2" <{G2}> .',
    f"MOVE <{G1}> TO <{G2}>",
    [f'<urn:a> <urn:p> "1" <{G2}> .'],
)

ucase(
    "update-move-to-self-noop",
    f'<urn:a> <urn:p> "1" <{G1}> .',
    f"MOVE <{G1}> TO <{G1}>",
    [f'<urn:a> <urn:p> "1" <{G1}> .'],
)

ucase(
    "update-add-default-to-graph",
    f'<urn:a> <urn:p> "1" .\n<urn:b> <urn:p> "2" <{G1}> .',
    f"ADD DEFAULT TO <{G1}>",
    [
        '<urn:a> <urn:p> "1" .',
        f'<urn:b> <urn:p> "2" <{G1}> .',
        f'<urn:a> <urn:p> "1" <{G1}> .',
    ],
)

ucase(
    "update-move-graph-to-default",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:b> <urn:p> "2" .',
    f"MOVE <{G1}> TO DEFAULT",
    ['<urn:a> <urn:p> "1" .'],
)

ucase(
    "update-sequence-semicolon",
    "",
    f'INSERT DATA {{ GRAPH <{G1}> {{ <urn:s> <urn:p> "a" }} }} ; '
    f'DELETE DATA {{ GRAPH <{G1}> {{ <urn:s> <urn:p> "a" }} }} ; '
    f'INSERT DATA {{ GRAPH <{G1}> {{ <urn:s> <urn:p> "b" }} }}',
    [f'<urn:s> <urn:p> "b" <{G1}> .'],
)

ucase(
    "update-delete-insert-same-triple",
    # WHERE evaluated against the ORIGINAL store; delete then insert ->
    # the triple survives (spec §3.1.3 order of operations)
    '<urn:a> <urn:p> "x" .',
    "DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:p> ?o } "
    "WHERE { ?s <urn:p> ?o }",
    ['<urn:a> <urn:p> "x" .'],
)

ucase(
    "update-delete-graph-insert-default",
    f'<urn:a> <urn:p> "x" <{G1}> .',
    f"DELETE {{ GRAPH <{G1}> {{ ?s <urn:p> ?o }} }} "
    "INSERT { ?s <urn:moved> ?o } "
    f"WHERE {{ GRAPH <{G1}> {{ ?s <urn:p> ?o }} }}",
    ['<urn:a> <urn:moved> "x" .'],
)

ucase(
    "update-insert-where-path-in-graph",
    f'<urn:a> <urn:n> <urn:b> <{G1}> .\n'
    f'<urn:b> <urn:n> <urn:c> <{G1}> .',
    f"INSERT {{ <urn:a> <urn:reach> ?x }} "
    f"WHERE {{ GRAPH <{G1}> {{ <urn:a> <urn:n>+ ?x }} }}",
    [
        f'<urn:a> <urn:n> <urn:b> <{G1}> .',
        f'<urn:b> <urn:n> <urn:c> <{G1}> .',
        "<urn:a> <urn:reach> <urn:b> .",
        "<urn:a> <urn:reach> <urn:c> .",
    ],
)

ucase(
    "update-using-named-restricts-graph-var",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:b> <urn:p> "2" <{G2}> .',
    f"INSERT {{ ?s <urn:seen> ?o }} USING NAMED <{G1}> "
    "WHERE { GRAPH ?g { ?s <urn:p> ?o } }",
    [
        f'<urn:a> <urn:p> "1" <{G1}> .',
        f'<urn:b> <urn:p> "2" <{G2}> .',
        '<urn:a> <urn:seen> "1" .',
    ],
)

# =====================================================================
# 2. VALUES multisets with UNDEF in join positions
# =====================================================================

_VDATA = (
    '<urn:a> <urn:p> "1"^^' + INT + " .\n"
    '<urn:b> <urn:p> "2"^^' + INT + " .\n"
    '<urn:c> <urn:p> "3"^^' + INT + " .\n"
)

case(
    "values-undef-join-wildcard",
    _VDATA,
    "SELECT ?s ?o WHERE { ?s <urn:p> ?o "
    'VALUES (?s ?o) { (<urn:a> UNDEF) (UNDEF "3"^^' + INT + ") } }",
    [
        {"s": u("urn:a"), "o": i(1)},
        {"s": u("urn:c"), "o": i(3)},
    ],
)

case(
    "values-undef-row-joins-all",
    _VDATA,
    "SELECT ?s WHERE { ?s <urn:p> ?o VALUES ?x { UNDEF } }",
    [{"s": u("urn:a")}, {"s": u("urn:b")}, {"s": u("urn:c")}],
)

case(
    "values-all-undef-row-wildcard",
    _VDATA,
    "SELECT ?s ?o WHERE { ?s <urn:p> ?o "
    "VALUES (?s ?o) { (UNDEF UNDEF) (<urn:a> UNDEF) } }",
    # row1 joins every solution; row2 only ?s=urn:a -> bag union
    [
        {"s": u("urn:a"), "o": i(1)},
        {"s": u("urn:b"), "o": i(2)},
        {"s": u("urn:c"), "o": i(3)},
        {"s": u("urn:a"), "o": i(1)},
    ],
)

case(
    "values-trailing-clause",
    _VDATA,
    "SELECT ?s ?o WHERE { ?s <urn:p> ?o } "
    "VALUES ?s { <urn:b> <urn:c> }",
    [{"s": u("urn:b"), "o": i(2)}, {"s": u("urn:c"), "o": i(3)}],
)

case(
    "values-multiset-duplicates-preserved",
    _VDATA,
    "SELECT ?s WHERE { ?s <urn:p> ?o "
    "VALUES ?s { <urn:a> <urn:a> } }",
    [{"s": u("urn:a")}, {"s": u("urn:a")}],
)

case(
    "values-undef-in-optional",
    _VDATA,
    "SELECT ?s ?x WHERE { ?s <urn:p> ?o "
    'OPTIONAL { VALUES (?s ?x) { (<urn:a> "hit") } } }',
    [
        {"s": u("urn:a"), "x": lit("hit")},
        {"s": u("urn:b")},
        {"s": u("urn:c")},
    ],
)

case(
    "values-in-subquery",
    _VDATA,
    "SELECT ?s ?o WHERE { "
    "{ SELECT ?s WHERE { VALUES ?s { <urn:a> <urn:b> } } } "
    "?s <urn:p> ?o }",
    [{"s": u("urn:a"), "o": i(1)}, {"s": u("urn:b"), "o": i(2)}],
)

case(
    "values-no-shared-vars-cross",
    _VDATA,
    "SELECT ?s ?y WHERE { ?s <urn:p> ?o VALUES ?y { 7 8 } "
    "FILTER(?s = <urn:a>) }",
    [{"s": u("urn:a"), "y": i(7)}, {"s": u("urn:a"), "y": i(8)}],
)

case(
    "values-undef-bound-filter",
    _VDATA,
    "SELECT ?s ?x WHERE { ?s <urn:p> ?o "
    'VALUES (?s ?x) { (<urn:a> "t") (<urn:b> UNDEF) } '
    "FILTER(BOUND(?x)) }",
    [{"s": u("urn:a"), "x": lit("t")}],
)

case(
    "values-undef-join-on-literal-identity",
    '<urn:a> <urn:p> "x"@en .\n<urn:b> <urn:p> "x" .',
    "SELECT ?s WHERE { ?s <urn:p> ?o "
    'VALUES ?o { "x"@en } }',
    [{"s": u("urn:a")}],  # lang-tagged and plain are different terms
)

case(
    "values-minus-interaction",
    _VDATA,
    # MINUS right side is a VALUES block sharing ?s: removes matching rows
    "SELECT ?s WHERE { ?s <urn:p> ?o "
    "MINUS { VALUES ?s { <urn:b> } } }",
    [{"s": u("urn:a")}, {"s": u("urn:c")}],
)

# =====================================================================
# 3. Nested subquery aggregate scoping
# =====================================================================

_SDATA = (
    "<urn:o1> <urn:of> <urn:c1> .\n"
    "<urn:o2> <urn:of> <urn:c1> .\n"
    "<urn:o3> <urn:of> <urn:c2> .\n"
    '<urn:c1> <urn:name> "one" .\n'
    '<urn:c2> <urn:name> "two" .\n'
    '<urn:c3> <urn:name> "three" .\n'
)

case(
    "subquery-agg-join-outer",
    _SDATA,
    "SELECT ?name ?n WHERE { ?c <urn:name> ?name "
    "{ SELECT ?c (COUNT(?o) AS ?n) WHERE { ?o <urn:of> ?c } "
    "GROUP BY ?c } }",
    [
        {"name": lit("one"), "n": i(2)},
        {"name": lit("two"), "n": i(1)},
    ],
)

case(
    "subquery-agg-in-optional",
    _SDATA,
    "SELECT ?name ?n WHERE { ?c <urn:name> ?name "
    "OPTIONAL { { SELECT ?c (COUNT(?o) AS ?n) "
    "WHERE { ?o <urn:of> ?c } GROUP BY ?c } } }",
    [
        {"name": lit("one"), "n": i(2)},
        {"name": lit("two"), "n": i(1)},
        {"name": lit("three")},
    ],
)

case(
    "subquery-agg-two-levels",
    _SDATA,
    # inner: orders per customer; outer: sum of those counts
    "SELECT (SUM(?n) AS ?total) WHERE { "
    "{ SELECT ?c (COUNT(?o) AS ?n) WHERE { ?o <urn:of> ?c } "
    "GROUP BY ?c } }",
    [{"total": i(3)}],
)

case(
    "subquery-unprojected-var-is-fresh",
    _SDATA,
    # ?o inside the subquery is NOT projected: the outer ?o is a brand
    # new variable, free to bind anything — no implicit join on the name
    "SELECT ?c ?o WHERE { "
    "{ SELECT ?c WHERE { ?o <urn:of> ?c } GROUP BY ?c } "
    '?c <urn:name> ?o }',
    [
        {"c": u("urn:c1"), "o": lit("one")},
        {"c": u("urn:c2"), "o": lit("two")},
    ],
)

case(
    "subquery-agg-having-alias",
    _SDATA,
    "SELECT ?c ?n WHERE { "
    "{ SELECT ?c (COUNT(?o) AS ?n) WHERE { ?o <urn:of> ?c } "
    "GROUP BY ?c HAVING (COUNT(?o) > 1) } }",
    [{"c": u("urn:c1"), "n": i(2)}],
)

case(
    "subquery-count-star-vs-var",
    "<urn:s1> <urn:p> <urn:x1> .\n"
    "<urn:s2> <urn:p> <urn:x2> .\n"
    '<urn:x1> <urn:q> "only-x1" .\n',
    # COUNT(*) counts all rows, COUNT(?v) skips rows where ?v is unbound
    "SELECT (COUNT(*) AS ?rows) (COUNT(?v) AS ?vals) WHERE { "
    "?s <urn:p> ?x OPTIONAL { ?x <urn:q> ?v } }",
    [{"rows": i(2), "vals": i(1)}],
)

case(
    "subquery-agg-group-by-expr",
    '<urn:a> <urn:v> "1"^^' + INT + ' .\n'
    '<urn:b> <urn:v> "2"^^' + INT + ' .\n'
    '<urn:c> <urn:v> "3"^^' + INT + ' .\n'
    '<urn:d> <urn:v> "4"^^' + INT + ' .\n',
    "SELECT ?par (COUNT(?s) AS ?n) WHERE { "
    "{ SELECT ?s ((?o - 2*FLOOR(?o/2)) AS ?par) "
    "WHERE { ?s <urn:v> ?o } } } GROUP BY ?par",
    [
        {"par": lit("0", "decimal"), "n": i(2)},
        {"par": lit("1", "decimal"), "n": i(2)},
    ],
)

case(
    "subquery-limit-then-count",
    '<urn:a> <urn:v> "1"^^' + INT + ' .\n'
    '<urn:b> <urn:v> "2"^^' + INT + ' .\n'
    '<urn:c> <urn:v> "3"^^' + INT + ' .\n',
    # inner ORDER+LIMIT 2 picks the two smallest; outer counts them
    "SELECT (COUNT(?s) AS ?n) WHERE { "
    "{ SELECT ?s WHERE { ?s <urn:v> ?o } ORDER BY ?o LIMIT 2 } }",
    [{"n": i(2)}],
)

case(
    "subquery-sample-groups",
    _SDATA,
    "SELECT ?c (SAMPLE(?o) AS ?any) WHERE { ?o <urn:of> ?c } "
    "GROUP BY ?c HAVING (COUNT(?o) = 1)",
    [{"c": u("urn:c2"), "any": u("urn:o3")}],
)

case(
    "subquery-agg-implicit-group-inner",
    _SDATA,
    # inner implicit-group aggregate (no GROUP BY): ONE row; outer joins
    "SELECT ?total ?name WHERE { "
    "{ SELECT (COUNT(?o) AS ?total) WHERE { ?o <urn:of> ?c } } "
    '?x <urn:name> ?name FILTER(?name = "one") }',
    [{"total": i(3), "name": lit("one")}],
)

case(
    "subquery-nested-three-deep",
    _SDATA,
    "SELECT ?c WHERE { { SELECT ?c WHERE { "
    "{ SELECT ?c WHERE { ?o <urn:of> ?c } GROUP BY ?c } } } }",
    [{"c": u("urn:c1")}, {"c": u("urn:c2")}],
)

case(
    "subquery-groupconcat-scoped",
    _SDATA,
    'SELECT ?c ?who WHERE { '
    "{ SELECT ?c (GROUP_CONCAT(STR(?o); SEPARATOR=\",\") AS ?who) "
    "WHERE { ?o <urn:of> ?c } GROUP BY ?c } "
    "FILTER(?c = <urn:c2>) }",
    [{"c": u("urn:c2"), "who": lit("urn:o3")}],
)

# =====================================================================
# 4. Breadth: ORDER BY mixed kinds, paths under GRAPH, EXISTS corners
# =====================================================================

case(
    "order-mixed-kinds-total",
    "<urn:s1> <urn:m> <urn:z> .\n"
    '<urn:s2> <urn:m> "txt" .\n'
    '<urn:s3> <urn:m> "5"^^' + INT + " .\n"
    "<urn:s4> <urn:m> _:bn .\n",
    # unbound < bnode < IRI < literal; numeric literal before plain
    "SELECT ?s WHERE { ?x <urn:m> ?o . ?x <urn:m> ?o2 "
    "BIND(STR(?x) AS ?s) } ORDER BY ?o LIMIT 4",
    [
        {"s": lit("urn:s4")},
        {"s": lit("urn:s1")},
        {"s": lit("urn:s3")},
        {"s": lit("urn:s2")},
    ],
    ordered=True,
)

case(
    "order-desc-unbound-last",
    '<urn:a> <urn:p> "1"^^' + INT + " .\n"
    '<urn:b> <urn:p> "2"^^' + INT + " .\n"
    '<urn:a> <urn:q> "x" .\n',
    "SELECT ?s ?v WHERE { ?s <urn:p> ?o OPTIONAL { ?s <urn:q> ?v } } "
    "ORDER BY DESC(?v)",
    [
        {"s": u("urn:a"), "v": lit("x")},
        {"s": u("urn:b")},
    ],
    ordered=True,
)

case(
    "order-by-two-keys-mixed-direction",
    '<urn:a> <urn:p> "1"^^' + INT + ' .\n'
    '<urn:b> <urn:p> "1"^^' + INT + ' .\n'
    '<urn:c> <urn:p> "2"^^' + INT + ' .\n',
    "SELECT ?s ?o WHERE { ?s <urn:p> ?o } ORDER BY DESC(?o) ?s",
    [
        {"s": u("urn:c"), "o": i(2)},
        {"s": u("urn:a"), "o": i(1)},
        {"s": u("urn:b"), "o": i(1)},
    ],
    ordered=True,
)

case(
    "path-in-named-graph-scoped",
    f"<urn:a> <urn:n> <urn:b> <{G1}> .\n"
    f"<urn:b> <urn:n> <urn:c> <{G2}> .\n",
    # the + closure must not hop across graph boundaries when scoped
    f"SELECT ?x WHERE {{ GRAPH <{G1}> {{ <urn:a> <urn:n>+ ?x }} }}",
    [{"x": u("urn:b")}],
)

case(
    "path-in-graph-var-per-graph-closure",
    f"<urn:a> <urn:n> <urn:b> <{G1}> .\n"
    f"<urn:b> <urn:n> <urn:c> <{G1}> .\n"
    f"<urn:a> <urn:n> <urn:z> <{G2}> .\n",
    "SELECT ?g ?x WHERE { GRAPH ?g { <urn:a> <urn:n>+ ?x } }",
    [
        {"g": u(G1), "x": u("urn:b")},
        {"g": u(G1), "x": u("urn:c")},
        {"g": u(G2), "x": u("urn:z")},
    ],
)

case(
    "exists-in-having",
    _SDATA,
    "SELECT ?c (COUNT(?o) AS ?n) WHERE { ?o <urn:of> ?c } "
    "GROUP BY ?c HAVING (COUNT(?o) >= 1 && ?c != <urn:c9>)",
    [
        {"c": u("urn:c1"), "n": i(2)},
        {"c": u("urn:c2"), "n": i(1)},
    ],
)

case(
    "notexists-graph-scope",
    f'<urn:a> <urn:p> "1" .\n<urn:a> <urn:q> "x" <{G1}> .',
    # NOT EXISTS over a GRAPH pattern: matches only graph-scoped data
    "SELECT ?s WHERE { ?s <urn:p> ?o "
    f"FILTER NOT EXISTS {{ GRAPH <{G2}> {{ ?s <urn:q> ?x }} }} }}",
    [{"s": u("urn:a")}],
)

case(
    "exists-graph-scope-positive",
    f'<urn:a> <urn:p> "1" .\n<urn:a> <urn:q> "x" <{G1}> .',
    "SELECT ?s WHERE { ?s <urn:p> ?o "
    f"FILTER EXISTS {{ GRAPH <{G1}> {{ ?s <urn:q> ?x }} }} }}",
    [{"s": u("urn:a")}],
)

case(
    "minus-inside-graph",
    f'<urn:a> <urn:p> "1" <{G1}> .\n<urn:b> <urn:p> "2" <{G1}> .\n'
    f'<urn:b> <urn:del> "y" <{G1}> .',
    f"SELECT ?s WHERE {{ GRAPH <{G1}> {{ ?s <urn:p> ?o "
    "MINUS { ?s <urn:del> ?z } } }",
    [{"s": u("urn:a")}],
)

case(
    "bind-in-graph-pattern",
    f'<urn:a> <urn:p> "2"^^' + INT + f" <{G1}> .",
    f"SELECT ?s ?d WHERE {{ GRAPH <{G1}> {{ ?s <urn:p> ?o "
    "BIND(?o * 2 AS ?d) } }",
    [{"s": u("urn:a"), "d": i(4)}],
)

case(
    "groupconcat-distinct-separator",
    '<urn:a> <urn:t> "x" .\n<urn:a> <urn:t> "x" .\n'
    '<urn:a> <urn:t> "y" .\n',
    "SELECT (GROUP_CONCAT(DISTINCT ?o; SEPARATOR=\"|\") AS ?cat) "
    "WHERE { <urn:a> <urn:t> ?o }",
    [{"cat": lit("x|y")}],
    alt_results=[{"cat": lit("y|x")}],
)

print(json.dumps(CASES, indent=1), file=open("/tmp/dawg_candidates.json", "w"))
print(f"{len(CASES)} candidates written")
