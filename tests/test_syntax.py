"""W3C-style syntax tests: queries/updates that must parse, and ones that
must be rejected (mirrors the reference's DAWG syntax-query category,
src/dawg-tests; parse-only, no Spark session needed)."""

import pytest

from fourstore_spark.sparql.parser import parse_query, parse_update

POSITIVE = {
    "empty-group": "SELECT * WHERE { }",
    "union-of-empties": "SELECT * WHERE { { } UNION { } }",
    "long-string-literal":
        'SELECT * WHERE { ?s <urn:p> """multi\nline "quote" ok""" }',
    "escaped-quote": 'SELECT * WHERE { ?s <urn:p> "a\\"b" }',
    "leading-dot-decimal": "SELECT * WHERE { ?s <urn:p> .5 }",
    "lang-subtags": 'SELECT * WHERE { ?s <urn:p> "x"@en-GB-oed }',
    "trailing-semicolon": "SELECT * WHERE { ?s <urn:p> ?o ; }",
    "values-zero-vars": "SELECT * WHERE { ?s ?p ?o } VALUES () { () }",
    "construct-empty-template": "CONSTRUCT { } WHERE { }",
    "deep-nested-groups": "SELECT * WHERE { { { ?s ?p ?o } } }",
    "pname-with-digits": "PREFIX p1: <urn:x#> SELECT * WHERE { ?s p1:q2 ?o }",
    "a-keyword": "SELECT ?t WHERE { ?s a ?t }",
    "comma-object-list": "SELECT * WHERE { ?s <urn:p> 1 , 2 }",
    "comments": "SELECT ?t # c1\nWHERE { ?s a ?t } # c2",
    "double-exponent": "SELECT * WHERE { ?s <urn:p> 1.5e-3 }",
    "ask-with-modifiers": "ASK { ?s ?p ?o }",
    "grouped-projection": "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } "
                          "GROUP BY ?s",
    "group-by-expr-alias": "SELECT ?b WHERE { ?s <urn:p> ?v } "
                           "GROUP BY (STR(?v) AS ?b)",
    "bare-aggregates": "SELECT (COUNT(*) AS ?n) (SUM(?v) AS ?t) "
                       "WHERE { ?s <urn:p> ?v }",
    "path-in-where": "SELECT * WHERE { ?s (<urn:p>/<urn:q>)+ ?o }",
}

NEGATIVE = {
    "missing-object": "SELECT ?x WHERE { ?x <urn:p> }",
    "select-without-projection": "SELECT WHERE { ?s ?p ?o }",
    "unclosed-group": "SELECT ?x WHERE { ?x ?p ?o",
    "unclosed-iri": "SELECT ?x WHERE { ?x <urn:p ?y }",
    "alias-not-a-variable": "SELECT (COUNT(*) AS x) WHERE { ?s ?p ?o }",
    "prefix-without-iri": "PREFIX : SELECT * WHERE { ?s ?p ?o }",
    "negative-limit": "SELECT * WHERE { ?s ?p ?o } LIMIT -1",
    "empty-filter-args": "SELECT * WHERE { ?s ?p ?o FILTER() }",
    "duplicate-select-var": "SELECT ?x ?x WHERE { ?x ?p ?o }",
    "duplicate-alias": "SELECT (1 AS ?x) (2 AS ?x) WHERE { ?s ?p ?o }",
    "ungrouped-projected-var":
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }",
    "star-with-group-by": "SELECT * WHERE { ?s ?p ?o } GROUP BY ?s",
    "path-in-construct-template":
        "CONSTRUCT { ?s <urn:p>+ ?o } WHERE { ?s ?p ?o }",
    "distinct-order-nonprojected-var":
        "SELECT DISTINCT ?x WHERE { ?x <urn:p> ?v } ORDER BY ?v",
}

NEGATIVE_UPDATE = {
    "var-in-insert-data": "INSERT DATA { ?s <urn:p> 1 }",
    "bnode-in-delete-data": "DELETE DATA { <urn:s> <urn:p> _:b }",
}


@pytest.mark.parametrize("q", POSITIVE.values(), ids=POSITIVE.keys())
def test_positive_syntax(q):
    parse_query(q)  # must not raise


@pytest.mark.parametrize("q", NEGATIVE.values(), ids=NEGATIVE.keys())
def test_negative_syntax(q):
    with pytest.raises(Exception):
        parse_query(q)


@pytest.mark.parametrize(
    "q", NEGATIVE_UPDATE.values(), ids=NEGATIVE_UPDATE.keys()
)
def test_negative_update_syntax(q):
    with pytest.raises(Exception):
        parse_update(q)
