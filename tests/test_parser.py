"""Parser unit tests — no Spark needed."""

import pytest

from fourstore_spark.sparql import algebra as A
from fourstore_spark.sparql.parser import parse_query
from fourstore_spark.sparql.tokenizer import SparqlSyntaxError


def test_select_basic():
    q = parse_query("SELECT ?s ?o WHERE { ?s <urn:p> ?o }")
    assert q.form == "SELECT"
    assert q.projection == [("var", "s"), ("var", "o")]
    assert isinstance(q.pattern, A.BGP)
    tp = q.pattern.triples[0]
    assert tp.p == A.Iri("urn:p")


def test_prefixes_and_a():
    q = parse_query(
        """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        SELECT * WHERE { ?x a foaf:Person ; foaf:name ?n . }"""
    )
    t = q.pattern.triples
    assert t[0].p == A.Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    assert t[0].o == A.Iri("http://xmlns.com/foaf/0.1/Person")
    assert t[1].p == A.Iri("http://xmlns.com/foaf/0.1/name")
    assert t[0].s == t[1].s == A.Var("x")


def test_optional_filter_translation():
    q = parse_query(
        """SELECT ?s WHERE {
             ?s <urn:p> ?o .
             OPTIONAL { ?s <urn:q> ?q FILTER(?q > 3) }
             FILTER(?o < 10)
           }"""
    )
    assert isinstance(q.pattern, A.Filter)
    lj = q.pattern.pattern
    assert isinstance(lj, A.LeftJoin)
    assert lj.expr is not None  # filter lifted into the left-join condition


def test_union_minus_graph():
    q = parse_query(
        """SELECT ?s WHERE {
             { ?s <urn:a> ?x } UNION { ?s <urn:b> ?x }
             MINUS { ?s <urn:c> "bad" }
             GRAPH ?g { ?s <urn:d> ?y }
           }"""
    )
    assert isinstance(q.pattern, A.Join)


def test_aggregates_modifiers():
    q = parse_query(
        """SELECT ?k (SUM(?v) AS ?total) (COUNT(DISTINCT ?v) AS ?n)
           WHERE { ?s <urn:k> ?k ; <urn:v> ?v }
           GROUP BY ?k HAVING (SUM(?v) > 10)
           ORDER BY DESC(?total) LIMIT 5 OFFSET 2"""
    )
    assert q.group_by and q.having and q.order_by
    assert q.limit == 5 and q.offset == 2
    agg = q.projection[1][1]
    assert isinstance(agg, A.EAggregate) and agg.name == "SUM"


def test_literals():
    q = parse_query(
        'SELECT * WHERE { ?s ?p "chat"@fr . ?s ?q "5"^^<http://www.w3.org/2001/XMLSchema#integer> . ?s ?r 3.14 . ?s ?t true }'
    )
    t = q.pattern.triples
    assert t[0].o == A.Literal("chat", lang="fr")
    assert t[1].o.dt.endswith("integer")
    assert t[2].o.dt.endswith("decimal")
    assert t[3].o.lex == "true"


def test_values_bind():
    q = parse_query(
        """SELECT ?s ?label WHERE {
             VALUES ?s { <urn:a> <urn:b> }
             BIND(CONCAT("x", STR(?s)) AS ?label)
           }"""
    )
    assert isinstance(q.pattern, A.Extend)


def test_construct_ask_describe():
    q = parse_query("CONSTRUCT { ?s <urn:p2> ?o } WHERE { ?s <urn:p> ?o }")
    assert q.form == "CONSTRUCT" and q.construct_template
    q = parse_query("ASK { ?s ?p ?o }")
    assert q.form == "ASK"
    q = parse_query("DESCRIBE <urn:x>")
    assert q.form == "DESCRIBE"


def test_subselect():
    q = parse_query(
        """SELECT ?s ?mx WHERE {
             ?s <urn:p> ?o .
             { SELECT ?s (MAX(?v) AS ?mx) WHERE { ?s <urn:v> ?v } GROUP BY ?s }
           }"""
    )
    assert isinstance(q.pattern, A.Join)


def test_property_path_parses():
    # paths are supported since round 3 (beyond reference: rasqal BGP-only)
    from fourstore_spark.sparql import algebra as A

    q = parse_query("SELECT * WHERE { ?s <urn:a>/<urn:b>+ ?o }")
    tp = q.pattern.triples[0]
    assert isinstance(tp.p, A.PathSeq)
    assert isinstance(tp.p.steps[1], A.PathMod)
    # but never in CONSTRUCT templates
    with pytest.raises(SparqlSyntaxError):
        parse_query("CONSTRUCT { ?s <urn:a>/<urn:b> ?o } WHERE { ?s ?p ?o }")


def test_comments_and_blank_nodes():
    q = parse_query(
        """# a comment
        SELECT * WHERE {
          ?s <urn:p> [ <urn:q> ?v ] . # trailing comment
        }"""
    )
    assert len(q.pattern.triples) == 2
