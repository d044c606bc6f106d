"""RDF syntax I/O tests (import parity: fs_import import.c:333-477;
query-over-imported-KB shape: tests/query/scripts/foaf-knows-name)."""

import pytest
from pyspark.sql import functions as F

from fourstore_spark.sparql.engine import SparqlEngine

NT = """
<http://example.org/alice> <http://xmlns.com/foaf/0.1/knows> <http://example.org/bob> .
<http://example.org/alice> <http://xmlns.com/foaf/0.1/name> "Alice" .
<http://example.org/bob> <http://xmlns.com/foaf/0.1/name> "Bob"@en .
<http://example.org/bob> <http://xmlns.com/foaf/0.1/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:b1 <http://xmlns.com/foaf/0.1/name> "Shadow \\"quoted\\" name" .
# a comment line

<http://example.org/alice> <http://xmlns.com/foaf/0.1/knows> _:b1 .
"""

TTL = """
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix ex: <http://example.org/> .
ex:carol a foaf:Person ;
    foaf:name "Carol" ;
    foaf:knows ex:alice, ex:bob .
ex:dan foaf:age 23 .
"""


def test_nt_parse_roundtrip(spark):
    from fourstore_spark.sources.rdfio import quads_from_nt_text, quads_to_nq_lines

    q = quads_from_nt_text(spark, NT)
    assert q.count() == 6
    row = {r["p"]: r for r in q.collect()}
    age = row["http://xmlns.com/foaf/0.1/age"]
    assert age["o_num"] == 42.0
    name_bob = [
        r for r in q.collect() if r["o_lang"] == "en"
    ]
    assert len(name_bob) == 1 and name_bob[0]["o_lex"] == "Bob"
    # escaped quotes survive a serialize->parse round trip
    from fourstore_spark.sources.rdfio import parse_nt_line

    lines = [r[0] for r in quads_to_nq_lines(q, with_graph=False).collect()]
    reparsed = {parse_nt_line(ln) for ln in lines}
    original = {tuple(r) for r in q.collect()}
    assert reparsed == original


def test_nt_distributed_load(spark, tmp_path):
    from fourstore_spark.sources.rdfio import quads_from_nt

    p = tmp_path / "data.nt"
    p.write_text(NT)
    q = quads_from_nt(spark, str(p))
    assert q.count() == 6


def test_query_over_imported_nt(spark):
    # the foaf-knows-name golden test shape (tests/query/scripts/)
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    eng = SparqlEngine(spark, quads_from_nt_text(spark, NT))
    rows = {
        tuple(r)
        for r in eng.select(
            """SELECT ?name WHERE {
                 <http://example.org/alice> <http://xmlns.com/foaf/0.1/knows> ?k .
                 ?k <http://xmlns.com/foaf/0.1/name> ?name }"""
        ).collect()
    }
    assert rows == {("Bob",), ('Shadow "quoted" name',)}


def test_turtle_parse(spark):
    from fourstore_spark.sources.rdfio import quads_from_turtle

    q = quads_from_turtle(spark, TTL)
    assert q.count() == 5  # a + name + knows x2 + age
    eng = SparqlEngine(spark, q)
    rows = {
        tuple(r)
        for r in eng.select(
            """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
               SELECT ?who WHERE {
                 <http://example.org/carol> foaf:knows ?who }"""
        ).collect()
    }
    assert rows == {("http://example.org/alice",), ("http://example.org/bob",)}
    age = q.where(F.col("p").endswith("age")).collect()[0]
    assert age["o_num"] == 23.0


def test_nquads_graph_column(spark):
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    nq = '<urn:s> <urn:p> "v" <urn:graph1> .\n<urn:s2> <urn:p> "w" .'
    q = quads_from_nt_text(spark, nq)
    got = {(r["g"], r["s"]) for r in q.collect()}
    assert got == {("urn:graph1", "urn:s"), ("default:", "urn:s2")}
