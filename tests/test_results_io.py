"""Result-serializer golden tests (the reference diffs serialized output
byte-for-byte, e.g. tests/query/scripts/foaf-knows-sha1-xml)."""

import json

import pytest

from fourstore_spark.sparql.engine import SparqlEngine


@pytest.fixture(scope="module")
def eng(spark):
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    nt = """
<urn:a> <urn:name> "Alice" .
<urn:a> <urn:age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
<urn:b> <urn:name> "Bob"@en .
<urn:b> <urn:friend> <urn:a> .
"""
    return SparqlEngine(spark, quads_from_nt_text(spark, nt))


Q = "SELECT ?s ?name WHERE { ?s <urn:name> ?name } ORDER BY ?name"


def test_json(eng):
    doc = json.loads(eng.query(Q).serialize("json"))
    assert doc["head"]["vars"] == ["s", "name"]
    b = doc["results"]["bindings"]
    assert b[0]["s"] == {"type": "uri", "value": "urn:a"}
    assert b[0]["name"] == {"type": "literal", "value": "Alice"}
    assert b[1]["name"] == {"type": "literal", "value": "Bob", "xml:lang": "en"}


def test_json_ask(eng):
    assert json.loads(eng.query("ASK { <urn:a> <urn:name> 'Alice' }").serialize("json")) == {
        "head": {},
        "boolean": True,
    }
    assert json.loads(eng.query("ASK { <urn:a> <urn:name> 'Zed' }").serialize("json")) == {
        "head": {},
        "boolean": False,
    }


def test_xml(eng):
    xml = eng.query(Q).serialize("xml")
    assert '<sparql xmlns="http://www.w3.org/2005/sparql-results#">' in xml
    assert '<variable name="s"/>' in xml
    assert "<uri>urn:a</uri>" in xml
    assert '<literal xml:lang="en">Bob</literal>' in xml


def test_csv_tsv(eng):
    csv = eng.query(Q).serialize("csv")
    assert csv.splitlines()[0] == "s,name"
    assert "urn:a,Alice" in csv
    tsv = eng.query(Q).serialize("tsv")
    assert tsv.splitlines()[0] == "?s\t?name"
    assert '<urn:b>\t"Bob"@en' in tsv


def test_typed_literal_json(eng):
    doc = json.loads(
        eng.query("SELECT ?v WHERE { <urn:a> <urn:age> ?v }").serialize("json")
    )
    t = doc["results"]["bindings"][0]["v"]
    assert t == {
        "type": "literal",
        "value": "30",
        "datatype": "http://www.w3.org/2001/XMLSchema#integer",
    }


def test_construct_ntriples(eng):
    nt = eng.query(
        "CONSTRUCT { ?s <urn:label> ?name } WHERE { ?s <urn:name> ?name }"
    ).serialize("ntriples")
    lines = set(nt.strip().splitlines())
    assert '<urn:a> <urn:label> "Alice" .' in lines
    assert '<urn:b> <urn:label> "Bob"@en .' in lines


def test_explain_returns_plan(eng):
    plan = eng.query(Q).explain()
    assert "Physical Plan" in plan
    # project/filter reach the plan; no Python UDFs in it
    assert "BatchEvalPython" not in plan


def test_soft_limit(eng):
    res = eng.query("SELECT ?s ?o WHERE { ?s ?p ?o }", soft_limit=1)
    assert res.soft_limited  # the cap of 1 actually truncated
    assert res.df.count() <= 2  # capped per pattern, not exact results
    # identical query, cap far above the data: results exact, and the
    # truncation warning must NOT fire (results.c:2722-2728 semantics)
    res2 = eng.query("SELECT ?s ?o WHERE { ?s ?p ?o }", soft_limit=10**9)
    assert not res2.soft_limited
    # no cap requested at all
    res3 = eng.query("SELECT ?s ?o WHERE { ?s ?p ?o }")
    assert not res3.soft_limited


def test_graph_acls(spark):
    # X1: graph ACLs (query-cache.c:96-140) — per-session visibility
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    nq = (
        '<urn:s1> <urn:p> "public" <urn:g:open> .\n'
        '<urn:s2> <urn:p> "secret" <urn:g:private> .'
    )
    quads = quads_from_nt_text(spark, nq)
    open_eng = SparqlEngine(spark, quads, denied_graphs=["urn:g:private"])
    rows = {r[0] for r in open_eng.select("SELECT ?o WHERE { ?s <urn:p> ?o }").collect()}
    assert rows == {"public"}
    allow_eng = SparqlEngine(spark, quads, allowed_graphs=["urn:g:private"])
    rows = {r[0] for r in allow_eng.select("SELECT ?o WHERE { ?s <urn:p> ?o }").collect()}
    assert rows == {"secret"}


def test_construct_rdfxml_roundtrip(spark):
    """CONSTRUCT -> RDF/XML -> our own RDF-XML parser -> isomorphic
    graph (URIs, typed/lang literals, bnodes via rdf:nodeID)."""
    from fourstore_spark.sources.rdfio import parse_rdfxml, quads_from_nt_text
    from fourstore_spark.sparql.engine import SparqlEngine

    nt = (
        '<urn:s1> <urn:ns#name> "Alpha"@en .\n'
        '<urn:s1> <urn:ns#size> '
        '"4"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        "<urn:s1> <urn:ns#link> <urn:s2> .\n"
        '_:b <urn:ns#name> "Hidden" .'
    )
    eng = SparqlEngine(spark, quads_from_nt_text(spark, nt))
    res = eng.query("CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }")
    xml = res.serialize("rdfxml")
    assert xml.startswith('<?xml version="1.0"')
    triples = parse_rdfxml(xml)
    assert len(triples) == 4
    # spot checks: typed literal, lang literal, uri object survive
    preds = {p[1] for _, p, _ in triples}
    assert preds == {"urn:ns#name", "urn:ns#size", "urn:ns#link"}
    objs = [o for _, _, o in triples]
    assert any(o[0] == "uri" and o[1] == "urn:s2" for o in objs) or any(
        "urn:s2" in str(o) for o in objs
    )


def test_construct_turtle_roundtrip(spark):
    """CONSTRUCT -> Turtle (subject-grouped ';' lists) -> our own Turtle
    parser -> the same triples."""
    from fourstore_spark.sources.rdfio import (
        quads_from_nt_text,
        quads_from_turtle,
    )
    from fourstore_spark.sparql.engine import SparqlEngine

    nt = (
        '<urn:s1> <urn:ns#name> "Alpha"@en .\n'
        '<urn:s1> <urn:ns#size> '
        '"4"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        "<urn:s1> <urn:ns#link> <urn:s2> .\n"
        '<urn:s2> <urn:ns#name> "Beta \\"q\\"" .'
    )
    eng = SparqlEngine(spark, quads_from_nt_text(spark, nt))
    ttl = eng.query(
        "CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }"
    ).serialize("turtle")
    assert " ;\n    " in ttl  # subject grouping actually happened
    back = quads_from_turtle(spark, ttl)
    orig = quads_from_nt_text(spark, nt)
    key = ["s", "s_kind", "p", "o_kind", "o_lex", "o_dt", "o_lang"]
    assert sorted(map(tuple, back.select(*key).collect())) == sorted(
        map(tuple, orig.select(*key).collect())
    )


def test_select_testcase_format(engine):
    # -f testcase (output_testcase, reference results.c:2397): DAWG
    # result-set vocabulary in Turtle; must be parseable by our own
    # Turtle reader and carry every binding
    res = engine.query(
        "SELECT ?n ?r WHERE { ?r <urn:col:region#r_name> ?n } LIMIT 2"
    )
    text = res.serialize("testcase")
    assert text.startswith(
        "@prefix rs: <http://www.w3.org/2001/sw/DataAccess/tests/"
        "result-set#> ."
    )
    assert 'rs:resultVariable "n", "r"' in text
    assert text.count("rs:solution [") == 2
    assert text.count('rs:binding [ rs:variable') == 4
    # well-formed Turtle: our parser must accept it
    from fourstore_spark.sources.rdfio import parse_turtle

    triples = parse_turtle(text)
    assert len(triples) >= 2 + 2 * 2 * 3  # type+vars + bindings


def test_ask_testcase_format(engine):
    res = engine.query(
        'ASK { ?r <urn:col:region#r_name> "ASIA" }'
    )
    text = res.serialize("testcase")
    assert 'rs:boolean "true"^^xsd:boolean .' in text


def test_construct_testcase_is_turtle(engine):
    res = engine.query(
        "CONSTRUCT { ?r <urn:x> ?n } WHERE "
        "{ ?r <urn:col:region#r_name> ?n }"
    )
    assert res.serialize("testcase") == res.serialize("turtle")


def test_unicode_graph_serializer_roundtrips(spark):
    # non-ASCII lexical forms survive every graph writer -> parser cycle
    from fourstore_spark.sources.rdfio import (
        quads_from_nt_text,
        quads_from_rdfxml,
        quads_from_turtle,
    )
    from fourstore_spark.sparql.engine import SparqlEngine

    nt = '<urn:a> <urn:p> "caf\\u00e9 \\u4e2d\\u6587" .'
    eng = SparqlEngine(spark, quads_from_nt_text(spark, nt))
    res = eng.query("CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }")
    for fmt, parse in (
        ("ntriples", quads_from_nt_text),
        ("turtle", quads_from_turtle),
        ("rdfxml", quads_from_rdfxml),
    ):
        back = parse(spark, res.serialize(fmt))
        assert back.collect()[0]["o_lex"] == "café 中文", fmt
