"""W3C-format manifest.ttl ingestion + evaluation sweep.

The reference consumes the published W3C manifests through
src/dawg-tests/run.sh + runtest.pl with excuses.txt recording known
deltas. This harness (fourstore_spark.testing.w3c) ingests the same
manifest vocabulary with the engine's OWN Turtle reader and SPARQL
evaluator; tests/w3c/** holds spec-derived reconstructions of exactly
the categories the reference's excuses.txt skips (bottom-up filter
scope, default-vs-named graph, sameTerm, construct-optional) plus
syntax and update-evaluation forms. The excuses list here is EMPTY —
every case must pass.
"""

from __future__ import annotations

import glob
import os

import pytest

from fourstore_spark.testing.w3c import read_manifest, run_test

_ROOT = os.path.join(os.path.dirname(__file__), "w3c")

EXCUSES: dict[str, str] = {}


def _all_manifests():
    return sorted(glob.glob(os.path.join(_ROOT, "manifest.ttl")))


_tests_cache = None


def _tests(spark):
    global _tests_cache
    if _tests_cache is None:
        _tests_cache = [
            t for m in _all_manifests() for t in read_manifest(spark, m)
        ]
    return _tests_cache


@pytest.mark.slow  # ~190s full W3C conformance sweep; run in the full profile and at round close
def test_w3c_suite_all_green(spark):
    report = []
    for t in _tests(spark):
        status, detail = run_test(spark, t)
        if t.name in EXCUSES and status == "fail":
            status = "excused"
        report.append((t.name, status, detail))
    failures = [r for r in report if r[1] not in ("pass", "excused")]
    # the sweep itself must find a meaningful number of cases — an empty
    # glob silently passing would hide a broken importer (r7: 107 cases
    # across 14 suites)
    assert len(report) >= 100, report
    assert not failures, failures
    # the EARL report (runtest.pl earl.ttl parity) round-trips through
    # the engine's own Turtle reader: one Assertion per case
    from fourstore_spark.sources.rdfio import parse_turtle
    from fourstore_spark.testing.w3c import earl_report

    triples = parse_turtle(earl_report(report))
    kinds = [
        t for t in triples
        if getattr(t.o, "value", None) == "http://www.w3.org/ns/earl#Assertion"
    ]
    assert len(kinds) == len(report)


def test_w3c_manifest_reader_shapes(spark):
    ts = _tests(spark)
    by_name = {t.name: t for t in ts}
    # include recursion reached every suite
    assert {"filter-nested-2", "graph-02: default graph only",
            "sameterm-simple", "syntax-select-1",
            "INSERT DATA into named graph"} <= set(by_name)
    g2 = by_name["graph-02: default graph only"]
    assert len(g2.graph_data) == 2 and len(g2.data) == 1
    assert g2.kind == "query" and g2.result.endswith("graph-02.srx")
    up = by_name["INSERT DATA into named graph"]
    assert up.kind == "update"
    assert up.update_result_graphs and up.update_result_graphs[0][1] == "urn:g1"
    sx = by_name["syntax-select-1"]
    assert sx.kind == "syntax+" and sx.query.endswith(".rq")


def test_w3c_runner_detects_mismatches(spark, tmp_path):
    """Comparator meta-test: wrong expected values must FAIL — a runner
    that vacuously passes 35 fixtures is worse than no runner."""
    d = tmp_path / "neg"
    d.mkdir()
    (d / "data.ttl").write_text("@prefix : <http://example/> .\n:x :p 1 .\n")
    (d / "q.rq").write_text(
        "PREFIX : <http://example/>\nSELECT ?v WHERE { :x :p ?v }\n"
    )
    # wrong value (2, not 1)
    (d / "q.srj").write_text(
        '{"head": {"vars": ["v"]}, "results": {"bindings": ['
        '{"v": {"type": "literal", "datatype": '
        '"http://www.w3.org/2001/XMLSchema#integer", "value": "2"}}]}}'
    )
    # wrong row count (empty)
    (d / "empty.srx").write_text(
        '<?xml version="1.0"?><sparql xmlns='
        '"http://www.w3.org/2005/sparql-results#">'
        "<head><variable name='v'/></head><results></results></sparql>"
    )
    (d / "manifest.ttl").write_text("""
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix mf:  <http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#> .
@prefix qt:  <http://www.w3.org/2001/sw/DataAccess/tests/test-query#> .
@prefix t:   <http://fourstore-spark.test/neg#> .
<http://fourstore-spark.test/neg> rdf:type mf:Manifest ;
    mf:entries ( t:wrong-value t:wrong-count ) .
t:wrong-value rdf:type mf:QueryEvaluationTest ;
    mf:name "wrong-value" ;
    mf:action [ qt:query <q.rq> ; qt:data <data.ttl> ] ;
    mf:result <q.srj> .
t:wrong-count rdf:type mf:QueryEvaluationTest ;
    mf:name "wrong-count" ;
    mf:action [ qt:query <q.rq> ; qt:data <data.ttl> ] ;
    mf:result <empty.srx> .
""")
    from fourstore_spark.testing.w3c import run_manifest

    got = {name: status for name, status, _ in
           run_manifest(spark, str(d / "manifest.ttl"))}
    assert got == {"wrong-value": "fail", "wrong-count": "fail"}
    # and the excuses discipline: an excused fail reports 'excused',
    # a stale excuse on a passing test reports 'unexcused-pass'
    got2 = {name: status for name, status, _ in run_manifest(
        spark, str(d / "manifest.ttl"),
        excuses={"wrong-value": "known delta"})}
    assert got2["wrong-value"] == "excused"
