"""Manifest-driven SPARQL 1.1 evaluation sweep.

Mirrors the reference's W3C DAWG harness shape (src/dawg-tests/run.sh +
runtest.pl + excuses.txt): a manifest enumerates (data, query, expected
solution set) cases; expected results are authored in SPARQL-results-JSON
binding style per the SPARQL 1.1 Query spec; an excuses map records known
deltas without hiding them from the report.
"""

from __future__ import annotations

import json
import os

import pytest

from fourstore_spark.sparql.engine import SparqlEngine

_MANIFEST = os.path.join(os.path.dirname(__file__), "dawg_manifest.json")
with open(_MANIFEST, encoding="utf-8") as fh:
    _DOC = json.load(fh)

_CASES = _DOC["cases"]
_EXCUSES = _DOC.get("excuses", {})


def _binding_key(b: dict) -> frozenset:
    """One solution row -> hashable, order-insensitive key."""
    return frozenset(
        (var, term["type"], term["value"], term.get("xml:lang"),
         term.get("datatype"))
        for var, term in b.items()
    )


def _result_bindings(res) -> list[dict]:
    doc = json.loads(res.serialize("json"))
    return doc["results"]["bindings"]


@pytest.mark.parametrize(
    "case", _CASES, ids=[c["name"] for c in _CASES]
)
def test_dawg_case(spark, case):
    if case["name"] in _EXCUSES:
        pytest.xfail(_EXCUSES[case["name"]])
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    if "update" in case:
        # update-form case: run the update against the initial store and
        # compare the resulting quad set as N-Quads lines (default-graph
        # lines carry no graph term)
        from fourstore_spark.sources.rdfio import quads_to_nq_lines
        from fourstore_spark.sparql.update import UpdateEngine

        ue = UpdateEngine(
            spark,
            quads_from_nt_text(spark, case["data"]) if case["data"] else None,
        )
        ue.update(case["update"])
        got = {r["value"] for r in quads_to_nq_lines(ue.quads).collect()}
        assert got == set(case["expect_nquads"]), sorted(got)
        return

    eng = SparqlEngine(spark, quads_from_nt_text(spark, case["data"]))
    res = eng.query(case["query"])

    if "ask" in case:
        assert res.ask() is case["ask"]
        return

    if "construct_isomorphic" in case:
        from scripts.dawg_verify import isomorphic, nt_triples

        got = nt_triples(
            [ln for ln in res.serialize("ntriples").splitlines() if ln.strip()]
        )
        want = nt_triples(case["construct_isomorphic"])
        assert isomorphic(got, want), got
        return

    if "construct_ntriples" in case:
        got = {
            ln.strip()
            for ln in res.serialize("ntriples").splitlines()
            if ln.strip()
        }
        assert got == set(case["construct_ntriples"])
        return

    got = _result_bindings(res)
    if case.get("ordered"):
        assert [_binding_key(b) for b in got] == [
            _binding_key(b) for b in case["results"]
        ], got
        return
    got_keys = sorted(map(_binding_key, got), key=repr)
    want = sorted(map(_binding_key, case["results"]), key=repr)
    if got_keys != want and "alt_results" in case:
        want = sorted(map(_binding_key, case["alt_results"]), key=repr)
    assert got_keys == want, got
