"""Randomized differential testing of SPARQL Update sequences.

Hypothesis generates random op sequences (INSERT DATA / DELETE DATA with
optional GRAPH wrappers, DELETE WHERE by predicate, CLEAR GRAPH, a
pattern-driven INSERT...WHERE copy) and applies them both to the
UpdateEngine and to a plain Python set-of-quads model implementing the
Update semantics directly (set union / difference / pattern matching).
The final store contents must agree exactly. The model mirrors the
engine's 4store-parity union-default-graph mode: WHERE patterns match
triples in every graph, while graph-less templates instantiate into
the default graph.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from fourstore_spark.model import DEFAULT_GRAPH
from fourstore_spark.sparql.engine import SparqlEngine
from fourstore_spark.sparql.update import UpdateEngine

SUBJECTS = [f"urn:s{i}" for i in range(4)]
PREDS = [f"urn:p{i}" for i in range(3)]
OBJECTS = [f"urn:o{i}" for i in range(3)]
GRAPHS = [None, "urn:g1", "urn:g2"]  # None = default graph


quad_st = st.tuples(
    st.sampled_from(GRAPHS),
    st.sampled_from(SUBJECTS),
    st.sampled_from(PREDS),
    st.sampled_from(OBJECTS),
)

op_st = st.one_of(
    st.tuples(st.just("insert"), st.lists(quad_st, min_size=1, max_size=3)),
    st.tuples(st.just("delete"), st.lists(quad_st, min_size=1, max_size=3)),
    st.tuples(st.just("delete_where_p"), st.sampled_from(PREDS)),
    st.tuples(st.just("clear"), st.sampled_from(["urn:g1", "urn:g2"])),
    st.tuples(
        st.just("copy_pred"),
        st.sampled_from(PREDS),
        st.sampled_from(PREDS),
    ),
)


def _data_block(quads) -> str:
    by_graph: dict = {}
    for g, s, p, o in quads:
        by_graph.setdefault(g, []).append(f"<{s}> <{p}> <{o}> .")
    parts = []
    for g, trs in by_graph.items():
        body = " ".join(trs)
        parts.append(body if g is None else f"GRAPH <{g}> {{ {body} }}")
    return " ".join(parts)


def _op_text(op) -> str:
    if op[0] == "insert":
        return f"INSERT DATA {{ {_data_block(op[1])} }}"
    if op[0] == "delete":
        return f"DELETE DATA {{ {_data_block(op[1])} }}"
    if op[0] == "delete_where_p":
        return f"DELETE WHERE {{ ?s <{op[1]}> ?o }}"
    if op[0] == "clear":
        return f"CLEAR SILENT GRAPH <{op[1]}>"
    # copy_pred: default-graph rows of p1 re-asserted under p2
    return (
        f"INSERT {{ ?s <{op[2]}> ?o }} WHERE {{ ?s <{op[1]}> ?o }}"
    )


def _model_apply(model: set, op) -> set:
    if op[0] == "insert":
        return model | {
            (g or DEFAULT_GRAPH, s, p, o) for g, s, p, o in op[1]
        }
    if op[0] == "delete":
        return model - {
            (g or DEFAULT_GRAPH, s, p, o) for g, s, p, o in op[1]
        }
    if op[0] == "delete_where_p":
        # 4store-style union default graph: the PATTERN matches triples
        # in EVERY graph, but the graph-less TEMPLATE instantiates quads
        # in the default graph — so only default-graph copies of matched
        # (s, o) pairs are removed
        matched = {(s, o) for g, s, p, o in model if p == op[1]}
        return {
            q
            for q in model
            if not (
                q[0] == DEFAULT_GRAPH
                and q[2] == op[1]
                and (q[1], q[3]) in matched
            )
        }
    if op[0] == "clear":
        return {q for q in model if q[0] != op[1]}
    src, dst = op[1], op[2]
    # same union semantics: WHERE sees all graphs, INSERT targets default
    add = {
        (DEFAULT_GRAPH, s, dst, o) for g, s, p, o in model if p == src
    }
    return model | add


@pytest.mark.slow  # ~59s update-sequence fuzz; test_update keeps the deterministic coverage
@given(ops=st.lists(op_st, min_size=1, max_size=6))
@settings(
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "25")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_update_sequences_match_set_model(spark, ops):
    ue = UpdateEngine(spark)
    model: set = set()
    for op in ops:
        ue.update(_op_text(op))
        model = _model_apply(model, op)
    eng = SparqlEngine(spark, ue.quads, union_default_graph=False)
    got = set()
    for r in eng.select(
        "SELECT ?s ?p ?o WHERE { ?s ?p ?o }"
    ).collect():
        got.add((DEFAULT_GRAPH, r["s"], r["p"], r["o"]))
    for r in eng.select(
        "SELECT ?g ?s ?p ?o WHERE { GRAPH ?g { ?s ?p ?o } }"
    ).collect():
        got.add((r["g"], r["s"], r["p"], r["o"]))
    texts = "; ".join(_op_text(o) for o in ops)
    assert got == model, (
        f"\nOPS: {texts}\nmissing: {sorted(model - got)}"
        f"\nextra: {sorted(got - model)}"
    )
