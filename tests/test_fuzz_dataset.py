"""Property-based differential test for RDF dataset construction
(SPARQL §13.2): FROM / FROM NAMED combinations × top-level vs GRAPH ?g
vs GRAPH <iri> patterns, against a from-first-principles Python
evaluator. Guards the round-5 exactness fixes (FROM alone hides all
named graphs; FROM NAMED alone empties the default graph; GRAPH <iri>
outside FROM NAMED matches nothing)."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from fourstore_spark.model import (
    DEFAULT_GRAPH,
    KIND_LITERAL,
    KIND_URI,
    QUADS_SCHEMA,
)
from fourstore_spark.sparql.engine import SparqlEngine

GRAPHS = [DEFAULT_GRAPH, "urn:g1", "urn:g2", "urn:g3"]
PREDS = ["urn:p0", "urn:p1"]

_SETTINGS = dict(
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "35")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _rows():
    out = []
    k = 0
    for g in GRAPHS:
        for p in PREDS:
            for j in range(2):
                out.append(
                    (g, f"urn:s{k}", KIND_URI, p, KIND_LITERAL,
                     f"v{k}", None, None, None)
                )
                k += 1
    return out


@pytest.fixture(scope="module")
def ds_env(spark):
    rows = _rows()
    quads = spark.createDataFrame(rows, QUADS_SCHEMA).cache()
    quads.count()
    # union_default_graph=True: the engine's default (reference behavior)
    return SparqlEngine(spark, quads), rows


@given(
    from_gs=st.lists(
        st.sampled_from(GRAPHS[1:]), unique=True, max_size=2
    ),
    from_named=st.lists(
        st.sampled_from(GRAPHS[1:]), unique=True, max_size=2
    ),
    pred=st.sampled_from(PREDS),
    shape=st.sampled_from(["plain", "graphvar", "graphiri"]),
    iri_g=st.sampled_from(GRAPHS[1:]),
)
@settings(**_SETTINGS)
def test_dataset_scoping_matches_spec(
    ds_env, from_gs, from_named, pred, shape, iri_g
):
    eng, rows = ds_env
    eng.clear_plan_cache()
    dataset = "".join(f"FROM <{g}> " for g in from_gs) + "".join(
        f"FROM NAMED <{g}> " for g in from_named
    )
    if shape == "plain":
        body = f"?s <{pred}> ?o"
        proj = ["s", "o"]
    elif shape == "graphvar":
        body = f"GRAPH ?g {{ ?s <{pred}> ?o }}"
        proj = ["g", "s", "o"]
    else:
        body = f"GRAPH <{iri_g}> {{ ?s <{pred}> ?o }}"
        proj = ["s", "o"]
    text = f"SELECT {' '.join('?' + v for v in proj)} {dataset}WHERE {{ {body} }}"
    got = sorted(
        tuple(r[v] for v in proj) for r in eng.select(text).collect()
    )

    # ---- independent evaluation per §13.2
    has_ds = bool(from_gs or from_named)
    if has_ds:
        default_graphs = set(from_gs)
        named = set(from_named)
    else:
        # engine default: union default graph; all named graphs visible
        default_graphs = set(GRAPHS)
        named = set(GRAPHS) - {DEFAULT_GRAPH}
    want = []
    for g, s, _, p, _, o_lex, _, _, _ in rows:
        if p != pred:
            continue
        if shape == "plain":
            if g in default_graphs:
                want.append((s, o_lex))
        elif shape == "graphvar":
            if g in named:
                want.append((g, s, o_lex))
        else:
            if g == iri_g and iri_g in named:
                want.append((s, o_lex))
    assert got == sorted(want), f"\nquery: {text}"
