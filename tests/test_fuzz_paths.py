"""Randomized differential testing of SPARQL 1.1 property paths.

Hypothesis generates random path expressions (atoms, inverses, sequence,
alternative, ?/*/+ closures, negated property sets with mixed-direction
members) over a fixed small cyclic digraph, and checks the engine's
DISTINCT (start, end) pairs against an independent set-algebra reference
evaluator implementing the spec's path semantics directly (§9.3: ALP for
closures, zero-length paths bind every term of the graph, NPS splits
into forward and inverse components).
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from fourstore_spark.model import DEFAULT_GRAPH, KIND_URI, QUADS_SCHEMA
from fourstore_spark.sparql.engine import SparqlEngine

P, Q = "urn:p", "urn:q"
N = [f"urn:n{i}" for i in range(8)]

# fixed digraph: a p-cycle over even nodes, a q-chain, and cross edges —
# cycles exercise the closure fixpoint, parallel p/q edges exercise alt
EDGES = [
    (N[0], P, N[2]), (N[2], P, N[4]), (N[4], P, N[0]),  # p 3-cycle
    (N[1], Q, N[3]), (N[3], Q, N[5]), (N[5], Q, N[7]),  # q chain
    (N[0], Q, N[1]), (N[4], P, N[5]), (N[6], P, N[6]),  # self-loop
    (N[7], P, N[1]), (N[2], Q, N[2]),                    # q self-loop
]
TERMS = sorted({t for s, _, o in EDGES for t in (s, o)})


@pytest.fixture(scope="module")
def path_env(spark):
    rows = [
        (DEFAULT_GRAPH, s, KIND_URI, p, KIND_URI, o, None, None, None)
        for s, p, o in EDGES
    ]
    quads = spark.createDataFrame(rows, QUADS_SCHEMA).cache()
    quads.count()
    return SparqlEngine(spark, quads)


# path AST: ('atom', pred, inverse?) | ('seq'|'alt', a, b)
#           | ('star'|'plus'|'opt', a) | ('nps', [(pred, inverse?), ...])
def _paths():
    atoms = st.tuples(
        st.sampled_from([P, Q]), st.booleans()
    ).map(lambda t: ("atom", *t))
    nps = st.lists(
        st.tuples(st.sampled_from([P, Q]), st.booleans()),
        min_size=1, max_size=3, unique=True,
    ).map(lambda ms: ("nps", ms))

    def compound(children):
        return st.one_of(
            st.tuples(children, children).map(lambda t: ("seq", *t)),
            st.tuples(children, children).map(lambda t: ("alt", *t)),
            children.map(lambda c: ("star", c)),
            children.map(lambda c: ("plus", c)),
            children.map(lambda c: ("opt", c)),
        )

    return st.recursive(st.one_of(atoms, nps), compound, max_leaves=4)


def _path_text(p) -> str:
    k = p[0]
    if k == "atom":
        return ("^" if p[2] else "") + f"<{p[1]}>"
    if k == "nps":
        inner = "|".join(
            ("^" if inv else "") + f"<{pred}>" for pred, inv in p[1]
        )
        return f"!({inner})"
    if k == "seq":
        return f"({_path_text(p[1])}/{_path_text(p[2])})"
    if k == "alt":
        return f"({_path_text(p[1])}|{_path_text(p[2])})"
    mark = {"star": "*", "plus": "+", "opt": "?"}[k]
    return f"({_path_text(p[1])}){mark}"


def _closure(pairs: set) -> set:
    out = set(pairs)
    while True:
        new = {(a, d) for a, b in out for c, d in out if b == c} - out
        if not new:
            return out
        out |= new


def _path_eval(p) -> set:
    k = p[0]
    if k == "atom":
        base = {(s, o) for s, pr, o in EDGES if pr == p[1]}
        return {(o, s) for s, o in base} if p[2] else base
    if k == "nps":
        fwd = {pr for pr, inv in p[1] if not inv}
        bwd = {pr for pr, inv in p[1] if inv}
        out = set()
        # forward component only if a forward member exists, ditto inverse
        # (spec: NPS with mixed members is the ALT of the two components)
        if any(not inv for _, inv in p[1]):
            out |= {(s, o) for s, pr, o in EDGES if pr not in fwd}
        if any(inv for _, inv in p[1]):
            out |= {(o, s) for s, pr, o in EDGES if pr not in bwd}
        return out
    if k == "seq":
        a, b = _path_eval(p[1]), _path_eval(p[2])
        return {(x, z) for x, y in a for y2, z in b if y == y2}
    if k == "alt":
        return _path_eval(p[1]) | _path_eval(p[2])
    inner = _path_eval(p[1])
    zero = {(t, t) for t in TERMS}
    if k == "star":
        return zero | _closure(inner)
    if k == "plus":
        return _closure(inner)
    return zero | inner  # opt


@pytest.mark.slow  # ~29s property-path fuzz; test_property_paths keeps the deterministic coverage
@given(p=_paths())
@settings(
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "35")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_path_pairs_match_reference_eval(path_env, p):
    eng = path_env
    eng.clear_plan_cache()
    text = f"SELECT DISTINCT ?x ?y WHERE {{ ?x {_path_text(p)} ?y }}"
    got = {(r["x"], r["y"]) for r in eng.select(text).collect()}
    want = _path_eval(p)
    assert got == want, (
        f"\nPATH: {text}\nmissing: {sorted(want - got)}"
        f"\nextra: {sorted(got - want)}"
    )
