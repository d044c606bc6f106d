"""Compiled-plan-size growth guard for every expression node kind.

Column expressions are TREES: an expression-compiler branch that inlines
a compiled compound operand k times multiplies compiled size by k per
nesting level — exponential in depth. This class of bug has shipped
twice (r4 EArith, r7 EUnary "-"/"+": depth-4 `-(-(-(-8)))` OOMed the
JVM at plan-construction time because make_num references its operand
~16x). The cure is `_bind` (fourstore_spark/sparql/expr.py) — this test
pins that every nestable node kind uses it.

Strategy: measure the UNRESOLVED logical plan's toString length at
depths 1/2/3 first and assert near-constant per-level growth (an
exponential branch shows a >=16x level ratio already at depth 3, where
the tree is still small enough to stringify safely — this is the
catch-BEFORE-the-JVM-dies probe). Only then compile a depth-10 tower
and assert an absolute bound (measured linear sizes are <=360 KB at
depth 10; the bound leaves ~4x headroom).

Verified against both historical bugs: reverting the r7 EUnary fix
makes `neg` fail the depth-3 ratio assert (ratio ~16).
"""

from __future__ import annotations

import pytest

from fourstore_spark.model import QUADS_SCHEMA
from fourstore_spark.sparql.engine import SparqlEngine

_PREFIX = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "

# Per-level growth must look additive, not multiplicative: allow the
# depth-2->3 increment to be at most 4x the depth-1->2 increment (both
# measured ~1x today; an inlining bug yields ~16x) plus a flat slack
# for constant-size noise (alias names, plan ids).
_RATIO_LIMIT = 4.0
_SLACK = 4096
# Absolute cap for a depth-10 tower's unresolved plan string. Largest
# measured today: arith at ~360 KB. Exponential growth would be >10^10.
_ABS_LIMIT = 1_500_000


def _tower(kind: str, depth: int) -> str:
    e = "8"
    for i in range(depth):
        if kind == "neg":
            e = f"(- {e})"
        elif kind == "plus":
            e = f"(+ {e})"
        elif kind == "arith":
            e = f"({e} + {i})"
        elif kind == "if":
            e = f"IF(?u > 0, {e}, {i})"
        elif kind == "coalesce":
            e = f"COALESCE({e}, {i})"
        elif kind == "cast":
            e = ("xsd:integer" if i % 2 else "xsd:decimal") + f"({e})"
        elif kind == "numcall":
            e = ["ABS", "CEIL", "FLOOR", "ROUND"][i % 4] + f"({e})"
        elif kind == "cmp":
            # comparison in nested value position via IF's condition
            e = f"IF({e} < 5, {i}, 9)"
        elif kind == "str":
            # reg_lex_term position: STR() renders the term's lexical
            # form, STRLEN forces re-entry into the numeric domain
            e = f'STRLEN(CONCAT(STR({e}), "x"))'
        elif kind == "in":
            e = f"IF({e} IN (1, 2, 3), {i}, {e if False else 9})"
        elif kind == "mixed":
            # the r7 regression family: unary +/- interleaved with ABS
            e = ["(- {})", "(+ {})", "ABS({})"][i % 3].format(e)
        else:  # pragma: no cover
            raise ValueError(kind)
    return e


@pytest.fixture(scope="module")
def eng(spark):
    quads = spark.createDataFrame([], QUADS_SCHEMA)
    return SparqlEngine(spark, quads)


def _plan_len(eng: SparqlEngine, expr: str) -> int:
    df = eng.select(_PREFIX + f"SELECT ({expr} AS ?r) WHERE {{}}")
    n = len(df._jdf.queryExecution().logical().toString())
    eng.clear_plan_cache()
    return n


_KINDS = [
    "neg", "plus", "arith", "if", "coalesce", "cast", "numcall",
    "cmp", "str", "in", "mixed",
]


@pytest.mark.parametrize("kind", _KINDS)
def test_compiled_plan_growth_is_linear(eng, kind):
    s1 = _plan_len(eng, _tower(kind, 1))
    s2 = _plan_len(eng, _tower(kind, 2))
    s3 = _plan_len(eng, _tower(kind, 3))
    d12, d23 = s2 - s1, s3 - s2
    assert d23 <= _RATIO_LIMIT * max(d12, 1) + _SLACK, (
        f"{kind}: per-level plan growth accelerating "
        f"({s1}->{s2}->{s3}; +{d12} then +{d23}) — a compile branch is "
        f"inlining a compiled compound operand instead of _bind-ing it"
    )
    s10 = _plan_len(eng, _tower(kind, 10))
    assert s10 <= _ABS_LIMIT, f"{kind}: depth-10 plan is {s10} chars"


def test_depth4_negation_tower_executes(eng):
    """Fixed regression: r7's fuzzer falsifying example OOMed the JVM."""
    rows = eng.select("SELECT ((- (- (- (- 8)))) AS ?r) WHERE {}").collect()
    assert len(rows) == 1 and rows[0]["r"] == "8"


def test_depth8_mixed_tower_executes(eng):
    expr = "8"
    for i in range(8):
        expr = ["(- {})", "(+ {})", "ABS({})"][i % 3].format(expr)
    rows = eng.select(f"SELECT ({expr} AS ?r) WHERE {{}}").collect()
    # -, +, ABS, -, +, ABS, -, + : ABS after a single minus, then minus
    # again before the final ABS-+ pair: |-|-|8||| = 8... compute: 8 ->
    # -8 -> -8 -> 8 -> -8 -> -8 -> 8 -> -8 -> -8
    assert len(rows) == 1 and rows[0]["r"] == "-8"
