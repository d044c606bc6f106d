"""Randomized differential testing of the structural query core.

Hypothesis generates random BGP shapes (1-3 patterns with shared /
repeated variables, constant objects, an optional OPTIONAL block, a
numeric FILTER, DISTINCT) and runs each through BOTH the engine and an
independently-written SQL translation over the same quads relation in
DuckDB. Disagreement on the solution multiset is a bug in one of the
two translators — this catches join/scope corners that hand-written
cases miss (the reference gets equivalent coverage from the breadth of
the DAWG suite; property-based generation is our substitute for its
volume).

The SQL translation here is deliberately NAIVE — one self-join per
pattern, null-safe term-identity equalities — precisely so it shares no
code or design with the engine's translator (property-table fast paths,
RID keys, star grouping all get cross-checked against first principles).
"""

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

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

PREDS = [f"urn:p{i}" for i in range(4)]
VARS = ["a", "b", "c"]


def _dataset():
    """Deterministic small quad set: IRI objects, integer literals, plain
    literals, and chains (s -> o that is also a subject) so multi-hop
    joins have matches."""
    rows = []
    for i in range(40):
        s = f"urn:s{i}"
        rows.append((DEFAULT_GRAPH, s, KIND_URI, PREDS[i % 4], KIND_URI,
                     f"urn:s{(i * 7 + 3) % 40}", None, None, None))
        rows.append((DEFAULT_GRAPH, s, KIND_URI, PREDS[(i + 1) % 4],
                     KIND_LITERAL, str(i % 10), XSD_INT, None,
                     float(i % 10)))
        if i % 3 == 0:
            rows.append((DEFAULT_GRAPH, s, KIND_URI, PREDS[(i + 2) % 4],
                         KIND_LITERAL, f"txt{i % 5}", None, None, None))
        # urn:num: multi-valued numeric predicate for the aggregate fuzz
        # (1-2 ints per subject; every 5th subject polluted with a
        # non-numeric value so per-group error semantics get exercised)
        rows.append((DEFAULT_GRAPH, s, KIND_URI, "urn:num", KIND_LITERAL,
                     str(i % 10), XSD_INT, None, float(i % 10)))
        if i % 2:
            v = (i * 3 + 1) % 10
            rows.append((DEFAULT_GRAPH, s, KIND_URI, "urn:num",
                         KIND_LITERAL, str(v), XSD_INT, None, float(v)))
        if i % 5 == 0:
            rows.append((DEFAULT_GRAPH, s, KIND_URI, "urn:num",
                         KIND_LITERAL, "n/a", None, None, None))
    return rows


@pytest.fixture(scope="module")
def fuzz_env(spark):
    import duckdb
    import pandas as pd

    rows = _dataset()
    quads = spark.createDataFrame(rows, QUADS_SCHEMA).cache()
    quads.count()
    eng = SparqlEngine(spark, quads)
    con = duckdb.connect()
    pdf = pd.DataFrame(
        rows,
        columns=[
            "g", "s", "s_kind", "p", "o_kind", "o_lex", "o_dt", "o_lang",
            "o_num",
        ],
    )
    con.register("quads", pdf)
    return eng, con


# a pattern term: ('var', name) | ('iri', value) | ('int', value)
def _obj_terms():
    return st.one_of(
        st.sampled_from(VARS).map(lambda v: ("var", v)),
        st.integers(0, 10).map(lambda i: ("iri", f"urn:s{i}")),
        st.integers(0, 9).map(lambda i: ("int", str(i))),
    )


patterns = st.lists(
    st.tuples(st.sampled_from(VARS), st.sampled_from(PREDS), _obj_terms()),
    min_size=1,
    max_size=3,
)


queries = st.fixed_dictionaries(
    {
        "required": patterns,
        "optional": st.one_of(
            st.none(),
            st.tuples(
                st.sampled_from(VARS), st.sampled_from(PREDS), _obj_terms()
            ),
        ),
        "minus": st.one_of(
            st.none(),
            st.tuples(
                st.sampled_from(VARS), st.sampled_from(PREDS), _obj_terms()
            ),
        ),
        "filter": st.one_of(
            st.none(),
            st.tuples(
                st.sampled_from(VARS),
                st.sampled_from(["<", "<=", ">", ">=", "="]),
                st.integers(0, 9),
            ),
        ),
        # FILTER [NOT] EXISTS with one inner pattern: correlates on vars
        # shared with the outer group; unshared inner vars stay free;
        # vars UNBOUND in a row (OPTIONAL) are free too — the inner
        # pattern sees only the row's bound substitutions (spec 8.1.4)
        "exists": st.one_of(
            st.none(),
            st.tuples(
                st.booleans(),  # True = EXISTS, False = NOT EXISTS
                st.tuples(
                    st.sampled_from(VARS), st.sampled_from(PREDS),
                    _obj_terms(),
                ),
            ),
        ),
        "distinct": st.booleans(),
    }
)


def _sparql(q) -> tuple[str, list[str]]:
    def term(t):
        k, v = t
        if k == "var":
            return f"?{v}"
        if k == "iri":
            return f"<{v}>"
        return v  # bare integer literal

    body = [f"?{s} <{p}> {term(o)} ." for s, p, o in q["required"]]
    used = set()
    for s, p, o in q["required"]:
        used.add(s)
        if o[0] == "var":
            used.add(o[1])
    if q.get("minus"):
        s, p, o = q["minus"]
        body.append(f"MINUS {{ ?{s} <{p}> {term(o)} }}")
        # MINUS binds nothing outward: its vars do NOT join ``used``
    if q["optional"]:
        s, p, o = q["optional"]
        body.append(f"OPTIONAL {{ ?{s} <{p}> {term(o)} }}")
        used.add(s)
        if o[0] == "var":
            used.add(o[1])
    if q["filter"]:
        v, op, c = q["filter"]
        if v in used:
            body.append(f"FILTER (?{v} {op} {c})")
    if q.get("exists"):
        pos, (es, ep, eo) = q["exists"]
        kw = "EXISTS" if pos else "NOT EXISTS"
        body.append(f"FILTER {kw} {{ ?{es} <{ep}> {term(eo)} }}")
        # EXISTS binds nothing outward
    proj = sorted(used)
    kw = "SELECT DISTINCT" if q["distinct"] else "SELECT"
    text = f"{kw} {' '.join('?' + v for v in proj)} WHERE {{ "
    text += " ".join(body) + " }"
    return text, proj


def _sql(q, prefix: str = "t") -> tuple[str, list[str]] | None:
    """Independent naive translation: one quads alias per pattern,
    null-safe (kind, lex, dt, lang) term equalities for shared vars."""
    # slot: (alias, '
    # s'|'o') — where a variable is bound
    binds: dict = {}
    conds: list[str] = []
    aliases: list[str] = []

    def eq(slot_a, slot_b):
        (ta, pa), (tb, pb) = slot_a, slot_b
        if pa == "s" and pb == "s":
            return f"({ta}.s = {tb}.s AND {ta}.s_kind = {tb}.s_kind)"
        if pa == "s":  # s vs o
            return (
                f"({tb}.o_lex = {ta}.s AND {tb}.o_kind = {ta}.s_kind "
                f"AND {tb}.o_dt IS NULL AND {tb}.o_lang IS NULL)"
            )
        if pb == "s":
            return eq(slot_b, slot_a)
        return (
            f"({ta}.o_lex = {tb}.o_lex AND {ta}.o_kind = {tb}.o_kind "
            f"AND {ta}.o_dt IS NOT DISTINCT FROM {tb}.o_dt "
            f"AND {ta}.o_lang IS NOT DISTINCT FROM {tb}.o_lang)"
        )

    def pattern_conds(alias, s, p, o, into):
        into.append(f"{alias}.p = '{p}'")
        into.append(f"{alias}.g = '{DEFAULT_GRAPH}'")
        slot_s = (alias, "s")
        if s in binds:
            into.append(eq(binds[s], slot_s))
        else:
            binds[s] = slot_s
            into.append(f"{alias}.s_kind = {KIND_URI}")  # ?s is URI or bnode
        k, v = o
        if k == "iri":
            into.append(
                f"{alias}.o_kind = {KIND_URI} AND {alias}.o_lex = '{v}'"
            )
        elif k == "int":
            into.append(
                f"{alias}.o_kind = {KIND_LITERAL} AND {alias}.o_lex = '{v}'"
                f" AND {alias}.o_dt = '{XSD_INT}'"
            )
        else:
            slot_o = (alias, "o")
            if v in binds:
                into.append(eq(binds[v], slot_o))
            else:
                binds[v] = slot_o

    for i, (s, p, o) in enumerate(q["required"]):
        alias = f"{prefix}{i}"
        aliases.append(alias)
        pattern_conds(alias, s, p, o, conds)

    not_exists = None
    if q.get("minus"):
        # MINUS semantics with certain-bound BGP branches: remove a left
        # row iff a right row agrees on the SHARED vars; no shared vars
        # -> MINUS is a no-op (the dom-overlap rule)
        s, p, o = q["minus"]
        saved = dict(binds)
        mconds: list[str] = []
        pattern_conds("m0", s, p, o, mconds)
        mvars = {s} | ({o[1]} if o[0] == "var" else set())
        binds = saved  # MINUS binds nothing outward
        if mvars & set(saved):
            not_exists = (
                "NOT EXISTS (SELECT 1 FROM quads m0 WHERE "
                + " AND ".join(mconds)
                + ")"
            )

    left = None
    if q["optional"]:
        s, p, o = q["optional"]
        lconds: list[str] = []
        # vars first bound inside OPTIONAL must not leak equalities into
        # the required WHERE: snapshot binds, restore after
        saved = dict(binds)
        pattern_conds("topt", s, p, o, lconds)
        opt_binds = {v: sl for v, sl in binds.items() if v not in saved}
        left = ("topt", lconds, opt_binds)
        binds = saved
        for v, sl in opt_binds.items():
            binds.setdefault(v, sl)

    sel = []
    proj = sorted(binds)
    for v in proj:
        alias, pos = binds[v]
        sel.append(f"{alias}.{'s' if pos == 's' else 'o_lex'} AS {v}")
    sql = f"SELECT {'DISTINCT ' if q['distinct'] else ''}{', '.join(sel)} "
    sql += "FROM " + " CROSS JOIN ".join(f"quads {a}" for a in aliases)
    if left:
        alias, lconds, _ = left
        sql += f" LEFT JOIN quads {alias} ON " + " AND ".join(lconds)
    where = list(conds)
    if not_exists:
        where.append(not_exists)
    if q.get("exists"):
        # correlated [NOT] EXISTS: substitute the row's BOUND vars into
        # the inner pattern; an UNBOUND (optional) or unshared var is
        # free — null-safe correlation (outer IS NULL OR eq)
        pos, (es, ep, eo) = q["exists"]
        ec = [f"e0.p = '{ep}'", f"e0.g = '{DEFAULT_GRAPH}'"]

        def corr(v, slot_inner):
            sl = binds.get(v)
            if sl is None:
                return None
            alias, p_ = sl
            outer = f"{alias}.{'s' if p_ == 's' else 'o_lex'}"
            return f"({outer} IS NULL OR {eq(sl, slot_inner)})"

        c = corr(es, ("e0", "s"))
        if c:
            ec.append(c)
        k, v = eo
        if k == "iri":
            ec.append(f"e0.o_kind = {KIND_URI} AND e0.o_lex = '{v}'")
        elif k == "int":
            ec.append(
                f"e0.o_kind = {KIND_LITERAL} AND e0.o_lex = '{v}' "
                f"AND e0.o_dt = '{XSD_INT}'"
            )
        else:
            if v == es and es not in binds:
                # repeated FREE var inside the exists pattern
                ec.append(eq(("e0", "s"), ("e0", "o")))
            else:
                c = corr(v, ("e0", "o"))
                if c:
                    ec.append(c)
        where.append(
            f"{'EXISTS' if pos else 'NOT EXISTS'} "
            f"(SELECT 1 FROM quads e0 WHERE {' AND '.join(ec)})"
        )
    if q["filter"]:
        v, op, c = q["filter"]
        if v in binds:
            alias, pos = binds[v]
            if pos == "s":
                # an IRI subject never compares numerically: SPARQL type
                # error drops every row
                where.append("FALSE")
            else:
                where.append(f"{alias}.o_num {op} {c}")
    if where:
        sql += " WHERE " + " AND ".join(where)
    return sql, proj


_SETTINGS = dict(
    # deep-run with FUZZ_EXAMPLES=500 when hunting; CI default stays fast
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "35")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(q=queries)
@settings(**_SETTINGS)
def test_engine_matches_naive_sql(fuzz_env, q):
    eng, con = fuzz_env
    eng.clear_plan_cache()  # deep runs: don't pin hundreds of plans
    text, proj = _sparql(q)
    sql, sql_proj = _sql(q)
    assert proj == sql_proj
    spark_rows = sorted(
        (tuple(r[v] for v in proj) for r in eng.select(text).collect()),
        key=repr,  # rows may mix None (unbound) and str
    )
    duck_rows = sorted(
        (tuple(row) for row in con.execute(sql).fetchall()), key=repr
    )
    assert spark_rows == duck_rows, f"\nSPARQL: {text}\nSQL: {sql}"


def _branch_sql(pats, prefix: str) -> tuple[str, set]:
    """SQL for one UNION branch (plain BGP, no optional/filter)."""
    q = {"required": pats, "optional": None, "filter": None,
         "distinct": False}
    inner, proj = _sql(q, prefix=prefix)
    return inner, set(proj)


@given(
    left=st.lists(
        st.tuples(st.sampled_from(VARS), st.sampled_from(PREDS), _obj_terms()),
        min_size=1, max_size=2,
    ),
    right=st.lists(
        st.tuples(st.sampled_from(VARS), st.sampled_from(PREDS), _obj_terms()),
        min_size=1, max_size=2,
    ),
    distinct=st.booleans(),
)
@settings(**_SETTINGS)
def test_union_matches_naive_sql(fuzz_env, left, right, distinct):
    """UNION pads each branch's missing variables with unbound — the SQL
    mirror is NULL-padded UNION ALL (DISTINCT dedups the padded rows)."""
    eng, con = fuzz_env
    eng.clear_plan_cache()

    def branch_text(pats):
        out = []
        for s, p, o in pats:
            k, v = o
            t = f"?{v}" if k == "var" else (f"<{v}>" if k == "iri" else v)
            out.append(f"?{s} <{p}> {t} .")
        return " ".join(out)

    lsql, lvars = _branch_sql(left, "l")
    rsql, rvars = _branch_sql(right, "r")
    allvars = sorted(lvars | rvars)
    pad = lambda sql, have: (  # noqa: E731
        "SELECT "
        + ", ".join(v if v in have else f"NULL AS {v}" for v in allvars)
        + f" FROM ({sql})"
    )
    kw = "SELECT DISTINCT" if distinct else "SELECT"
    text = (
        f"{kw} {' '.join('?' + v for v in allvars)} WHERE "
        f"{{ {{ {branch_text(left)} }} UNION {{ {branch_text(right)} }} }}"
    )
    sql = pad(lsql, lvars) + " UNION ALL " + pad(rsql, rvars)
    if distinct:
        sql = f"SELECT DISTINCT * FROM ({sql})"
    spark_rows = sorted(
        (tuple(r[v] for v in allvars) for r in eng.select(text).collect()),
        key=repr,
    )
    duck_rows = sorted(
        (tuple(row) for row in con.execute(sql).fetchall()), key=repr
    )
    assert spark_rows == duck_rows, f"\nSPARQL: {text}\nSQL: {sql}"


@given(
    pred=st.sampled_from(PREDS + ["urn:num"]),
    agg=st.sampled_from(["COUNT", "SUM", "AVG"]),
)
@settings(**_SETTINGS)
def test_groupby_aggregate_matches_sql(fuzz_env, pred, agg):
    """GROUP BY subject with COUNT/SUM/AVG. SPARQL semantics: an
    aggregate over a group containing a non-numeric value ERRORS and
    leaves the variable unbound — encoded in SQL as CASE WHEN every
    value parsed THEN agg ELSE NULL."""
    eng, con = fuzz_env
    eng.clear_plan_cache()
    text = (
        f"SELECT ?a (%s AS ?m) WHERE {{ ?a <{pred}> ?b }} GROUP BY ?a"
        % {"COUNT": "COUNT(?b)", "SUM": "SUM(?b)", "AVG": "AVG(?b)"}[agg]
    )
    if agg == "COUNT":
        m = "CAST(COUNT(*) AS DOUBLE)"
    else:
        m = (
            f"CASE WHEN COUNT(*) = COUNT(o_num) THEN {agg}(o_num) "
            "ELSE NULL END"
        )
    sql = (
        f"SELECT s AS a, {m} AS m FROM quads "
        f"WHERE p = '{pred}' AND g = '{DEFAULT_GRAPH}' GROUP BY s"
    )
    spark_rows = sorted(
        (r["a"], None if r["m"] is None else float(r["m"]))
        for r in eng.select(text).collect()
    )
    duck_rows = sorted(
        (a, None if m is None else float(m))
        for a, m in con.execute(sql).fetchall()
    )
    assert spark_rows == duck_rows, f"\nSPARQL: {text}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Property 4: scalar expression semantics vs an independent exact
# interpreter.  Random arithmetic/IF/COALESCE trees over integer literals
# and an always-unbound variable, evaluated (a) by the engine through
# SELECT (expr AS ?r) WHERE {} and (b) by a tiny Python reference
# interpreter implementing the spec's numeric semantics directly
# (errors propagate; ?u is an error; x/0 is an error; integer division
# yields exact rationals per op:numeric-divide on decimals; IF's
# condition error poisons the IF; COALESCE takes the first non-error).

from fractions import Fraction


def _expr_strategy():
    atoms = st.one_of(
        st.integers(-3, 10).map(lambda n: ("lit", n)),
        st.just(("unbound",)),
    )

    def compound(children):
        binop = st.tuples(
            st.sampled_from(["+", "-", "*", "/"]), children, children
        ).map(lambda t: ("bin", *t))
        neg = children.map(lambda c: ("neg", c))
        absn = children.map(lambda c: ("abs", c))
        iff = st.tuples(
            st.sampled_from(["<", "<=", ">", ">=", "=", "!="]),
            children, children, children, children,
        ).map(lambda t: ("if", *t))
        coal = st.tuples(children, children).map(lambda t: ("coalesce", *t))
        return st.one_of(binop, neg, absn, iff, coal)

    return st.recursive(atoms, compound, max_leaves=8)


def _expr_text(e) -> str:
    k = e[0]
    if k == "lit":
        return str(e[1])
    if k == "unbound":
        return "?u"
    if k == "bin":
        return f"({_expr_text(e[2])} {e[1]} {_expr_text(e[3])})"
    if k == "neg":
        return f"(- {_expr_text(e[1])})"
    if k == "abs":
        return f"ABS({_expr_text(e[1])})"
    if k == "if":
        return (
            f"IF({_expr_text(e[2])} {e[1]} {_expr_text(e[3])}, "
            f"{_expr_text(e[4])}, {_expr_text(e[5])})"
        )
    return f"COALESCE({_expr_text(e[1])}, {_expr_text(e[2])})"


def _expr_eval(e):
    """None == SPARQL error."""
    k = e[0]
    if k == "lit":
        return Fraction(e[1])
    if k == "unbound":
        return None
    if k == "bin":
        a, b = _expr_eval(e[2]), _expr_eval(e[3])
        if a is None or b is None:
            return None
        if e[1] == "+":
            return a + b
        if e[1] == "-":
            return a - b
        if e[1] == "*":
            return a * b
        return None if b == 0 else a / b
    if k == "neg":
        a = _expr_eval(e[1])
        return None if a is None else -a
    if k == "abs":
        a = _expr_eval(e[1])
        return None if a is None else abs(a)
    if k == "if":
        a, b = _expr_eval(e[2]), _expr_eval(e[3])
        if a is None or b is None:
            return None
        ok = {
            "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
            "=": a == b, "!=": a != b,
        }[e[1]]
        return _expr_eval(e[4] if ok else e[5])
    # COALESCE: first argument that evaluates without error
    a = _expr_eval(e[1])
    return a if a is not None else _expr_eval(e[2])


@pytest.mark.slow  # deepest expression-tower arm (~22s); sibling differential arms keep per-commit coverage
@given(e=_expr_strategy())
@settings(**_SETTINGS)
def test_scalar_expression_matches_reference_eval(fuzz_env, e):
    eng, _ = fuzz_env
    # hundreds of generated towers would otherwise accumulate in the
    # 256-entry compiled-plan LRU and exhaust the test driver's heap
    eng.clear_plan_cache()
    text = f"SELECT ({_expr_text(e)} AS ?r) WHERE {{}}"
    rows = eng.select(text).collect()
    assert len(rows) == 1, text
    got = rows[0]["r"]
    want = _expr_eval(e)
    if want is None:
        assert got is None, f"{text}: engine={got!r}, want error/unbound"
    else:
        assert got is not None, f"{text}: engine unbound, want {want}"
        gf, wf = float(got), float(want)
        assert abs(gf - wf) <= 1e-9 * max(1.0, abs(wf)), (
            f"{text}: engine={got} want={want}"
        )


# ---------------------------------------------------------------------------
# Property 5: string-function semantics vs an independent reference
# interpreter.  Random CONCAT/UCASE/LCASE/SUBSTR/STRLEN/STRBEFORE/
# STRAFTER trees over plain literals and an unbound variable; typed
# values are ('str', s) | ('int', n) | None (error).  Type mismatches
# (an int where a string literal is required) are errors per spec.

_STR_POOL = ["", "a", "ab", "héllo", "aba b", "xyx"]


def _str_expr_strategy():
    atoms = st.one_of(
        st.sampled_from(_STR_POOL).map(lambda s: ("lit", s)),
        st.just(("unbound",)),
    )

    def compound(children):
        pos = st.integers(-2, 6)
        return st.one_of(
            st.tuples(children, children).map(lambda t: ("concat", *t)),
            children.map(lambda c: ("ucase", c)),
            children.map(lambda c: ("lcase", c)),
            children.map(lambda c: ("strlen", c)),
            st.tuples(children, pos).map(lambda t: ("substr2", *t)),
            st.tuples(children, pos, pos).map(lambda t: ("substr3", *t)),
            st.tuples(children, children).map(lambda t: ("strbefore", *t)),
            st.tuples(children, children).map(lambda t: ("strafter", *t)),
        )

    return st.recursive(atoms, compound, max_leaves=6)


def _str_text(e) -> str:
    k = e[0]
    if k == "lit":
        return '"' + e[1].replace("\\", "\\\\").replace('"', '\\"') + '"'
    if k == "unbound":
        return "?u"
    if k == "concat":
        return f"CONCAT({_str_text(e[1])}, {_str_text(e[2])})"
    if k in ("ucase", "lcase", "strlen"):
        return f"{k.upper()}({_str_text(e[1])})"
    if k == "substr2":
        return f"SUBSTR({_str_text(e[1])}, {e[2]})"
    if k == "substr3":
        return f"SUBSTR({_str_text(e[1])}, {e[2]}, {e[3]})"
    return f"{k.upper()}({_str_text(e[1])}, {_str_text(e[2])})"


def _str_eval(e):
    k = e[0]
    if k == "lit":
        return ("str", e[1])
    if k == "unbound":
        return None

    def s(x):
        v = _str_eval(x)
        return v[1] if v is not None and v[0] == "str" else None

    if k == "concat":
        a, b = s(e[1]), s(e[2])
        return None if a is None or b is None else ("str", a + b)
    if k == "ucase":
        a = s(e[1])
        return None if a is None else ("str", a.upper())
    if k == "lcase":
        a = s(e[1])
        return None if a is None else ("str", a.lower())
    if k == "strlen":
        a = s(e[1])
        return None if a is None else ("int", len(a))
    if k in ("substr2", "substr3"):
        a = s(e[1])
        if a is None:
            return None
        start = e[2]
        # fn:substring: 1-based positions p with start <= p < start+len
        lo = max(start, 1)
        hi = (start + e[3]) if k == "substr3" else (len(a) + 1)
        return ("str", a[lo - 1 : max(hi - 1, lo - 1)])
    if k == "strbefore":
        a, b = s(e[1]), s(e[2])
        if a is None or b is None:
            return None
        if b == "":
            return ("str", "")
        i = a.find(b)
        return ("str", a[:i] if i >= 0 else "")
    # strafter
    a, b = s(e[1]), s(e[2])
    if a is None or b is None:
        return None
    if b == "":
        return ("str", a)
    i = a.find(b)
    return ("str", a[i + len(b):] if i >= 0 else "")


@given(e=_str_expr_strategy())
@settings(**_SETTINGS)
def test_string_functions_match_reference_eval(fuzz_env, e):
    eng, _ = fuzz_env
    eng.clear_plan_cache()  # see the scalar property
    text = f"SELECT ({_str_text(e)} AS ?r) WHERE {{}}"
    rows = eng.select(text).collect()
    assert len(rows) == 1, text
    got = rows[0]["r"]
    want = _str_eval(e)
    if want is None:
        assert got is None, f"{text}: engine={got!r}, want error"
    else:
        assert got == str(want[1]), f"{text}: engine={got!r} want={want[1]!r}"


# ---------------------------------------------------------- subqueries
# { SELECT [DISTINCT] ?x WHERE { inner } } outer — projection hiding
# (non-projected inner vars are FRESH outside), bag-vs-set multiplicity
# of the subselect, and the join of the projected var against outer
# patterns, vs an independently-written SQL subquery translation.
_sub_inner = st.lists(
    st.tuples(st.sampled_from(VARS), st.sampled_from(PREDS), _obj_terms()),
    min_size=1,
    max_size=2,
)
_sub_outer = st.lists(
    st.tuples(st.sampled_from(VARS), st.sampled_from(PREDS), _obj_terms()),
    min_size=1,
    max_size=2,
)


def _sub_sql(inner, proj_var, distinct, outer):
    """Naive translation: the subselect projects (lex, kind, dt, lang) of
    its var; the outer BGP joins it on full term identity."""
    # inner: one quads alias per pattern, shared-var equalities
    binds: dict = {}
    conds: list[str] = []
    aliases: list[str] = []

    def eq(slot_a, slot_b):
        (ta, pa), (tb, pb) = slot_a, slot_b
        if pa == "s" and pb == "s":
            return f"({ta}.s = {tb}.s AND {ta}.s_kind = {tb}.s_kind)"
        if pa == "s":
            return (
                f"({tb}.o_lex = {ta}.s AND {tb}.o_kind = {ta}.s_kind "
                f"AND {tb}.o_dt IS NULL AND {tb}.o_lang IS NULL)"
            )
        if pb == "s":
            return eq(slot_b, slot_a)
        return (
            f"({ta}.o_lex = {tb}.o_lex AND {ta}.o_kind = {tb}.o_kind "
            f"AND {ta}.o_dt IS NOT DISTINCT FROM {tb}.o_dt "
            f"AND {ta}.o_lang IS NOT DISTINCT FROM {tb}.o_lang)"
        )

    def pattern(alias, s, p, o):
        aliases.append(alias)
        conds.append(f"{alias}.p = '{p}'")
        conds.append(f"{alias}.g = '{DEFAULT_GRAPH}'")
        slot_s = (alias, "s")
        if s in binds:
            conds.append(eq(binds[s], slot_s))
        else:
            binds[s] = slot_s
            conds.append(f"{alias}.s_kind = {KIND_URI}")
        k, v = o
        if k == "iri":
            conds.append(
                f"{alias}.o_kind = {KIND_URI} AND {alias}.o_lex = '{v}'"
            )
        elif k == "int":
            conds.append(
                f"{alias}.o_kind = {KIND_LITERAL} AND "
                f"{alias}.o_lex = '{v}' AND {alias}.o_dt = '{XSD_INT}'"
            )
        else:
            slot_o = (alias, "o")
            if v in binds:
                conds.append(eq(binds[v], slot_o))
            else:
                binds[v] = slot_o

    for i, (s, p, o) in enumerate(inner):
        pattern(f"i{i}", s, p, o)
    alias, pos = binds[proj_var]
    if pos == "s":
        sel = (
            f"{alias}.s AS x_lex, {alias}.s_kind AS x_kind, "
            "CAST(NULL AS VARCHAR) AS x_dt, CAST(NULL AS VARCHAR) AS x_lang"
        )
    else:
        sel = (
            f"{alias}.o_lex AS x_lex, {alias}.o_kind AS x_kind, "
            f"{alias}.o_dt AS x_dt, {alias}.o_lang AS x_lang"
        )
    sub = (
        f"SELECT {'DISTINCT ' if distinct else ''}{sel} FROM "
        + " CROSS JOIN ".join(f"quads {a}" for a in aliases)
        + " WHERE "
        + " AND ".join(conds)
    )

    # outer: fresh bind environment seeded with the projected var
    binds2: dict = {"__sub": None}
    conds2: list[str] = []
    aliases2: list[str] = []
    ob: dict = {}

    def pattern2(alias, s, p, o):
        aliases2.append(alias)
        conds2.append(f"{alias}.p = '{p}'")
        conds2.append(f"{alias}.g = '{DEFAULT_GRAPH}'")
        if s == proj_var:
            conds2.append(
                f"(sub.x_lex = {alias}.s AND sub.x_kind = {alias}.s_kind "
                "AND sub.x_dt IS NULL AND sub.x_lang IS NULL)"
            )
        elif s in ob:
            conds2.append(eq(ob[s], (alias, "s")))
        else:
            ob[s] = (alias, "s")
            conds2.append(f"{alias}.s_kind = {KIND_URI}")
        k, v = o
        if k == "iri":
            conds2.append(
                f"{alias}.o_kind = {KIND_URI} AND {alias}.o_lex = '{v}'"
            )
        elif k == "int":
            conds2.append(
                f"{alias}.o_kind = {KIND_LITERAL} AND "
                f"{alias}.o_lex = '{v}' AND {alias}.o_dt = '{XSD_INT}'"
            )
        else:
            if v == proj_var:
                conds2.append(
                    f"(sub.x_lex = {alias}.o_lex AND "
                    f"sub.x_kind = {alias}.o_kind AND "
                    f"sub.x_dt IS NOT DISTINCT FROM {alias}.o_dt AND "
                    f"sub.x_lang IS NOT DISTINCT FROM {alias}.o_lang)"
                )
            elif v in ob:
                conds2.append(eq(ob[v], (alias, "o")))
            else:
                ob[v] = (alias, "o")

    for i, (s, p, o) in enumerate(outer):
        pattern2(f"t{i}", s, p, o)

    # project: x_lex + outer-bound vars' lexes (sorted names)
    outs = {"x": "sub.x_lex"}
    for v, (alias, pos) in sorted(ob.items()):
        outs[v] = f"{alias}.{'s' if pos == 's' else 'o_lex'}"
    sel2 = ", ".join(f"{e} AS {v}" for v, e in sorted(outs.items()))
    sql = (
        f"SELECT {sel2} FROM ({sub}) sub CROSS JOIN "
        + " CROSS JOIN ".join(f"quads {a}" for a in aliases2)
        + " WHERE "
        + " AND ".join(conds2)
    )
    return sql, sorted(outs)


@given(
    inner=_sub_inner,
    outer=_sub_outer,
    distinct=st.booleans(),
    pick=st.integers(0, 5),
)
@settings(**_SETTINGS)
def test_subquery_matches_naive_sql(fuzz_env, inner, outer, distinct, pick):
    eng, con = fuzz_env
    eng.clear_plan_cache()
    inner_vars = sorted(
        {s for s, _, _ in inner}
        | {o[1] for _, _, o in inner if o[0] == "var"}
    )
    proj_var = inner_vars[pick % len(inner_vars)]
    # rename every OUTER var so only the projected var is shared (the
    # property under test is projection hiding + the shared-var join)
    ren = {v: f"o{v}" for v in VARS}
    outer_q = [
        (
            proj_var if s == proj_var else ren[s],
            p,
            o if o[0] != "var" else (
                ("var", proj_var) if o[1] == proj_var else ("var", ren[o[1]])
            ),
        )
        for s, p, o in outer
    ]
    outer_used = sorted(
        {s for s, _, _ in outer_q}
        | {o[1] for _, _, o in outer_q if o[0] == "var"}
    )
    proj = sorted(set(outer_used) | {proj_var})
    kw = "SELECT DISTINCT" if distinct else "SELECT"
    text = (
        f"SELECT {' '.join('?' + v for v in proj)} WHERE {{ "
        f"{{ {kw} ?{proj_var} WHERE {{ "
        + " ".join(
            f"?{s} <{p}> "
            + (f"?{o[1]}" if o[0] == "var"
               else f"<{o[1]}>" if o[0] == "iri" else o[1])
            + " ."
            for s, p, o in inner
        )
        + " } } "
        + " ".join(
            f"?{s} <{p}> "
            + (f"?{o[1]}" if o[0] == "var"
               else f"<{o[1]}>" if o[0] == "iri" else o[1])
            + " ."
            for s, p, o in outer_q
        )
        + " }"
    )
    sql, sql_proj = _sub_sql(inner, proj_var, distinct, outer_q)
    # align naming: naive SQL calls the projected var "x"
    spark_rows = sorted(
        (
            tuple(
                r[proj_var if c == "x" else c] for c in sql_proj
            )
            for r in eng.select(text).collect()
        ),
        key=repr,
    )
    duck_rows = sorted(
        (tuple(row) for row in con.execute(sql).fetchall()), key=repr
    )
    assert spark_rows == duck_rows, f"\nSPARQL: {text}\nSQL: {sql}"
