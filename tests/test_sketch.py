"""Count-min sketch (operators/sketch.py).

The CMS contract is one-sided and, with md5 hashing and integer
counters, exactly replayable: estimates never undercount, overcount by
at most (e/width)*N in expectation, merged shard sketches equal the
one-pass sketch cell-for-cell, and a Python replica of the build
agrees exactly (partitioning-invariance falls out: integer sums).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _col(row: int, key, width: int) -> int:
    h = hashlib.md5(f"{row}:{key}".encode()).hexdigest()
    return (int(h[:8], 16) % 1_000_000) % width


def _replica(keys, width, depth):
    cells: dict[tuple[int, int], int] = {}
    for k in keys:
        for r in range(depth):
            c = _col(r, k, width)
            cells[(r, c)] = cells.get((r, c), 0) + 1
    return cells


def test_cms_never_undercounts_and_matches_replica(spark):
    from fourstore_spark.operators.sketch import cms_build, cms_query

    # zipf-ish synthetic stream: key i appears ~ 600 // (i + 1) times
    keys = [f"k{i}" for i in range(80) for _ in range(600 // (i + 1))]
    true = {k: keys.count(k) for k in set(keys)}
    df = spark.createDataFrame(
        [(k,) for k in keys], "key string"
    ).repartition(9)  # partitioning must not change any counter

    sk = cms_build(df, "key", width=256, depth=4)
    got_cells = {(r["r"], r["c"]): r["cnt"] for r in sk.collect()}
    assert got_cells == _replica(keys, 256, 4)

    probe = spark.createDataFrame(
        [(k,) for k in true], "key string"
    )
    est = {
        r["key"]: r["est"]
        for r in cms_query(sk, probe, "key", width=256, depth=4).collect()
    }
    n = len(keys)
    for k, t in true.items():
        assert est[k] >= t, f"undercount for {k}"
        # loose sanity bound: e/width * N, ~4x slack over expectation
        assert est[k] - t <= 4 * 2.718 * n / 256

    # an unseen key estimates from whatever collisions exist — still
    # bounded, and zero when its cells are all empty
    unseen = cms_query(
        sk,
        spark.createDataFrame([("never-seen-xyz",)], "key string"),
        "key", width=256, depth=4,
    ).head()
    assert 0 <= unseen["est"] <= 4 * 2.718 * n / 256


def test_cms_merge_equals_single_pass(spark):
    from fourstore_spark.operators.sketch import cms_build, cms_merge

    keys = [f"w{i % 37}" for i in range(1000)]
    df = spark.createDataFrame([(k, i) for i, k in enumerate(keys)],
                               "key string, i long")
    whole = cms_build(df, "key", width=128, depth=3)
    parts = cms_merge(
        cms_build(df.where("i % 3 = 0"), "key", width=128, depth=3),
        cms_build(df.where("i % 3 = 1"), "key", width=128, depth=3),
        cms_build(df.where("i % 3 = 2"), "key", width=128, depth=3),
    )
    a = {(r["r"], r["c"]): r["cnt"] for r in whole.collect()}
    b = {(r["r"], r["c"]): r["cnt"] for r in parts.collect()}
    assert a == b


def test_cms_weighted_nulls_and_heavy_hitters(spark):
    from fourstore_spark.operators.sketch import (
        cms_build,
        cms_heavy_hitters,
        cms_query,
    )

    # pre-aggregated (key, count) input via weight_col; NULL keys drop
    agg = spark.createDataFrame(
        [("a", 500), ("b", 90), (None, 10_000), ("c", 3)],
        "key string, n long",
    )
    sk = cms_build(agg, "key", width=64, depth=3, weight_col="n")
    est = {
        r["key"]: r["est"]
        for r in cms_query(
            sk, agg.where("key is not null"), "key", width=64, depth=3
        ).collect()
    }
    assert est["a"] >= 500 and est["b"] >= 90 and est["c"] >= 3
    assert est["a"] <= 500 + 93  # collisions only with b/c mass

    raw = spark.createDataFrame(
        [(k,) for k in ["x"] * 300 + ["y"] * 5 + ["z"] * 299],
        "key string",
    )
    hh = {
        r["key"]
        for r in cms_heavy_hitters(
            raw, "key", width=256, depth=4, threshold=250
        ).collect()
    }
    assert "x" in hh and "z" in hh and "y" not in hh


def test_cms_guards(spark):
    from fourstore_spark.operators.sketch import cms_build

    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="hash modulus"):
        cms_build(df, "key", width=2_000_000, depth=2)
    with pytest.raises(ValueError, match="broadcastable"):
        cms_build(df, "key", width=1_000_000, depth=51)


# --------------------------------------------------------------- HLL
def _hll_replica(keys, m):
    rem = 32 - (m.bit_length() - 1)
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        j, w = h % m, h // m
        rho = rem + 1 if w == 0 else rem - w.bit_length() + 1
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def test_hll_registers_match_replica_and_merge(spark):
    from fourstore_spark.operators.sketch import hll_build, hll_merge

    keys = [f"u{i}" for i in range(3000)] * 2  # duplicates collapse
    df = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "key string, i long"
    ).repartition(11)
    regs = {
        r["j"]: r["M"]
        for r in hll_build(df, "key", m=1024).collect()
    }
    assert regs == _hll_replica(keys, 1024)

    merged = hll_merge(
        hll_build(df.where("i % 2 = 0"), "key", m=1024),
        hll_build(df.where("i % 2 = 1"), "key", m=1024),
    )
    assert {
        (r["j"], r["M"]) for r in merged.collect()
    } == set(regs.items())


def test_hll_estimate_accuracy_and_guards(spark):
    from fourstore_spark.operators.sketch import hll_build, hll_estimate

    # large range: harmonic-mean branch, ~1.04/sqrt(1024) = 3.3% typical
    df = spark.createDataFrame(
        [(f"distinct-{i}",) for i in range(20_000)], "key string"
    )
    est = hll_estimate(hll_build(df, "key", m=1024), m=1024)
    assert abs(est - 20_000) / 20_000 < 0.10

    # small range: linear-counting branch is near-exact
    small = spark.createDataFrame(
        [(f"s{i % 60}",) for i in range(600)], "key string"
    )
    est = hll_estimate(hll_build(small, "key", m=1024), m=1024)
    assert abs(est - 60) < 3

    with pytest.raises(ValueError, match="power of two"):
        hll_build(df, "key", m=1000)
    with pytest.raises(ValueError, match="power of two"):
        hll_build(df, "key", m=64)


# ------------------------------------------------------- k-center picks
def test_kcenter_select_matches_numpy_replica(spark):
    """Greedy farthest-point (smallest max-cosine) selection: the pick
    sequence and the integer similarity at each pick must equal a
    numpy replica exactly — per-candidate max over the selected set is
    order-invariant, so partitioning cannot change a pick."""
    import numpy as np

    from fourstore_spark.operators.similarity import kcenter_select

    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 8))
    rows = [(i, [float(x) for x in X[i]]) for i in range(60)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(7)

    got = kcenter_select(df, 5)

    def cos_micro(a, b):
        import math

        c = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        return int(math.copysign(math.floor(abs(c * 1e6) + 0.5), c))

    NEG = -2_000_000
    sel = [(0, 0, NEG)]
    maxcos = {i: NEG for i in range(60)}
    last = 0
    for order in range(1, 5):
        for i in range(60):
            maxcos[i] = max(maxcos[i], cos_micro(X[i], X[last]))
        cand = sorted(
            (maxcos[i], i)
            for i in range(60)
            if i not in {s[0] for s in sel}
        )[0]
        sel.append((cand[1], order, cand[0]))
        last = cand[1]
    assert got == sel

    # degenerate corpora: fewer rows than k, and empty
    small = spark.createDataFrame(rows[:2], "vec_id long, embedding array<double>")
    assert len(kcenter_select(small, 5)) == 2
    assert kcenter_select(small.limit(0), 3) == []

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_k"):
        kcenter_select(df, 5, max_k=4)


# ----------------------------------------------------------- KMV/bottom-k
def test_kmv_matches_replica_merges_and_estimates(spark):
    from fourstore_spark.operators.sketch import (
        kmv_build,
        kmv_estimate,
        kmv_merge,
    )

    keys = [f"kv{i}" for i in range(5000)] + [f"kv{i}" for i in range(50)]
    df = spark.createDataFrame(
        [(x, i) for i, x in enumerate(keys)], "key string, i long"
    ).repartition(9)

    def replica(ks, k):
        hs = sorted(
            {
                (int(hashlib.md5(x.encode()).hexdigest()[:12], 16), x)
                for x in ks
            }
        )
        return hs[:k]

    got = [(r["h"], r["key"]) for r in kmv_build(df, "key", k=64).collect()]
    assert got == replica(keys, 64)

    merged = kmv_merge(
        kmv_build(df.where("i % 2 = 0"), "key", k=64),
        kmv_build(df.where("i % 2 = 1"), "key", k=64),
        k=64,
    )
    assert [(r["h"], r["key"]) for r in merged.collect()] == got

    # saturated sketch: unbiased estimate within ~2/sqrt(k)
    est = kmv_estimate(kmv_build(df, "key", k=256), k=256)
    assert abs(est - 5000) / 5000 < 0.25
    # under-full sketch: exact distinct count
    tiny = spark.createDataFrame(
        [(f"t{i % 7}",) for i in range(100)], "key string"
    )
    assert kmv_estimate(kmv_build(tiny, "key", k=64), k=64) == 7.0


def test_kmv_build_k_pinning_and_sidecar(spark, tmp_path):
    """r12: the build k is part of the sketch's meaning — estimating
    under a smaller k raises (the max hash would not be the k-th
    minimum), and save/load pins k in a sidecar so saturated sketches
    can't be silently misread as exact under a larger k."""
    from fourstore_spark.operators.sketch import (
        kmv_build,
        kmv_estimate,
        kmv_load,
        kmv_merge,
        kmv_save,
    )

    df = spark.createDataFrame(
        [(f"pin{i}",) for i in range(2000)], "key string"
    )
    sk = kmv_build(df, "key", k=128)
    with pytest.raises(ValueError, match="larger k"):
        kmv_estimate(sk, k=64)

    path = str(tmp_path / "kmv")
    kmv_save(sk, path, k=128)
    loaded, k = kmv_load(spark, path)
    assert k == 128
    est = kmv_estimate(loaded, k=k)
    assert abs(est - 2000) / 2000 < 0.3
    # merging DOWN is lossless: bottom-64 of a k=128 sketch equals the
    # direct k=64 build
    down = kmv_merge(loaded, k=64)
    direct = kmv_build(df, "key", k=64)
    assert [tuple(r) for r in down.collect()] == [
        tuple(r) for r in direct.collect()
    ]


def test_cms_negative_weight_fails_job(spark):
    """r12 ADVICE: negative weights void the one-sided bound — the
    build must fail, not undercount."""
    from fourstore_spark.operators.sketch import cms_build

    df = spark.createDataFrame(
        [("a", 3), ("b", -1)], "key string, w long"
    )
    with pytest.raises(Exception, match="negative weight"):
        cms_build(df, "key", weight_col="w").collect()
    # non-negative + NULL weights still fine
    ok = spark.createDataFrame(
        [("a", 3), ("b", None)], "key string, w long"
    )
    total = sum(
        r["cnt"] for r in cms_build(ok, "key", weight_col="w").collect()
    )
    assert total == 3 * 5  # depth rows, weight 3 + explicit 0


def test_hll_large_range_correction(spark):
    """r12 ADVICE: past ~2^32/30 the 32-bit hash saturates — the
    readout must apply -2^32*ln(1 - E/2^32), which is strictly above
    the raw estimate and finite while registers aren't all maxed."""
    import math

    from fourstore_spark.operators.sketch import hll_estimate

    m = 1024
    regs = spark.createDataFrame(
        [(j, 20) for j in range(m)], "j long, M int"
    )
    est = hll_estimate(regs, m=m)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / (m * 2.0**-20)
    assert raw > (1 << 32) / 30.0  # the correction regime is engaged
    assert math.isfinite(est)
    assert est == pytest.approx(-(2.0**32) * math.log(1.0 - raw / 2.0**32))
    assert est > raw


def test_classifier_n_features_hash_modulus_guard(spark):
    """r12 ADVICE: buckets past hash_bucket's 1e6 modulus are
    unreachable — doc_features/train/stream filter all refuse."""
    from fourstore_spark.operators.classifier import (
        MAX_FEATURES,
        doc_features,
    )
    from fourstore_spark.streaming import stream_quality_filter

    assert MAX_FEATURES == 1_000_000
    df = spark.createDataFrame([("d1", "a b c")], "doc_id string, text string")
    with pytest.raises(ValueError, match="modulus"):
        doc_features(df, n_features=2_000_000)
    w = spark.createDataFrame([(0, 0)], "b long, w_micro long")
    with pytest.raises(ValueError, match="modulus"):
        stream_quality_filter(df, w, n_features=2_000_000)


# ------------------------------------------------ quantile histogram
def _qbucket(v: int, s: int = 5) -> int:
    if v == 0:
        return 0
    mag = abs(v)
    shift = max(mag.bit_length() - 1 - s, 0)
    b = shift * (1 << s) + (mag >> shift)
    return b if v > 0 else -b


def test_qsketch_bucket_replica_monotone_bounds(spark):
    """The bucket id must equal the pure-Python replica exactly (the
    DuckDB oracle runs the same integer algebra), be monotone in the
    value (quantiles of b ARE quantiles of v), and invert through
    qsketch_bounds with relative error <= 2^-(s+1)."""
    import random

    from fourstore_spark.operators.sketch import (
        qsketch_bucket,
        qsketch_bounds,
    )

    random.seed(42)
    vals = (
        [0, 1, -1, 31, 32, 33, 63, 64, 65, 127, 128, 2**20 - 1, 2**20,
         -(2**40), 2**62 - 1, 2**62, -(2**62)]
        + [random.randint(-(10**15), 10**15) for _ in range(400)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(7)
    got = {
        r["v"]: r["b"]
        for r in df.select(
            "v", qsketch_bucket(F.col("v")).alias("b")
        ).collect()
    }
    for v in vals:
        assert got[v] == _qbucket(v), v
        lo, hi = qsketch_bounds(_qbucket(v))
        assert lo <= v <= hi
        mid = (lo + hi) // 2
        assert abs(mid - v) <= abs(v) * 2**-6 + 1  # s=5 -> 2^-(5+1)
        if abs(v) < 64:  # small buckets are exact
            assert (lo, hi) == (v, v)
    svals = sorted(vals)
    bs = [_qbucket(v) for v in svals]
    assert bs == sorted(bs)


def test_qsketch_build_merge_grouped_weighted(spark):
    from fourstore_spark.operators.sketch import qsketch_build, qsketch_merge

    rows = [(i, "g%d" % (i % 3), (i * 37) % 5000 - 1000) for i in range(900)]
    df = spark.createDataFrame(rows, "i long, g string, v long").repartition(9)

    whole = {
        (r["g"], r["b"]): r["cnt"]
        for r in qsketch_build(df, "v", group_cols=["g"]).collect()
    }
    replica: dict[tuple, int] = {}
    for _, g, v in rows:
        k = (g, _qbucket(v))
        replica[k] = replica.get(k, 0) + 1
    assert whole == replica

    merged = qsketch_merge(
        qsketch_build(df.where("i % 2 = 0"), "v", group_cols=["g"]),
        qsketch_build(df.where("i % 2 = 1"), "v", group_cols=["g"]),
        group_cols=["g"],
    )
    assert {
        (r["g"], r["b"]): r["cnt"] for r in merged.collect()
    } == whole

    # weight_col counts pre-aggregated rows; NULL values drop;
    # negative weights fail the job (they'd corrupt the CDF)
    agg = spark.createDataFrame(
        [(100, 7), (None, 99), (100, None), (3, 2)], "v long, n long"
    )
    got = {
        r["b"]: r["cnt"]
        for r in qsketch_build(agg, "v", weight_col="n").collect()
    }
    assert got == {_qbucket(100): 7, _qbucket(3): 2}
    bad = spark.createDataFrame([(5, -1)], "v long, n long")
    with pytest.raises(Exception, match="negative weight"):
        qsketch_build(bad, "v", weight_col="n").collect()


def test_qsketch_quantile_accuracy_and_guards(spark):
    import math
    import random

    from fourstore_spark.operators.sketch import (
        qsketch_build,
        qsketch_quantile,
    )

    random.seed(3)
    vals = [int(random.lognormvariate(8, 2)) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = qsketch_build(df, "v")
    data = sorted(vals)
    qs = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    ests = qsketch_quantile(sk, qs)
    for q, est in zip(qs, ests):
        true = data[max(1, math.ceil(q * len(data))) - 1]
        assert abs(est - true) <= abs(true) * 2**-6 + 1, (q, est, true)
    # scalar in -> scalar out; small-value quantiles are exact
    exact = spark.createDataFrame([(v,) for v in range(1, 33)], "v long")
    assert qsketch_quantile(qsketch_build(exact, "v"), 0.5) == 16

    with pytest.raises(ValueError, match="quantiles"):
        qsketch_quantile(sk, 1.5)
    with pytest.raises(ValueError, match="empty"):
        qsketch_quantile(df.limit(0).select(
            F.col("v").alias("b"), F.col("v").alias("cnt")
        ), 0.5)
    with pytest.raises(ValueError, match="sub_bits"):
        qsketch_build(df, "v", sub_bits=13)


def test_qsketch_group_quantiles_and_guard(spark):
    """The grouped readout must equal per-group qsketch_quantile calls
    (same rank convention), sort by group, and refuse unbounded group
    counts."""
    from fourstore_spark.operators.sketch import (
        qsketch_build,
        qsketch_group_quantiles,
        qsketch_quantile,
    )

    rows = [("g%d" % (i % 3), (i * 13) % 700 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = qsketch_build(df, "v", group_cols=["g"])
    got = qsketch_group_quantiles(sk, [0.5, 0.9], ["g"])
    assert [g for g, *_ in got] == ["g0", "g1", "g2"]
    for g, p50, p90 in got:
        sub = sk.where(F.col("g") == g).select("b", "cnt")
        assert [p50, p90] == qsketch_quantile(sub, [0.5, 0.9])
    # scalar q shape
    one = qsketch_group_quantiles(sk, 0.5, ["g"])
    assert [(g, p) for g, p, _ in got] == one

    with pytest.raises(ValueError, match="groups"):
        qsketch_group_quantiles(sk, 0.5, ["g"], max_groups=2)


def test_hll_intersect_and_cms_inner_product(spark):
    """The composed readouts: HLL inclusion-exclusion tracks the true
    overlap within compounded register noise, and the CMS inner
    product obeys its one-sided contract (never under the true
    sum-of-products, bounded over)."""
    from fourstore_spark.operators.sketch import (
        cms_build,
        cms_inner_product,
        hll_build,
        hll_intersect_estimate,
    )

    # |A|=6000, |B|=5000, |A ∩ B|=3000
    a = spark.createDataFrame([(f"k{i}",) for i in range(6000)], "key string")
    b = spark.createDataFrame(
        [(f"k{i}",) for i in range(3000, 8000)], "key string"
    )
    est = hll_intersect_estimate(
        hll_build(a, "key", m=1024), hll_build(b, "key", m=1024), m=1024
    )
    assert abs(est - 3000) / 3000 < 0.25  # three compounded ~3% readouts

    # zipf-ish frequency vectors with a known exact inner product
    fa = {f"w{i}": 200 // (i + 1) + 1 for i in range(40)}
    fb = {f"w{i}": 120 // (i + 2) + 2 for i in range(20, 60)}
    da = spark.createDataFrame(
        [(k,) for k, n in fa.items() for _ in range(n)], "key string"
    )
    db = spark.createDataFrame(
        [(k,) for k, n in fb.items() for _ in range(n)], "key string"
    )
    true = sum(fa[k] * fb[k] for k in set(fa) & set(fb))
    got = cms_inner_product(
        cms_build(da, "key", width=512, depth=4),
        cms_build(db, "key", width=512, depth=4),
        width=512, depth=4,
    )
    na, nb = sum(fa.values()), sum(fb.values())
    assert got >= true
    assert got - true <= 4 * 2.718 / 512 * na * nb  # 4x slack over E[]

    # disjoint sketches with an empty shared row -> exact zero
    dx = spark.createDataFrame([("only-a",)], "key string")
    dy = spark.createDataFrame([("only-b",)], "key string")
    assert cms_inner_product(
        cms_build(dx, "key", width=512, depth=4),
        cms_build(dy, "key", width=512, depth=4),
        width=512, depth=4,
    ) >= 0


def test_kmv_jaccard_matches_replica_and_exact_small(spark):
    """The KMV Jaccard estimator: exact when the union fits under k
    (the sample IS the union), replica-exact membership algebra on the
    saturated path, and accuracy within ~2/sqrt(k) on a known
    overlap."""
    from fourstore_spark.operators.sketch import kmv_build, kmv_jaccard

    # exact regime: |A ∪ B| = 80 < k
    a = spark.createDataFrame([(f"x{i}",) for i in range(60)], "key string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(40, 80)], "key string"
    )
    s, u, j = kmv_jaccard(
        kmv_build(a, "key", k=256), kmv_build(b, "key", k=256), k=256
    )
    assert (s, u) == (20, 80) and j == 20 / 80

    # saturated regime: |A|=4000, |B|=4000, overlap 2000 -> J = 1/3
    a2 = spark.createDataFrame(
        [(f"y{i}",) for i in range(4000)], "key string"
    )
    b2 = spark.createDataFrame(
        [(f"y{i}",) for i in range(2000, 6000)], "key string"
    )
    s2, u2, j2 = kmv_jaccard(
        kmv_build(a2, "key", k=512), kmv_build(b2, "key", k=512), k=512
    )
    assert u2 == 512
    assert abs(j2 - 1 / 3) < 2 / (512 ** 0.5)

    # down-merge validity (the kmv_merge contract): querying k=512
    # builds at k=256 equals direct k=256 builds exactly
    down = kmv_jaccard(
        kmv_build(a2, "key", k=512), kmv_build(b2, "key", k=512), k=256
    )
    direct = kmv_jaccard(
        kmv_build(a2, "key", k=256), kmv_build(b2, "key", k=256), k=256
    )
    assert down == direct


def test_cms_hll_grouped_builds_equal_per_group(spark):
    """group_cols on cms_build/hll_build must equal independent
    per-group builds cell-for-cell / register-for-register (the
    qsketch_build contract)."""
    from fourstore_spark.operators.sketch import cms_build, hll_build

    rows = [("s%d" % (i % 2), "k%d" % (i % 23)) for i in range(400)]
    df = spark.createDataFrame(rows, "src string, key string").repartition(5)

    g = {
        (r["src"], r["r"], r["c"]): r["cnt"]
        for r in cms_build(
            df, "key", width=64, depth=3, group_cols=["src"]
        ).collect()
    }
    for src in ("s0", "s1"):
        solo = {
            (src, r["r"], r["c"]): r["cnt"]
            for r in cms_build(
                df.where(F.col("src") == src), "key", width=64, depth=3
            ).collect()
        }
        assert solo == {kk: v for kk, v in g.items() if kk[0] == src}

    h = {
        (r["src"], r["j"]): r["M"]
        for r in hll_build(df, "key", m=128, group_cols=["src"]).collect()
    }
    for src in ("s0", "s1"):
        solo = {
            (src, r["j"]): r["M"]
            for r in hll_build(
                df.where(F.col("src") == src), "key", m=128
            ).collect()
        }
        assert solo == {kk: v for kk, v in h.items() if kk[0] == src}


def test_qsketch_quantile_refuses_grouped_sketch(spark):
    """Selecting b/cnt out of a grouped sketch would silently merge
    every group's histogram — the readout must refuse instead."""
    from fourstore_spark.operators.sketch import (
        qsketch_build,
        qsketch_quantile,
    )

    df = spark.createDataFrame(
        [("g0", 5), ("g1", 500)], "g string, v long"
    )
    grouped = qsketch_build(df, "v", group_cols=["g"])
    with pytest.raises(ValueError, match="GROUPED"):
        qsketch_quantile(grouped, 0.5)
    # a sliced group works
    assert qsketch_quantile(
        grouped.where(F.col("g") == "g0").select("b", "cnt"), 0.5
    ) == 5
