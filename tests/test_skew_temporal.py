"""Skew behavior of the temporal operators (r7 verdict item 7).

The plain asof_join/sessionize shuffle on the entity key, so one hot
entity lands one task — and window exchanges are NOT split by AQE's
skew-join handling. The *_salted variants chunk the hot key's timeline
instead. Fixture: 10^6 events with 50% of rows on ONE key; the salted
ops must finish within a generous wall-clock bound (local[32] runs
this in a few seconds; the bound is anti-regression, not a benchmark)
and must spread the hot key across many tasks, which is asserted
structurally via the partitioning expression in the plan.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

N = 1_000_000
HOT_FRACTION = 0.5
BOUND_S = 180.0


@pytest.fixture(scope="module")
def skewed(spark):
    # 50% of rows on key 0, rest uniform over 10k keys; timestamps
    # spread over ~115 days so day-chunking yields ~116 buckets
    df = (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise((F.col("id") % 10_000) + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("id") * 10
            ).alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def test_sessionize_salted_skewed_within_bound(skewed):
    t0 = time.time()
    out = (
        __import__(
            "fourstore_spark.operators.temporal", fromlist=["x"]
        ).sessionize_salted(skewed, gap_seconds=1800, chunk_seconds=86400)
    )
    n = out.count()
    hot_sessions = (
        out.where(F.col("user_id") == 0)
        .agg(F.countDistinct("session_no"))
        .collect()[0][0]
    )
    elapsed = time.time() - t0
    assert n == N
    # hot key: every even id, 20s apart, gap 1800 -> one long session
    assert hot_sessions == 1
    assert elapsed < BOUND_S, f"salted sessionize took {elapsed:.1f}s"
    # structural skew check: the local window partitions by
    # (user_id, __chunk), never by user_id alone
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan


@pytest.fixture(scope="module")
def skewed_one_day(spark):
    # r8 verdict corner: the hot key's WHOLE timeline fits in a single
    # 86400s day, so the old fixed day-wide default would put every hot
    # row back on one task; auto-derived chunk_seconds must split it.
    # 50% of rows on key 0, all timestamps inside one day (~0.086s apart).
    df = (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise((F.col("id") % 10_000) + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") * 86_400) / N
            ).alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def test_auto_chunk_seconds_splits_single_day_hot_key(skewed_one_day):
    from fourstore_spark.operators.temporal import (
        _auto_chunk_seconds,
        _epoch_s,
    )

    cs = _auto_chunk_seconds(
        skewed_one_day, ["user_id"], _epoch_s(F.col("ts")), 200_000
    )
    # hot key: 500k rows over 86400s -> ~34.5ks chunks (>=2 buckets);
    # must be far below the old day-wide default AND at least 1
    assert 1 <= cs < 86_400, cs
    hot_rows = N // 2
    assert cs <= 86_400 * 200_000 // hot_rows + 1


def test_sessionize_salted_auto_single_day_within_bound(skewed_one_day):
    from fourstore_spark.operators.temporal import sessionize_salted

    t0 = time.time()
    # default chunk_seconds=None -> auto-derived from the data
    out = sessionize_salted(skewed_one_day, gap_seconds=1800)
    n = out.count()
    hot_sessions = (
        out.where(F.col("user_id") == 0)
        .agg(F.countDistinct("session_no"))
        .collect()[0][0]
    )
    elapsed = time.time() - t0
    assert n == N
    # hot key events ~0.17s apart, gap 1800 -> one long session even
    # across auto-chunk boundaries (the merge reconciliation)
    assert hot_sessions == 1
    assert elapsed < BOUND_S, f"auto-salted sessionize took {elapsed:.1f}s"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan


def test_asof_salted_auto_single_day_matches_plain(spark, skewed_one_day):
    from fourstore_spark.operators.temporal import asof_join, asof_join_salted

    left = skewed_one_day.select("event_id", "user_id", "ts").where(
        F.col("event_id") % 100 == 0
    )
    right = skewed_one_day.select(
        "user_id", "ts", F.col("value").alias("px")
    ).where(F.col("event_id") % 7 == 0)
    t0 = time.time()
    got = asof_join_salted(left, right, ["user_id"])  # auto chunks
    want = asof_join(left, right, ["user_id"])
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    elapsed = time.time() - t0
    assert diff == 0
    assert elapsed < BOUND_S, f"auto-salted asof took {elapsed:.1f}s"


def test_asof_salted_skewed_within_bound(spark, skewed):
    from fourstore_spark.operators.temporal import asof_join_salted

    right = (
        spark.range(0, N, 50)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise((F.col("id") % 10_000) + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("id") * 10 + 5
            ).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("px"),
        )
    )
    t0 = time.time()
    out = asof_join_salted(
        skewed.select("event_id", "user_id", "ts"),
        right,
        ["user_id"],
        chunk_seconds=86400,
    )
    n = out.count()
    elapsed = time.time() - t0
    assert n == N
    assert elapsed < BOUND_S, f"salted asof took {elapsed:.1f}s"
    # spot-check correctness on the hot key: event at id=100 (ts base +
    # 1000) should match the right row at id=50 (ts base + 505)
    row = out.where(F.col("event_id") == 100).collect()[0]
    assert row["px_r"] is not None


# --- cap_per_group skew guard (VERDICT r9 #3) -------------------------


def test_cap_per_group_hot_domain_within_bound(spark):
    """50%-hot-domain fixture: one domain owns half of 10^6 rows. The
    two-phase cap must (a) return exactly min(count, cap) rows per
    group, (b) rank the hot group per-(group, chunk) first — asserted
    structurally via __chunk in the plan — and (c) finish inside the
    anti-regression wall bound."""
    from fourstore_spark.operators.sampling import cap_per_group

    n, cap = 1_000_000, 1_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 2000).cast("string")))
        .alias("source"),
    )
    t0 = time.time()
    out = cap_per_group(df, "source", cap)
    per_group = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    elapsed = time.time() - t0
    assert per_group["hot"] == cap
    # every cold domain has 500 odd-id rows (under cap): all kept
    assert all(
        v == 500 for k, v in per_group.items() if k != "hot"
    ), {k: v for k, v in per_group.items() if k != "hot" and v != 500}
    assert elapsed < BOUND_S, f"skewed cap_per_group took {elapsed:.1f}s"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan


def test_cap_per_group_equals_plain_window(spark):
    """Equivalence fuzz: the two-phase implementation returns the
    row-for-row identical set to the naive single-window form, across
    caps that straddle the group sizes (all-under, mixed, all-over)."""
    import random

    from pyspark.sql import Window

    from fourstore_spark.operators.sampling import cap_per_group

    rng = random.Random(11)
    rows = (
        [(i, f"g{rng.randint(0, 7)}") for i in range(2_000)]
        + [(10_000 + i, "hot") for i in range(3_000)]
        # NULL group: must be capped as its own group, never dropped
        # (the r10 count-join is null-safe for exactly this)
        + [(20_000 + i, None) for i in range(400)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"]).repartition(7)
    for cap in (1, 50, 260, 5_000):
        w = Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
        plain = {
            (r["doc_id"], r["source"])
            for r in df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cap)
            .drop("__rn")
            .collect()
        }
        got = {
            (r["doc_id"], r["source"])
            for r in cap_per_group(df, "source", cap, skew_chunks=5).collect()
        }
        assert got == plain, f"cap={cap}"
