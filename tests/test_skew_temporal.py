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
