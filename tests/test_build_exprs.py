"""Focused equivalence tests for the r12 build-phase rewrites.

The optimization round replaced py4j-chatty Column construction with
expr() SQL strings (minhash signature aggregates, LSH band arrays,
bucket pair expansion, ahash band keys) and a per-process Column memo
(text_stats). Values must be bit-identical to the original Column
formulations — these tests pin that locally, next to the DuckDB oracle
entries that cover the same operators end-to-end.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def test_derived_hash_sql_matches_column_form(spark):
    """The SQL-string rotate-xor derivation == the Column one, every
    rotation class (0, plain, 64-wrap)."""
    from fourstore_spark.operators.dedup import _derived_hash, _derived_hash_sql

    df = spark.range(64).select(
        F.xxhash64("id").alias("h1"), F.xxhash64("id", F.lit(7)).alias("h2")
    )
    for i in (0, 1, 5, 31, 63, 64, 65):
        got = df.select(
            F.expr(_derived_hash_sql("h1", "h2", i)).alias("v")
        ).collect()
        want = df.select(
            _derived_hash(F.col("h1"), F.col("h2"), i).alias("v")
        ).collect()
        assert got == want, f"rotation {i}"


def test_ahash_single_band_fallback_bruteforce(spark):
    """max_hamming=7 exercises the expr-built single-byte band array
    (the two-band path is brute-force-pinned in test_operators); the
    banded pair set must equal all-pairs hamming <= 7."""
    from fourstore_spark.operators.multimodal import ahash_neardup_pairs

    h = spark.range(48).select(
        F.col("id").alias("media_id"),
        F.expr("xxhash64(id div 4) AS ahash_hi"),
        F.expr(
            "xxhash64(id div 4, 1) ^ (CASE WHEN id % 4 = 0 THEN 0L "
            "ELSE shiftleft(1L, CAST(id % 37 AS INT)) END) AS ahash_lo"
        ),
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_neardup_pairs(h, max_hamming=7).collect()
    }
    hv = {r["media_id"]: (r["ahash_hi"], r["ahash_lo"]) for r in h.collect()}
    want = {}
    for a, b in itertools.combinations(sorted(hv), 2):
        ham = bin(hv[a][0] ^ hv[b][0]).count("1") + bin(
            hv[a][1] ^ hv[b][1]
        ).count("1")
        if ham <= 7:
            want[(a, b)] = ham
    assert got == want and want  # non-vacuous: planted near-dups exist


def test_text_stats_memo_reuse_and_identity(spark):
    """Repeated text_stats calls reuse the memoized Columns and return
    identical rows (including empty/NULL text edge rows)."""
    from fourstore_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps! And the lazy dog, too: 123."),
            (2, ""),
            (3, None),
            (4, "le la et les des un une est"),
            (5, "   \t\n  "),
        ],
        "doc_id long, text string",
    )
    first = sorted(map(tuple, ts.text_stats(df).collect()))
    assert "text" in ts._TEXT_STATS_MEMO
    memo_obj = ts._TEXT_STATS_MEMO["text"]
    second = sorted(map(tuple, ts.text_stats(df).collect()))
    assert first == second
    assert ts._TEXT_STATS_MEMO["text"] is memo_obj  # reused, not rebuilt
