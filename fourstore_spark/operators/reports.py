"""Corpus mix / quality reports — the data-mixing dashboard primitive.

A pre-training pipeline decides sampling weights per (source, language)
bucket from exactly these numbers: document and token volumes, quality
distribution, and exact-duplicate rates. One zero-join pass: every
signal is a scan-projection column (textstats family), followed by a
single groupBy on the bucket key — at 100 TB that is one shuffle of
tiny aggregation buffers, never of documents.

Numeric discipline matches the contract conventions: token totals are
exact long sums; the quality mean accumulates DECIMAL(38,6) (per-doc
scores are already rounded to 6 decimals) and divides once, so the
result is order-independent and bit-stable across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    *,
    approx: bool = False,
    m: int = 1024,
) -> DataFrame:
    """Per-(source, detected-language) corpus statistics:

    - ``n_docs``, ``total_tokens`` — volume for sampling weights
    - ``avg_quality`` — mean heuristic quality (exact decimal mean)
    - ``n_distinct`` — distinct normalization fingerprints
    - ``dup_frac`` — 1 - n_distinct/n_docs, the exact-dup rate

    ``approx=False`` (default) computes ``n_distinct`` exactly — which
    at 100 TB is the one aggregate here whose state is corpus-sized:
    the distinct shuffle carries one record per distinct (bucket,
    fingerprint) pair. ``approx=True`` replaces it with a per-bucket
    HyperLogLog (``sketch.hll_register_exprs``, same md5 register math
    as ``hll_build``): state is bounded at ``m`` integer registers per
    bucket, the pass count stays at one (register max rides the same
    partial aggregation as the token/quality sums), and the standard
    error is ~1.04/sqrt(m) (about 3% at m=1024; quadruple m to halve
    it). The approximate ``n_distinct`` is clamped to ``n_docs`` so
    ``dup_frac`` stays in [0, 1]; every other column is identical to
    the exact path (the volume/quality sums stay exact integers and
    decimals either way)."""
    from fourstore_spark.operators.textstats import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    base = docs.select(
        F.col(source_col).alias("source"),
        lang_id(F.col(text_col)).alias("lang_guess"),
        token_count(F.col(text_col)).alias("__ntok"),
        quality_score(F.col(text_col)).alias("__q"),
        fingerprint(F.col(text_col)).alias("__fp"),
    )
    if not approx:
        n = F.count(F.lit(1))
        nd = F.count_distinct("__fp")
        return (
            base.groupBy("source", "lang_guess")
            .agg(
                n.alias("n_docs"),
                F.sum("__ntok").alias("total_tokens"),
                F.round(
                    F.sum(F.col("__q").cast("decimal(38,6)"))
                    .cast("double")
                    / n,
                    6,
                ).alias("avg_quality"),
                nd.alias("n_distinct"),
                F.round(
                    F.lit(1.0) - nd.cast("double") / n.cast("double"), 6
                ).alias("dup_frac"),
            )
        )

    from fourstore_spark.operators.sketch import hll_register_exprs

    j, rho = hll_register_exprs(F.col("__fp"), m)
    # level 1: one row per (bucket, register) — the token/quality sums
    # become exact PARTIALS riding the same shuffle, so approx mode is
    # still a single pass over the documents
    regs = (
        base.select(
            "source",
            "lang_guess",
            "__ntok",
            "__q",
            F.when(F.col("__fp").isNotNull(), j).alias("j"),
            F.when(F.col("__fp").isNotNull(), rho).alias("rho"),
        )
        .groupBy("source", "lang_guess", "j")
        .agg(
            F.count(F.lit(1)).alias("__pn"),
            F.sum("__ntok").alias("__ptok"),
            F.sum(F.col("__q").cast("decimal(38,6)")).alias("__pq"),
            F.max("rho").alias("M"),
        )
    )
    # level 2: m-bounded rows per bucket -> the hll_estimate readout as
    # column math (harmonic mean, linear-counting small range, 32-bit
    # large-range correction — kept in lockstep with sketch.hll_estimate)
    n = F.sum("__pn")
    nregs = F.count("M")
    # coalesce: a bucket whose fingerprints are ALL NULL has no
    # registers at all — its sum is NULL, but the readout must see
    # s = m (all-zero registers) and estimate 0 like the exact path
    s = F.coalesce(
        F.sum(F.pow(F.lit(0.5), F.col("M"))), F.lit(0.0)
    ) + (F.lit(m) - nregs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - nregs
    two32 = float(1 << 32)
    est = (
        F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        )
        .when(
            raw > two32 / 30.0,
            F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32)),
        )
        .otherwise(raw)
    )
    nd = F.least(F.round(est, 0).cast("long"), n)
    return (
        regs.groupBy("source", "lang_guess")
        .agg(
            n.alias("n_docs"),
            F.sum("__ptok").alias("total_tokens"),
            F.round(F.sum("__pq").cast("double") / n, 6).alias(
                "avg_quality"
            ),
            nd.alias("n_distinct"),
            F.round(
                F.lit(1.0) - nd.cast("double") / n.cast("double"), 6
            ).alias("dup_frac"),
        )
    )
