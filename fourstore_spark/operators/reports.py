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
) -> DataFrame:
    """Per-(source, detected-language) corpus statistics:

    - ``n_docs``, ``total_tokens`` — volume for sampling weights
    - ``avg_quality`` — mean heuristic quality (exact decimal mean)
    - ``n_distinct`` — distinct normalization fingerprints
    - ``dup_frac`` — 1 - n_distinct/n_docs, the exact-dup rate
    """
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
    n = F.count(F.lit(1))
    nd = F.count_distinct("__fp")
    return (
        base.groupBy("source", "lang_guess")
        .agg(
            n.alias("n_docs"),
            F.sum("__ntok").alias("total_tokens"),
            F.round(
                F.sum(F.col("__q").cast("decimal(38,6)")).cast("double")
                / n,
                6,
            ).alias("avg_quality"),
            nd.alias("n_distinct"),
            F.round(
                F.lit(1.0) - nd.cast("double") / n.cast("double"), 6
            ).alias("dup_frac"),
        )
    )
