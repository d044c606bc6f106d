"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallel(
    df: DataFrame, floor: int = 8, by: list[str] | None = None
) -> DataFrame:
    """Spread an under-partitioned input across the cluster before a
    row-expensive or row-expanding stage (shingle/n-gram explodes,
    per-token pandas UDFs). A single-row-group parquet file is
    unsplittable, so such a stage would otherwise run as ONE task
    regardless of cluster size. No-op whenever the source already has
    min(defaultParallelism, floor) partitions — always true for a real
    multi-file corpus, so at 100 TB this never adds a shuffle; locally
    the tiny pre-stage exchange bought 2.7-5x on the dedup bench.

    ``by``: key the spread by these columns instead of round-robin when
    a downstream aggregation groups by exactly these columns — the
    groupBy then reuses the exchange (ENSURE_REQUIREMENTS satisfied by
    the existing HashPartitioning) instead of inserting a second one,
    and the keyed shuffle skips round-robin's sort-before-repartition
    map-side pass. Only pass unique-per-row keys (e.g. a doc id):
    hash-partitioning by a hot key would skew where round-robin
    balances."""
    if df.isStreaming:  # partitioning is the source's business in a stream
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min(target, floor):
        return df
    if by:
        return df.repartition(target, *by)
    return df.repartition(target)
