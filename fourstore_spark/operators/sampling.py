"""Deterministic sampling and splitting for training pipelines.

Random sampling (df.sample) is nondeterministic across runs/partitions
— useless for reproducible train/eval splits or decontamination-stable
holdouts. These operators derive membership from a cryptographic hash
of the ROW KEY, so a document lands in the same split on every run, on
any cluster, in any engine that can compute md5 (the DuckDB oracle
computes the identical assignment):

    bucket(id) = first 8 hex chars of md5(id) as an integer, mod 1e6

All pure column expressions — zero shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = 1_000_000


def hash_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, 1e6) from the md5 of the key's string
    form — stable across engines, runs, and partitionings."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % _MOD


def sample_by_hash(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash (reproducible)."""
    return df.where(hash_bucket(F.col(key_col)) < int(fraction * _MOD))


def split_by_hash(
    df: DataFrame, key_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Assign every row to exactly one named split (e.g. {"train": .98,
    "val": .01, "test": .01}) by consecutive hash-bucket ranges; returns
    the frame with a ``split`` column. Fractions must sum to <= 1; any
    remainder falls into split ``None`` (useful for subsampling)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = hash_bucket(F.col(key_col))
    expr = F.lit(None).cast("string")
    hi = 0
    # build the when-chain lowest range first (reversed fold)
    ranges = []
    for name, frac in fractions.items():
        lo, hi = hi, hi + int(frac * _MOD)
        ranges.append((name, lo, hi))
    for name, lo, hi in reversed(ranges):
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
