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
    # round, not int(): float truncation (0.29*1e6 = 289999.9999...)
    # would shift cutoffs off the intended round numbers
    return df.where(hash_bucket(F.col(key_col)) < round(fraction * _MOD))


def split_by_hash(
    df: DataFrame, key_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Assign every row to exactly one named split (e.g. {"train": .98,
    "val": .01, "test": .01}) by consecutive hash-bucket ranges; returns
    the frame with a ``split`` column. Fractions must sum to <= 1; any
    remainder falls into split ``None`` (useful for subsampling)."""
    b = hash_bucket(F.col(key_col))
    expr = F.lit(None).cast("string")
    # build the when-chain lowest range first (reversed fold)
    for name, lo, hi in reversed(split_ranges(fractions)):
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def split_ranges(fractions: dict[str, float]) -> list[tuple[str, int, int]]:
    """Consecutive [lo, hi) bucket ranges for the named fractions —
    round()ed, not int()-truncated, so cutoffs land on the exact round
    numbers an oracle hardcodes (int(0.29*1e6) would be 289999)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    ranges = []
    hi = 0
    for name, frac in fractions.items():
        lo, hi = hi, hi + round(frac * _MOD)
        ranges.append((name, lo, hi))
    return ranges
