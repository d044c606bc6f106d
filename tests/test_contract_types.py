"""Representation-discipline guard for the driver contract (_HEAD).

The driver hashes query outputs value-by-value and its DuckDB build
renders doubles/decimals differently from the local one — five rounds
of f_numeric_cast/f_decimal_exact hash-mismatches traced to exactly
this. Since r7 the rule is: no engine-native double/float/decimal may
appear in a hashed payload; numeric results flatten to scaled BIGINTs
(long6) or canonical VARCHAR (decstr). This test pins the rule for all
50 driver-window entries so it can't silently regress when new entries
rotate in.

Schema-only: each entry's DataFrame is BUILT (plan + schema) but never
executed, so the sweep is cheap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

_BANNED = (T.DoubleType, T.FloatType, T.DecimalType)


def _banned_cols(schema: T.StructType) -> list[str]:
    return [
        f.name for f in schema.fields if isinstance(f.dataType, _BANNED)
    ]


def test_head_entries_have_hash_safe_schemas(spark):
    head = entrymod._HEAD
    qs = entrymod.queries()
    offenders = {}
    for name in head:
        df = qs[name](spark, SF_DIR)
        bad = _banned_cols(df.schema)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "driver-window entries expose double/float/decimal columns — "
        "flatten through long6/decstr instead (VERDICT r6/r7 hash "
        f"saga): {offenders}"
    )


def test_guard_catches_planted_double(spark):
    """The assert itself must trip on a double column (the verdict's
    planted-dec6 check)."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        (F.col("id") * 1.5).alias("x"),
        F.lit("ok").alias("s"),
    )
    assert _banned_cols(df.schema) == ["x"]
    dec = spark.range(1).select(
        F.col("id").cast("decimal(38,6)").alias("d")
    )
    assert _banned_cols(dec.schema) == ["d"]
