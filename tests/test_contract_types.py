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


@pytest.mark.slow  # DESCRIBEs all 176 oracles (~76s); check_contract.py --selftest covers the type gate per-entry
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


# ---------------------------------------------------------------------------
# Oracle-side width sweep (VERDICT r9 #1/#2). DuckDB widens bare
# SUM(BIGINT) to HUGEINT; the driver's representation hash sees the
# width, Python ints erase it, so lm_perplexity_ccnet/bm25_search went
# driver-red while every value matched. DESCRIBE binds without
# executing, so sweeping all oracles is cheap and needs no Spark.

_ORACLE_ALPHABET = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "VARCHAR",
    "BOOLEAN", "TIMESTAMP", "DATE", "DECIMAL(38,6)", "DECIMAL(38,9)",
}


def _oracle_describe():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/../sf0.001/{t}.parquet')"
        )
    out = {}
    for name, sql in entrymod.oracle_sql().items():
        out[name] = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    return out


def test_no_oracle_widened_integers():
    """No oracle may hash a HUGEINT/UHUGEINT (or any out-of-alphabet
    type): Spark has no 128-bit integer, so the driver hash can never
    agree. Bare SUM over BIGINT is the usual culprit — wrap it in
    CAST(... AS BIGINT)."""
    offenders = {
        name: {c: t for c, t in cols.items() if t not in _ORACLE_ALPHABET}
        for name, cols in _oracle_describe().items()
    }
    offenders = {n: bad for n, bad in offenders.items() if bad}
    assert not offenders, (
        "oracle columns typed outside the driver-hash alphabet "
        f"(CAST aggregates to BIGINT): {offenders}"
    )


def test_planted_hugeint_is_flagged():
    """The sweep must trip on the exact r9 failure shape."""
    import duckdb

    desc = duckdb.connect().execute(
        "DESCRIBE SELECT SUM(x) AS s FROM (VALUES (CAST(1 AS BIGINT))) t(x)"
    ).fetchall()
    assert desc[0][1] == "HUGEINT"
    assert desc[0][1] not in _ORACLE_ALPHABET
