"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 next to its oracle_sql() DuckDB
query and compare row count + column names + order-insensitive values.

Usage: python scripts/check_contract.py [entry ...]
"""

from __future__ import annotations

import math
import os
import struct
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    """Representation-sensitive normalization (VERDICT r4 #2).

    The driver's hash distinguishes -0.0 from 0.0 and compares decimals by
    their rendered form, but Python's == treats -0.0 == 0.0 and
    Decimal('1.0') == Decimal('1.00') as equal — so a plain-== local gate
    is structurally blind to exactly the failure class that kept
    f_numeric_cast red for two rounds. Compare floats by IEEE bit pattern
    and decimals by (sign, digits, exponent) so local red predicts driver
    red.
    """
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f64", struct.pack(">d", v))
    if isinstance(v, Decimal):
        return ("dec", v.as_tuple())
    return v


def denorm(v):
    """Inverse of norm for diagnostics (float-noise closeness check)."""
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "f64":
        return struct.unpack(">d", v[1])[0]
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "dec":
        return Decimal(v[1])
    return v


def row_key(row):
    return tuple(norm(v) for v in row)


# Spark dtype string -> the DuckDB type the driver's representation hash
# would agree with. The r9 regression (VERDICT r9 #1/#2): DuckDB widens
# bare SUM(BIGINT) to HUGEINT, Python ints erase the width, both entries
# passed this gate locally yet hash-mismatched in the driver. Local red
# must predict driver red, so compare DESCRIBE types against the Spark
# schema column-by-column.
_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_SPARK_TO_DUCK = {
    # The <=64-bit integer family is mutually compatible: the driver
    # hash compares values (sim_ivf_exact was driver-GREEN in r9 with a
    # Spark int rank against a BIGINT oracle). HUGEINT is NOT in the
    # set — DuckDB's pandas bridge degrades it to float64, which is
    # exactly how the r9 red rows mismatched on identical values.
    "bigint": _INTS,
    "int": _INTS,
    "smallint": _INTS,
    "tinyint": _INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "timestamp": {"TIMESTAMP"},
    "timestamp_ntz": {"TIMESTAMP"},
    "date": {"DATE"},
}


def type_mismatches(
    spark_dtypes: list[tuple[str, str]], duck_types: dict[str, str]
) -> list[str]:
    """Columns whose oracle (DuckDB) type disagrees with the Spark
    schema in a width/representation-visible way. HUGEINT vs BIGINT is
    the motivating case; any unmapped Spark type with an oracle present
    is also an error (extend the map deliberately, not by accident)."""
    errs = []
    for col, sdt in spark_dtypes:
        ddt = duck_types.get(col)
        if ddt is None:
            continue  # column-name mismatch is reported separately
        m = __import__("re").fullmatch(r"decimal\((\d+),(\d+)\)", sdt)
        want = (
            {f"DECIMAL({m.group(1)},{m.group(2)})"}
            if m
            else _SPARK_TO_DUCK.get(sdt)
        )
        if want is None:
            errs.append(f"{col}: unmapped Spark dtype {sdt!r} (oracle {ddt})")
        elif ddt not in want:
            errs.append(f"{col}: oracle type {ddt} != Spark {sdt} ({want})")
    return errs


def selftest() -> int:
    """Planted fixtures: the gate must distinguish what the driver's
    representation hash distinguishes."""
    assert norm(-0.0) != norm(0.0), "signed zero must be visible"
    assert norm(Decimal("1.0")) != norm(Decimal("1.00")), "decimal scale"
    assert norm(1.0) == norm(1.0) and norm(Decimal("1.00")) == norm(
        Decimal("1.00")
    )
    assert norm(float("nan")) == norm(float("nan")), "NaN equals NaN"
    assert denorm(norm(-0.0)) == 0.0 and math.copysign(1, denorm(norm(-0.0))) < 0
    # planted HUGEINT fixture (VERDICT r9): a bare SUM(BIGINT) oracle
    # widens to HUGEINT; the type gate must flag it against a Spark
    # bigint column even though the VALUES compare identically.
    import duckdb as _duck

    desc = _duck.connect().execute(
        "DESCRIBE SELECT SUM(x) AS s FROM (VALUES (CAST(1 AS BIGINT))) t(x)"
    ).fetchall()
    planted = {row[0]: row[1] for row in desc}
    assert planted["s"] == "HUGEINT", planted
    errs = type_mismatches([("s", "bigint")], planted)
    assert errs and "HUGEINT" in errs[0], errs
    assert type_mismatches([("s", "bigint")], {"s": "BIGINT"}) == []
    assert type_mismatches([("d", "decimal(38,6)")], {"d": "DECIMAL(38,6)"}) == []
    assert type_mismatches([("d", "decimal(38,6)")], {"d": "DECIMAL(38,9)"}) != []
    assert type_mismatches([("a", "array<bigint>")], {"a": "BIGINT[]"}) != [], (
        "unmapped Spark dtypes must fail loudly, not pass silently"
    )
    print("selftest: ok")
    return 0


def main() -> int:
    if "--selftest" in sys.argv:
        return selftest()

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oq = entry_mod.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = sorted(
                row_key(tuple(r[c] for c in scols)) for r in sdf.collect()
            )
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oq:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if not srows:
                print(f"     WARNING: {name} returned 0 rows")
            continue
        try:
            duck_types = {
                row[0]: row[1]
                for row in con.execute(f"DESCRIBE {oq[name]}").fetchall()
            }
            res = con.execute(oq[name])
            dcols_full = [d[0] for d in res.description]
            drows_raw = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        dorder = sorted(range(len(dcols_full)), key=lambda i: dcols_full[i])
        dcols = [dcols_full[i] for i in dorder]
        drows = sorted(row_key(tuple(row[i] for i in dorder)) for row in drows_raw)
        status = []
        if scols != dcols:
            status.append(f"cols {scols} != {dcols}")
        terrs = type_mismatches(sdf.dtypes, duck_types)
        if terrs:
            status.append(f"TYPES {terrs}")
        if len(srows) != len(drows):
            status.append(f"rowcount {len(srows)} != {len(drows)}")
        elif srows != drows:
            # locate first differing row for diagnosis
            diff_i = next(
                (i for i, (a, b) in enumerate(zip(srows, drows)) if a != b), None
            )
            # is it float-noise or a real mismatch?
            close = True
            for a, b in zip(srows, drows):
                for xn, yn in zip(a, b):
                    if xn == yn:
                        continue
                    x, y = denorm(xn), denorm(yn)
                    if isinstance(x, float) and isinstance(y, float):
                        if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                            close = False
                    else:
                        close = False
            kind = "FLOAT-NOISE" if close else "VALUES"
            show = lambda r: tuple(repr(denorm(v)) for v in r)  # noqa: E731
            status.append(
                f"{kind} mismatch at sorted-row {diff_i}: "
                f"spark={show(srows[diff_i]) if diff_i is not None else '?'} "
                f"duck={show(drows[diff_i]) if diff_i is not None else '?'}"
            )
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
