"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 next to its oracle_sql() DuckDB
query and compare row count + column names + order-insensitive values.

Usage: python scripts/check_contract.py [entry ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def row_key(row):
    return tuple(norm(v) for v in row)


def main() -> int:
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
                for x, y in zip(a, b):
                    if x == y:
                        continue
                    if isinstance(x, float) and isinstance(y, float):
                        if x != y and not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                            close = False
                    else:
                        close = False
            kind = "FLOAT-NOISE" if close else "VALUES"
            status.append(
                f"{kind} mismatch at sorted-row {diff_i}: "
                f"spark={srows[diff_i] if diff_i is not None else '?'} "
                f"duck={drows[diff_i] if diff_i is not None else '?'}"
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
