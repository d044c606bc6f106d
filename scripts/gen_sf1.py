"""Synthesize the sf1 (10x sf0.1) benchmark tables into /tmp/sfdata/sf1.

The BENCH_sf1 sections of BASELINE.md measure bench.py at 10x the
driver's scale to separate local-mode fixed floors from real scaling.
The r5/r6 runs built this data ad-hoc; this script makes the recipe
reproducible:

- region/nation are dimensions — copied as-is so every FK stays valid.
- fact tables replicate 10x with KEY-SHIFTED copies (key += copy *
  span) so join fan-outs per key are IDENTICAL to sf0.1 (a customer
  still has the same orders; an order the same lineitems).
- documents' text is per-copy letter-ROTATED (a->b->c... by copy) so
  the near-duplicate structure scales 10x instead of every doc gaining
  9 exact cross-copy duplicates (which would quadratically blow up the
  LSH buckets and measure a different workload).
- embeddings are per-copy dimension-ROTATED: norms and within-copy
  geometry are preserved, cross-copy cosine similarity decorrelates.

Usage: python scripts/gen_sf1.py [out_dir] [copies]
       (defaults /tmp/sfdata/sf1, 10 copies; 30 copies ~= sf3 for the
       r9 scale-trend measurement — the key spans keep 30 copies
       collision-free and the 64-dim embedding rotation stays
       injective; text permutations extend past 26 copies via affine
       alphabet maps so no copy pair is ever an exact text duplicate)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
ALPHA = "abcdefghijklmnopqrstuvwxyz"
# multipliers coprime to 26: affine maps (a, b) -> idx*a+b give 12*26
# distinct alphabet permutations; copies 0-25 keep the original pure
# rotations (a=1) so the published sf1 recipe is byte-identical
_UNITS = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]

# key column -> shift span (next power-of-10 above the sf0.1 max key,
# so shifted ranges never collide and keys stay readable)
SPANS = {
    "c_custkey": 100_000,
    "s_suppkey": 10_000,
    "p_partkey": 100_000,
    "o_orderkey": 1_000_000,
    "o_custkey": 100_000,
    "l_orderkey": 1_000_000,
    "l_partkey": 100_000,
    "l_suppkey": 10_000,
    "event_id": 1_000_000,
    "user_id": 100_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def rotated(i: int) -> str:
    a, b = _UNITS[i // 26 % len(_UNITS)], i % 26
    return "".join(ALPHA[(a * k + b) % 26] for k in range(26))


def copy_select(table: str, cols: list[str], i: int) -> str:
    parts = []
    for c in cols:
        if c in SPANS:
            parts.append(f"{c} + {i * SPANS[c]} AS {c}")
        elif table == "documents" and c == "text":
            rot = rotated(i)
            parts.append(
                f"translate({c}, '{ALPHA}{ALPHA.upper()}', "
                f"'{rot}{rot.upper()}') AS {c}"
            )
        elif table == "embeddings" and c == "embedding":
            # rotate dims by i: list slicing is 1-based inclusive
            parts.append(
                f"(embedding[{i + 1}:] || embedding[1:{i}]) AS embedding"
                if i else "embedding"
            )
        else:
            parts.append(c)
    return f"SELECT {', '.join(parts)} FROM src WHERE TRUE"


def main(out_dir: str, copies: int = COPIES) -> None:
    global COPIES
    COPIES = copies
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if t in ("region", "nation"):
            shutil.copyfile(src, dst)
            print(f"{t}: copied")
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        con.execute(f"CREATE OR REPLACE VIEW src AS "
                    f"SELECT * FROM read_parquet('{src}')")
        union = "\nUNION ALL\n".join(
            copy_select(t, cols, i) for i in range(COPIES)
        )
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else COPIES,
    )
