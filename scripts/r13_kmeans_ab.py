"""r13 kmeans_fit A/B + per-iteration plan capture.

Usage: PYTHONPATH=<tree> python scripts/r13_kmeans_ab.py \
           <tag> [sf_dir] [iters] [plans_out]

Times kmeans_fit from whichever tree is first on sys.path, captures
the physical plan of every per-iteration means collect (monkeypatched
classic DataFrame.collect), counts parquet scans across the fit's
jobs, and prints a centroid checksum for cross-arm bit-identity.
"""

from __future__ import annotations

import hashlib
import io
import os
import sys
import time
from contextlib import redirect_stdout

TAG = sys.argv[1] if len(sys.argv) > 1 else "run"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
PLANS_OUT = sys.argv[4] if len(sys.argv) > 4 else ""

from pyspark.sql import SparkSession
from pyspark.sql.classic.dataframe import DataFrame

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    .appName(f"r13-kmeans-ab-{TAG}")
    .config(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    .config("spark.sql.adaptive.enabled", "true")
    .config(
        "spark.sql.files.minPartitionNum",
        os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import fourstore_spark  # noqa: E402

print(f"tree: {os.path.dirname(fourstore_spark.__file__)}", flush=True)

from fourstore_spark.operators.similarity import kmeans_fit  # noqa: E402

emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

# warm-up (JIT), untimed
kmeans_fit(emb, k=4, iters=1)

walls = []
for trial in range(3):
    t0 = time.perf_counter()
    cents = kmeans_fit(emb, k=8, iters=ITERS)
    walls.append(round(time.perf_counter() - t0, 3))

ck = hashlib.md5(repr(cents).encode()).hexdigest()

if PLANS_OUT:
    captured: list[str] = []
    orig_collect = DataFrame.collect

    def capturing_collect(self):
        buf = io.StringIO()
        with redirect_stdout(buf):
            self.explain("formatted")
        captured.append(buf.getvalue())
        return orig_collect(self)

    DataFrame.collect = capturing_collect
    try:
        kmeans_fit(emb, k=8, iters=2)
    finally:
        DataFrame.collect = orig_collect
    scans = sum(p.count("Scan parquet") for p in captured)
    with open(PLANS_OUT, "w", encoding="utf-8") as fh:
        fh.write(
            f"# kmeans_fit k=8 iters=2: {len(captured)} collected jobs, "
            f"{scans} 'Scan parquet' occurrences across their plans\n\n"
        )
        for i, p in enumerate(captured):
            fh.write(f"### collect {i}\n{p}\n")
    print(f"plan written: {PLANS_OUT} (parquet scans in plans: {scans})")

print(
    f"RESULT tag={TAG} iters={ITERS} walls={walls} best={min(walls)} "
    f"centroids_ck={ck}"
)
spark.stop()
