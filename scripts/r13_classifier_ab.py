"""r13 classifier-training A/B + per-iteration plan capture.

Usage: PYTHONPATH=<tree> python scripts/r13_classifier_ab.py \
           <tag> [sf_dir] [iters] [plans_out]

Runs train_quality_classifier from whichever tree is first on
sys.path (so the same script measures the r12 parent, the inherited
no-op, and the r13 persist fix), times the train wall, captures the
physical plan of a mid-training gradient collect by monkeypatching
DataFrame.collect, and prints a weight checksum so arms can be
diffed for bit-identity.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

TAG = sys.argv[1] if len(sys.argv) > 1 else "run"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 6
PLANS_OUT = sys.argv[4] if len(sys.argv) > 4 else ""

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Spark 4: instances are the classic subclass, which overrides collect
from pyspark.sql.classic.dataframe import DataFrame

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    .appName(f"r13-classifier-ab-{TAG}")
    .config(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "64m")
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

from fourstore_spark.operators.classifier import (  # noqa: E402
    train_quality_classifier,
)

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
pos = docs.where(F.col("doc_id") % 2 == 0)
neg = docs.where(F.col("doc_id") % 2 == 1)

captured: list[str] = []
orig_collect = DataFrame.collect


def capturing_collect(self):
    buf = io.StringIO()
    with redirect_stdout(buf):
        self.explain("formatted")
    captured.append(buf.getvalue())
    return orig_collect(self)


# warm-up pass (JIT + cache the parquet footer reads), untimed
spark.sparkContext.setJobDescription(f"{TAG}: warmup train")
train_quality_classifier(pos, neg, iters=2)

spark.sparkContext.setJobDescription(f"{TAG}: timed train")
walls = []
for trial in range(3):
    t0 = time.perf_counter()
    w, bias = train_quality_classifier(pos, neg, iters=ITERS)
    walls.append(round(time.perf_counter() - t0, 3))

# checksum of the final trial's weights (bit-identity across arms)
rows = sorted((r["b"], r["w_micro"]) for r in w.collect())
import hashlib

ck = hashlib.md5(repr((rows, bias)).encode()).hexdigest()

if PLANS_OUT:
    DataFrame.collect = capturing_collect
    try:
        train_quality_classifier(pos, neg, iters=2)
    finally:
        DataFrame.collect = orig_collect
    # the last capture is a mid-training gradient collect (iteration 2)
    grad_plans = [p for p in captured if "Window" in p]
    with open(PLANS_OUT, "w", encoding="utf-8") as fh:
        fh.write(grad_plans[-1] if grad_plans else "NO WINDOW PLAN SEEN")
    print(f"plan written: {PLANS_OUT}")

print(
    f"RESULT tag={TAG} iters={ITERS} walls={walls} "
    f"best={min(walls)} weights_ck={ck} bias={bias} n_w={len(rows)}"
)
spark.stop()
