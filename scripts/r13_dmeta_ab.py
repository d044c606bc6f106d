"""r13 isolated dmetaphone-UDF arm: token stream from sf0.1 documents
-> dmetaphone_udf -> noop sink (guide §1.4), timed best-of-3.

Usage: PYTHONPATH=<tree> python scripts/r13_dmeta_ab.py <tag> [sf_dir]

Also prints a checksum of the phoneme output (sorted (token, keys)
pairs over the distinct-token set) so arms can be diffed for
byte-identity.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

TAG = sys.argv[1] if len(sys.argv) > 1 else "run"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    .appName(f"r13-dmeta-ab-{TAG}")
    .config(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
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

from fourstore_spark.operators.fulltext import dmetaphone_udf  # noqa: E402

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
toks = docs.select(
    F.explode(F.split(F.lower(F.col("text")), r"[^a-z0-9]+")).alias("tok")
).where(F.length("tok") > 0)

dm = dmetaphone_udf()
stream = toks.select(dm(F.col("tok")).alias("keys"))

# warm-up: fills worker memos identically in both arms, pays JIT
spark.sparkContext.setJobDescription(f"{TAG}: warmup")
stream.write.format("noop").mode("overwrite").save()

walls = []
for i in range(3):
    spark.sparkContext.setJobDescription(f"{TAG}: trial {i}")
    t0 = time.perf_counter()
    stream.write.format("noop").mode("overwrite").save()
    walls.append(round(time.perf_counter() - t0, 3))

# byte-identity surface: phonemes of every distinct token
pairs = sorted(
    (r["tok"], tuple(r["keys"]))
    for r in toks.distinct().select("tok", dm(F.col("tok")).alias("keys"))
    .collect()
)
ck = hashlib.md5(repr(pairs).encode()).hexdigest()
n_occ = toks.count()
print(
    f"RESULT tag={TAG} walls={walls} best={min(walls)} "
    f"occurrences={n_occ} distinct={len(pairs)} phonemes_ck={ck}"
)
spark.stop()
