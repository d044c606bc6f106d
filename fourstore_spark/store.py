"""Persistent quad-store layout.

Replaces the reference's per-predicate radix-tree files (ptree.c:46-70,
selection query-backend.c:48-69) with a columnar layout tuned for the two
access paths that dominate SPARQL plans:

- **predicate-constant scans** (every BGP pattern with a known p): rows
  are sorted by ``(p, s)`` inside each file, so Parquet row-group min/max
  stats + dictionary filters prune non-matching predicates before any IO;
- **subject joins / star groups**: rows are hash-distributed by ``s``, so
  a groupBy(s) star scan or an s-equi-join shuffles evenly (no predicate
  skew — partitioning BY p would put all of ``rdf:type`` in one
  partition, the mistake SURVEY §4 warns about). ``write_bucketed``
  additionally records bucketing in the metastore so s-joins between two
  bucketed tables skip the shuffle entirely.

A manifest records counts + layout for dump/restore parity
(src/frontend/dump.c, restore.c)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_fourstore_manifest.json"


def write_store(
    quads: DataFrame,
    path: str,
    partitions: int | None = None,
) -> dict:
    """Materialize a quads DataFrame at ``path``: hash-distributed by
    subject, (p, s)-sorted within files."""
    spark = quads.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    (
        quads.repartition(partitions, F.col("s"))
        .sortWithinPartitions("p", "s")
        .write.mode("overwrite")
        .parquet(path)
    )
    n = spark.read.parquet(path).count()
    manifest = {
        "format": "fourstore-quads-parquet-v1",
        "rows": n,
        "partitions": partitions,
        "distribute": "hash(s)",
        "sort_within": ["p", "s"],
    }
    with open(os.path.join(path, MANIFEST), "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
    return manifest


def read_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_manifest(path: str) -> dict | None:
    p = os.path.join(path, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def write_bucketed(
    quads: DataFrame, table: str, buckets: int = 32
) -> None:
    """Metastore-backed bucketed layout: two tables bucketed by ``s`` with
    the same bucket count co-locate, so s-joins are shuffle-free."""
    (
        quads.write.mode("overwrite")
        .bucketBy(buckets, "s")
        .sortBy("p", "s")
        .format("parquet")
        .saveAsTable(table)
    )


def analyze(spark: SparkSession, table: str) -> None:
    """Column statistics for Catalyst's CBO (the reference fetches
    (p,s)/(p,o) frequency histograms per bind — optimiser.c:445-524;
    ANALYZE gives Catalyst the same cardinality grounding)."""
    spark.sql(
        f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS g, s, p, o_lex"
    )
