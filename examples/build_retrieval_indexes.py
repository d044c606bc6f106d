"""Retrieval-stack example: build the WRITTEN index layouts once, then
serve lookups that stay flat as the corpus grows — the deployment shape
for RAG-style retrieval over a curated corpus.

    1. BM25 postings index  — write_bm25_index partitions per-(doc,term)
       postings by md5 term bucket; bm25_query opens only the query
       terms' buckets (3/64 directories for a 3-term query).
    2. IVF vector index     — train_centroids + write_ivf_index
       partition the embeddings by nearest-centroid cell;
       ivf_probe_indexed scans only the probed cells and reuses the
       stored cell labels (the assignment was paid at write time).
    3. Incremental append   — new documents/vectors land O(delta)
       (append_bm25_index / append_ivf_index); results equal a rebuild.
    4. Compaction           — appends grow small files; compact_bm25_index
       / compact_ivf_index rewrite one file set per bucket/cell with
       results pinned identical (the real-ops maintenance step).

Run:  python examples/build_retrieval_indexes.py [sf_dir] [out_dir]
      (defaults /root/testdata/sf0.001, /tmp/retrieval_demo)

Measured at sf3 (BASELINE.md round-11 slope): indexed BM25 lookups run
~0.6 s vs 6.8 s full-scan, IVF probes ~10 s vs 85 s — both flat across
30x data, which is the property that matters at 100 TB.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_and_query(spark: SparkSession, sf_dir: str, out: str) -> dict:
    from fourstore_spark.operators.lm import (
        append_bm25_index,
        bm25_query,
        compact_bm25_index,
        write_bm25_index,
    )
    from fourstore_spark.operators.similarity import (
        append_ivf_index,
        compact_ivf_index,
        ivf_probe_indexed,
        train_centroids,
        write_ivf_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. text side: build on the first half, append the second half
    bm25_path = os.path.join(out, "bm25")
    write_bm25_index(docs.where("doc_id % 2 = 0"), bm25_path, n_buckets=16)
    append_bm25_index(docs.where("doc_id % 2 = 1"), bm25_path)
    hits = bm25_query(spark, bm25_path, ["table", "spark", "merge"])
    top_text = hits.orderBy(F.desc("score_micro"), "doc_id").limit(5)

    # 2. vector side: fixed coarse quantizer, same split
    cents = train_centroids(emb, k=8, iters=4)
    ivf_path = os.path.join(out, "ivf")
    write_ivf_index(emb.where("vec_id % 2 = 0"), cents, ivf_path)
    append_ivf_index(emb.where("vec_id % 2 = 1"), ivf_path)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    neighbors = ivf_probe_indexed(spark, ivf_path, queries, k=5, nprobe=3)
    pre = {
        "bm25_matches": hits.count(),
        "top_text_ids": [r["doc_id"] for r in top_text.collect()],
        "ann_rows": sorted(map(tuple, neighbors.collect())),
        "ann_queries": neighbors.select("query_id").distinct().count(),
    }

    # 3. maintenance: compact the append-grown layouts; lookups must be
    # value-identical afterwards (the equality the tests pin)
    compact_bm25_index(spark, bm25_path)
    compact_ivf_index(spark, ivf_path)
    hits2 = bm25_query(spark, bm25_path, ["table", "spark", "merge"])
    n2 = ivf_probe_indexed(spark, ivf_path, queries, k=5, nprobe=3)
    assert hits2.count() == pre["bm25_matches"]
    assert sorted(map(tuple, n2.collect())) == pre["ann_rows"]

    return {
        "bm25_matches": pre["bm25_matches"],
        "top_text_ids": pre["top_text_ids"],
        "ann_rows": len(pre["ann_rows"]),
        "ann_queries": pre["ann_queries"],
        "compacted_ok": True,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/retrieval_demo"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("retrieval-indexes")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    stats = build_and_query(spark, sf_dir, out)
    for k, v in stats.items():
        print(f"{k:>14}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
