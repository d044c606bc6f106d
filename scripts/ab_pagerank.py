"""Same-session A/B for the pagerank per-iteration shape (r12 opt round).

OLD shape (shipped through late-r12): per iteration
    contrib = e_deg JOIN ranks(src) -> groupBy(dst)
    ranks   = nodes LEFT JOIN contrib          <- a full node-table join
                                                  EVERY iteration
NEW shape (operators/graph.py): the left join's only job is to give
no-in-edge nodes their base rank — but that node set and that rank are
both loop-invariant, so it is computed ONCE (anti-join, checkpointed)
and each iteration just UNIONs the constant rows:
    ranks   = contrib-projection UNION noin_const

Interleaved best-of-3 at each sf dir, asserting the (node, rank)
multiset is identical between shapes every trial.

Usage: python scripts/ab_pagerank.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def pagerank_old(
    edges: DataFrame,
    *,
    iters: int = 8,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
    checkpoint_every: int = 4,
) -> DataFrame:
    """The late-r12 shape: loop-invariant degree join hoisted, but the
    nodes LEFT JOIN contrib still runs inside the loop."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    base = (100 - damping_pct) * scale // (100 * n)
    ranks = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    ranks = ranks.localCheckpoint()
    e_deg = (
        edges.select("src", "dst")
        .join(deg.withColumnRenamed("node", "src"), "src")
        .repartition("src")
        .localCheckpoint()
    )
    for step in range(iters):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(m, 0)) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
        if (step + 1) % checkpoint_every == 0 and step + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def _edges(spark, sf):
    """Same edge projection as scripts/bench_llm_trend.py:_edges."""
    n = spark.read.parquet(f"{sf}/nation.parquet").select(
        F.concat(F.lit("urn:nation:"), "n_nationkey").alias("src"),
        F.concat(F.lit("urn:region:"), "n_regionkey").alias("dst"),
    )
    c = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.concat(F.lit("urn:customer:"), "c_custkey").alias("src"),
        F.concat(F.lit("urn:nation:"), "c_nationkey").alias("dst"),
    )
    s = spark.read.parquet(f"{sf}/supplier.parquet").select(
        F.concat(F.lit("urn:supplier:"), "s_suppkey").alias("src"),
        F.concat(F.lit("urn:nation:"), "s_nationkey").alias("dst"),
    )
    return n.unionByName(c).unionByName(s)


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sfdata/sf1",
                           "/tmp/sfdata/sf3"]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-pagerank")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from fourstore_spark.operators.graph import pagerank as pagerank_new

    for sf in sfs:
        if not os.path.isdir(sf):
            print(f"skip {sf}")
            continue
        edges = _edges(spark, sf)
        results = {}
        walls: dict[str, list[float]] = {"old": [], "new": []}
        for trial in range(3):
            for name, fn in (("old", pagerank_old), ("new", pagerank_new)):
                spark.sparkContext.setJobDescription(
                    f"pagerank-{name}-t{trial}-{sf}")
                t0 = time.perf_counter()
                out = fn(edges, iters=6)
                agg = out.agg(
                    F.count("*"), F.sum("rank"),
                    F.sum(F.hash("node") * F.col("rank")),
                ).head()
                walls[name].append(time.perf_counter() - t0)
                chk = (agg[0], agg[1], agg[2])
                if name in results:
                    assert results[name] == chk, (name, results[name], chk)
                results[name] = chk
        assert results["old"] == results["new"], (
            "MISMATCH", results["old"], results["new"])
        print(
            f"{sf}: old best={min(walls['old']):.3f}s "
            f"(all {[round(w,3) for w in walls['old']]}) | "
            f"new best={min(walls['new']):.3f}s "
            f"(all {[round(w,3) for w in walls['new']]}) | "
            f"checksum MATCH {results['new']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
