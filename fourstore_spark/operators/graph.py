"""Graph analytics over edge tables (and the RDF quad graph).

The engine already runs semi-naive fixpoints for SPARQL property-path
closures (translator.py `_transitive_closure`) and pointer-jumping
connected components (operators/components.py). This module adds the
classic iterative ranking pass a knowledge-graph/corpus pipeline wants
on top: PageRank, plus degree statistics.

**Exact integer semantics.** Floating-point PageRank is partition-order
dependent (sums of doubles), which would break both cross-run
determinism and SQL-oracle comparison. Here ranks live on an integer
grid (parts-per-`scale`): each edge contributes floor(rank/out_degree),
damping applies as the rational 85/100 under floor division, and the
teleport base is floor(0.15*scale/N). Every iteration is therefore an
exact integer function of the previous one — identical on any engine,
any partitioning (the same quantize-before-sum discipline as
operators/lm.py). Dangling-node mass is dropped, not redistributed —
the common "lost mass" variant — so ranks are a lower bound that still
orders nodes correctly for pruning/sampling use.

Scale shape: one join edges->ranks + one groupBy(dst) per iteration —
the standard distributed PageRank step; the rank/degree tables are
node-sized, edges never rewrite. Lineage is checkpoint-truncated every
`checkpoint_every` iterations (components.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["degree_stats", "pagerank", "rdf_edges"]


def rdf_edges(quads: DataFrame, predicate: str | None = None) -> DataFrame:
    """(src, dst) edges from a quad table: subject -> URI-valued object
    (literal objects are not nodes). Optionally restricted to one
    predicate — the typical "follow this relation" projection."""
    q = quads
    if predicate is not None:
        q = q.where(F.col("p") == predicate)
    return (
        q.where(F.col("o_kind") == 0)  # URI objects only (model.py kinds)
        .select(F.col("s").alias("src"), F.col("o_lex").alias("dst"))
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node, out_degree, in_degree) over the union of endpoints —
    two groupBys + one outer join, all node-sized."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 8,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Integer-exact PageRank: (node, rank) with rank in parts-per-
    `scale` (sum <= scale; dangling mass is dropped).

        r_0(v)     = floor(scale / N)
        r_{k+1}(v) = floor((100-damping_pct)*scale / (100*N))
                     + floor(damping_pct * M(v) / 100),
        M(v)       = sum over in-edges (u,v) of floor(r_k(u) / deg(u))

    All arithmetic is BIGINT floor division, so the result is an exact
    integer function of (edges, iters) — engine- and partitioning-
    independent, directly hash-comparable against a SQL replay."""
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
    # deg is loop-invariant: pre-join it onto the edge list ONCE,
    # pre-partitioned by src and checkpointed, so each iteration pays
    # one join (ranks, which changes) + one groupBy instead of
    # re-shuffling edges against the degree table every pass
    e_deg = (
        edges.select("src", "dst")
        .join(deg.withColumnRenamed("node", "src"), "src")
        .repartition("src")
        .localCheckpoint()
    )
    # The contrib groupBy's node set (distinct dst of e_deg) is ALSO
    # loop-invariant, and the only thing the remaining nodes (no
    # in-edges) ever receive is the constant teleport base — so the
    # per-iteration `nodes LEFT JOIN contrib` (a full node-table
    # shuffle join every pass) collapses to a one-time anti-join whose
    # constant rows are UNIONed onto each iteration's contrib
    # projection. Per-iteration work drops from 2 joins + 1 groupBy to
    # 1 join + 1 groupBy (r12 opt round; values identical — the same
    # rank recurrence, partitioned by who computes it).
    noin_ranks = (
        nodes.join(
            e_deg.select(F.col("dst").alias("node")).distinct(),
            "node",
            "left_anti",
        )
        .select("node", F.lit(base).cast("long").alias("rank"))
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
        ranks = contrib.select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * m) div 100")
            ).cast("long").alias("rank"),
        ).unionByName(noin_ranks)
        if (step + 1) % checkpoint_every == 0 and step + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks
