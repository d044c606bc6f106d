"""Distributed connected components + duplicate-cluster resolution.

The dedup operators (operators.dedup) emit candidate/verified PAIRS;
a production pipeline then needs CLUSTERS — near-duplicate relations
are not transitive-closed, so "keep one per pair" under-deletes (A~B,
B~C leaves both A,C) and naive grouping over-deletes. The standard
resolution is connected components over the pair graph, keeping one
representative per component.

Algorithm: min-label propagation with POINTER JUMPING (the classic
Shiloach-Vishkin shortcutting step, the same device Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds",
ICDE 2013, build large-star/small-star around — all public
literature): every node starts labeled with its own id; each round
(a) takes the min label over the 1-hop neighborhood, then (b) jumps
pointers — relabels each node with its label's OWN current label.
Step (a) alone needs O(diameter) rounds (a 100-hop LSH template-drift
chain would need 100); step (b) doubles the distance a min has
travelled, so the combination converges in O(log n) rounds on ANY
graph, chains included (regression-tested on a 200-node path).
Spark-first shape:

- state is a (node, component) DataFrame — fixed-width rows, shuffles
  partition on the node key only;
- each round is two equi-joins + one groupBy-min;
- lineage is truncated with localCheckpoint every round, exactly like
  the property-path fixpoint (translator._path_closure) — without it
  the plan doubles per iteration;
- convergence is detected with a count of changed labels (one small
  aggregate per round, no collect of data rows);
- non-convergence is IMPOSSIBLE to miss: exhausting ``max_iterations``
  with labels still moving raises rather than returning
  partially-merged components (which would silently under-delete
  duplicates downstream in resolve_duplicate_clusters).

At 100 TB: the edge set for dedup is orders of magnitude smaller than
the corpus (only candidate pairs), and the documents themselves never
enter the iteration — resolution joins components back by id at the
end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """(src, dst) edge list -> (node, component) with component = the
    minimum node id reachable from the node. Node ids may be any
    orderable type (long doc ids, string fingerprints).

    Raises RuntimeError if labels are still changing after
    ``max_iterations`` rounds (with pointer jumping that needs a graph
    of ~2**max_iterations diameter — raise the cap if you genuinely
    have one; a silent partial answer is never returned).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iterations):
        # (a) propagate: every node offers its current label to each
        # neighbor (and keeps its own); take the min per node
        offered = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "component")
            .unionByName(labels)
        )
        propagated = offered.groupBy("node").agg(
            F.min("component").alias("component")
        )
        # (b) pointer jump: component <- label-of(component). Every
        # component value is a node id present in `labels` (labels are
        # mins over node ids), so the lookup is total; coalesce guards
        # the self-rooted rows the join planner may null-extend.
        lut = propagated.select(
            F.col("node").alias("component"),
            F.col("component").alias("jump"),
        )
        new = (
            propagated.join(lut, "component", "left")
            .select(
                "node",
                F.coalesce("jump", "component").alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("component", "old"), "node")
            .where(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "rounds; raise max_iterations (labels were still changing — "
        "returning them would silently under-merge duplicate clusters)"
    )


def resolve_duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "id_a",
    right_col: str = "id_b",
) -> DataFrame:
    """Drop every document in a duplicate cluster except its minimum-id
    representative. ``pairs`` is any (id_a, id_b) near-duplicate relation
    (e.g. verified MinHash-LSH output); documents in no pair survive
    untouched. The corpus never enters the component iteration — only a
    final id-equi-join against the (small) clustered-node set."""
    comp = connected_components(pairs, src=left_col, dst=right_col)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    # no forced broadcast: the loser set scales with the duplicate rate,
    # so let AQE pick broadcast vs shuffled anti-join from actual size
    return docs.join(losers, id_col, "left_anti")
