"""Integer-exact PageRank / degree stats vs a pure-Python replica."""

from __future__ import annotations

import random

import pytest

from fourstore_spark.operators.graph import degree_stats, pagerank, rdf_edges

SCALE = 1_000_000_000


def ref_pagerank(edges, iters=8, damping_pct=85, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (100 - damping_pct) * scale // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        m = {v: 0 for v in nodes}
        for s, d in edges:
            m[d] += r[s] // deg[s]
        r = {v: base + (damping_pct * m[v]) // 100 for v in nodes}
    return r


def test_pagerank_hand_graph(spark):
    # the classic 4-node example: d is dangling (mass drops)
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=8).collect()}
    assert got == ref_pagerank(edges, iters=8)
    # c receives from two sources: outranks the dangling leaf d
    assert got["c"] > got["d"]
    # total mass bounded by scale (dangling + floor loss only shrink it)
    assert 0 < sum(got.values()) <= SCALE


@pytest.mark.parametrize("seed", range(3))
def test_pagerank_random_graphs(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(30)]
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randint(20, 90))
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, ["src", "dst"])
    iters = rng.choice([1, 3, 9])
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=iters).collect()}
    assert got == ref_pagerank(edges, iters=iters), f"seed {seed}"


def test_pagerank_partitioning_invariance(spark):
    edges = [(f"a{i}", f"a{(i * 7 + 1) % 20}") for i in range(20)] + [
        (f"a{i}", "hub") for i in range(20)
    ]
    df1 = spark.createDataFrame(edges, ["src", "dst"])
    df2 = df1.repartition(17)
    a = sorted(map(tuple, pagerank(df1, iters=5).collect()))
    b = sorted(map(tuple, pagerank(df2, iters=5).collect()))
    assert a == b
    hub = dict(a)["hub"]
    assert hub == max(dict(a).values())  # everyone points at the hub


def test_degree_stats(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in degree_stats(df).collect()
    }
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


def test_rdf_edges_and_rank(spark):
    """nation -> region FK edges from the real quad mapping; every
    nation points at its region, so regions out-rank nations."""
    from fourstore_spark.sources.relational import quads_from_sf_dir

    quads = quads_from_sf_dir(spark, "/root/testdata/sf0.001")
    e = rdf_edges(quads, "urn:col:nation#n_regionkey")
    assert e.count() == 25
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iters=4).collect()}
    regions = {k: v for k, v in ranks.items() if k.startswith("urn:region")}
    nations = {k: v for k, v in ranks.items() if k.startswith("urn:nation")}
    assert len(regions) == 5 and len(nations) == 25
    assert min(regions.values()) > max(nations.values())
