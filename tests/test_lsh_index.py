"""Written MinHash-LSH index (operators/dedup.py write/append/query/
compact_lsh_index): the incremental-dedup deployment shape — sign the
corpus once, then dedup each new batch against it by signing only the
batch and partition-pruning into the indexed buckets.

Contracts pinned here:
- query == one-shot LSH over corpus+batch restricted to cross pairs
  (same parameters => same buckets, by construction via _banded_rows);
- append == rebuild, compaction preserves results and shrinks files;
- the probe scan partition-prunes to exactly the query buckets' dirs;
- the hot-bucket cap bounds corpus-side quadratic blowup.
"""

from __future__ import annotations

import glob
import random
import re

import pytest
from pyspark.sql import functions as F


def _corpus(seed: int, n: int, n_dups: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    vocab = [f"w{i:03d}" for i in range(60)]
    docs = []
    for i in range(n):
        docs.append(
            (i, " ".join(vocab[rng.randrange(60)] for _ in range(30)))
        )
    for k in range(n_dups):  # near-dups: one word changed
        _, text = docs[rng.randrange(n)]
        words = text.split()
        words[rng.randrange(len(words))] = vocab[rng.randrange(60)]
        docs.append((n + k, " ".join(words)))
    return docs


def test_lsh_index_query_equals_oneshot_cross_pairs(spark, tmp_path):
    from fourstore_spark.operators.dedup import (
        lsh_query_index,
        minhash_lsh_candidates,
        write_lsh_index,
    )

    df = spark.createDataFrame(_corpus(7, 40, 15), ["doc_id", "text"])
    corpus = df.where("doc_id % 2 = 0")
    batch = df.where("doc_id % 2 = 1")
    path = str(tmp_path / "lsh")
    write_lsh_index(corpus, path, n_dirs=64)

    got = sorted(
        map(
            tuple,
            lsh_query_index(
                spark, path, batch, max_bucket=None
            ).collect(),
        )
    )
    corpus_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    oneshot = minhash_lsh_candidates(
        df, "text", "doc_id", max_bucket=None
    ).collect()
    want = sorted(
        (a, b) if a in corpus_ids else (b, a)
        for a, b in ((r["id_a"], r["id_b"]) for r in oneshot)
        if (a in corpus_ids) != (b in corpus_ids)  # cross pairs only
    )
    assert want, "fixture must produce cross candidate pairs"
    assert got == want


def test_lsh_index_append_rebuild_compact_equality(spark, tmp_path):
    from fourstore_spark.operators.dedup import (
        append_lsh_index,
        compact_lsh_index,
        lsh_query_index,
        write_lsh_index,
    )

    df = spark.createDataFrame(_corpus(11, 36, 12), ["doc_id", "text"])
    corpus = df.where("doc_id % 3 != 0")
    batch = df.where("doc_id % 3 = 0")
    full_p, inc_p = str(tmp_path / "full"), str(tmp_path / "inc")
    write_lsh_index(corpus, full_p, n_dirs=32)
    write_lsh_index(corpus.where("doc_id % 2 = 0"), inc_p, n_dirs=32)
    for r in (1,):
        append_lsh_index(corpus.where("doc_id % 2 = 1"), inc_p)

    want = sorted(map(tuple, lsh_query_index(
        spark, full_p, batch).collect()))
    assert want == sorted(map(tuple, lsh_query_index(
        spark, inc_p, batch).collect()))

    before = len(glob.glob(f"{inc_p}/bands/pdir=*/*.parquet"))
    compact_lsh_index(spark, inc_p)
    after = len(glob.glob(f"{inc_p}/bands/pdir=*/*.parquet"))
    assert after < before
    assert want == sorted(map(tuple, lsh_query_index(
        spark, inc_p, batch).collect()))


def test_lsh_index_partition_pruning_pinned(spark, tmp_path):
    """The probe scan's PartitionFilters must name exactly the dirs the
    query batch's buckets hash into — the plan-level proof that a small
    batch never reads the whole index (the bm25/IVF pin applied to
    LSH)."""
    from fourstore_spark.operators.dedup import (
        _banded_rows,
        lsh_query_index,
        write_lsh_index,
    )

    df = spark.createDataFrame(_corpus(3, 30, 10), ["doc_id", "text"])
    corpus, batch = df.where("doc_id >= 2"), df.where("doc_id < 2")
    path = str(tmp_path / "lsh")
    write_lsh_index(corpus, path, n_dirs=64)

    expected = sorted(
        r["pdir"]
        for r in _banded_rows(batch, "text", "doc_id")
        .select(F.pmod(F.col("bucket"), F.lit(64)).cast("int").alias("pdir"))
        .distinct()
        .collect()
    )
    assert 0 < len(expected) < 64  # pruning must be non-trivial

    # plan toString truncates metadata at 100 chars by default — the
    # INSET list must be read whole
    saved = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        out = lsh_query_index(spark, path, batch)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", saved)
    scans = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "lsh" in ln
    ]
    assert scans, plan[:2000]
    for ln in scans:  # every index scan in the plan must prune
        m = re.search(r"pdir#\d+ INSET ([0-9, ]+)", ln)
        assert m, ln
        got = sorted(int(x) for x in m.group(1).split(","))
        assert got == expected, (got, expected)


def test_lsh_index_hot_bucket_cap(spark, tmp_path):
    """A template cluster in the CORPUS (8 identical docs) pairs with
    every matching query doc; the cap drops those buckets, None keeps
    them."""
    from fourstore_spark.operators.dedup import (
        lsh_query_index,
        write_lsh_index,
    )

    text = " ".join(f"t{i}" for i in range(25))
    corpus = spark.createDataFrame(
        [(i, text) for i in range(8)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame([(100, text)], ["doc_id", "text"])
    path = str(tmp_path / "lsh")
    write_lsh_index(corpus, path, n_dirs=16)

    capped = lsh_query_index(spark, path, batch, max_bucket=4).collect()
    assert capped == []
    full = lsh_query_index(
        spark, path, batch, max_bucket=None
    ).collect()
    assert sorted(r["id_a"] for r in full) == list(range(8))
    assert all(r["id_b"] == 100 for r in full)


def test_lsh_index_signature_verification(spark, tmp_path):
    """r12: verify_micro filters candidates by stored-signature
    agreement. On this shingle-dense corpus every doc band-collides
    with something (raw candidates are NOT duplicates); only the
    planted near-dup survives verification, with its agreement
    estimate in hand — and no corpus text was read."""
    from fourstore_spark.operators.dedup import (
        lsh_query_index,
        write_lsh_index,
    )

    docs = _corpus(7, 40, 0)
    corpus = spark.createDataFrame(docs, ["doc_id", "text"])
    path = str(tmp_path / "lsh")
    write_lsh_index(corpus, path, n_dirs=32)

    # batch: one true near-dup of corpus doc 3 + one fresh doc
    words = docs[3][1].split()
    words[5] = "zzz999"
    batch = spark.createDataFrame(
        [(500, " ".join(words)), (501, docs[0][1] + " tail")],
        ["doc_id", "text"],
    )
    raw = lsh_query_index(spark, path, batch, max_bucket=None)
    verified = lsh_query_index(
        spark, path, batch, max_bucket=None, verify_micro=500_000
    )
    vrows = verified.collect()
    # 501 is doc 0 plus a suffix -> genuinely near-dup too; the planted
    # pair (3, 500) must be there with high agreement
    assert {"id_a", "id_b", "agree_micro"} == set(verified.columns)
    by_pair = {(r["id_a"], r["id_b"]): r["agree_micro"] for r in vrows}
    assert by_pair.get((3, 500), 0) >= 700_000
    assert by_pair.get((0, 501), 0) >= 700_000
    # verification is a strict filter of the candidate set, and the
    # corpus's random cross-collisions do not survive it
    raw_pairs = {(r["id_a"], r["id_b"]) for r in raw.collect()}
    assert set(by_pair) <= raw_pairs
    assert len(by_pair) < len(raw_pairs)
