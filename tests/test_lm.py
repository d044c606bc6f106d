"""Bigram-LM perplexity scoring (CCNet-style) and BM25 retrieval.

Hand-computed expectations on a tiny corpus, plus structural properties:
pruned-LM fallback semantics, bucket monotonicity, and the determinism
discipline (integer micro-nat payloads, no doubles in the hashed surface).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fourstore_spark.operators.lm import (
    bigram_counts,
    bm25_score,
    ccnet_partition,
    lm_score,
    unigram_counts,
)

DOCS = [
    (0, "a b a b"),        # all bigrams frequent
    (1, "a b c"),          # one rare continuation
    (2, "c c c c c"),      # self-loop bigrams
    (3, "x"),              # single token: no bigrams
    (4, "   "),            # blank: no tokens at all
    (5, "A B a b"),        # case-folds onto doc 0's bigrams
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_counts(docs):
    # doc 5 case-folds onto doc 0's tokens, so a/b count 5 each
    uni = {r["w1"]: r["c1"] for r in unigram_counts(docs).collect()}
    assert uni == {"a": 5, "b": 5, "c": 6, "x": 1}
    big = {
        (r["w1"], r["w2"]): r["c12"] for r in bigram_counts(docs).collect()
    }
    assert big[("a", "b")] == 5
    assert big[("b", "a")] == 2
    assert big[("c", "c")] == 4
    assert big[("b", "c")] == 1
    assert ("x", "x") not in big


def test_lm_score_hand_computed(docs):
    rows = {r["doc_id"]: r for r in lm_score(docs).collect()}
    # docs 3 (one token) and 4 (blank) have no bigrams -> absent
    assert set(rows) == {0, 1, 2, 5}
    v = 4  # vocab: a b c x
    k = 0.5

    def lp(c12, c1):
        return round(math.log((c12 + k) / (c1 + k * v)) * 1e6)

    # doc 0 = "a b a b": ab, ba, ab — corpus counts ab=5, ba=2, a=b=5
    expect0 = lp(5, 5) * 2 + lp(2, 5)
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["logprob_micro"] == expect0
    # doc 1 = "a b c": ab, bc
    assert rows[1]["logprob_micro"] == lp(5, 5) + lp(1, 5)
    # case folding: doc 5 scores identically to doc 0
    assert rows[5]["logprob_micro"] == expect0
    # ppl is the exp of the mean nll
    assert rows[0]["ppl"] == pytest.approx(
        math.exp(-expect0 / 1e6 / 3), rel=1e-9
    )
    # rarer continuations -> higher perplexity
    assert rows[1]["ppl"] > rows[0]["ppl"]


def test_lm_score_pruned_floor(docs):
    """prune_top keeps the most frequent bigrams; the rest score at the
    smoothed floor ln(k / (c1 + k*V)) — exactly as if c12 were 0."""
    full = {
        r["doc_id"]: r["logprob_micro"]
        for r in lm_score(docs, vocab_size=4).collect()
    }
    pruned = {
        r["doc_id"]: r["logprob_micro"]
        for r in lm_score(docs, vocab_size=4, prune_top=2).collect()
    }
    # top-2 bigrams are (a,b) c12=5 and (c,c) c12=4; doc 0's (b,a)
    # bigram is pruned and falls to the smoothed floor
    k, v = 0.5, 4
    floor_ba = round(math.log(k / (5 + k * v)) * 1e6)
    kept_ab = round(math.log((5 + k) / (5 + k * v)) * 1e6)
    assert pruned[0] == kept_ab * 2 + floor_ba
    assert pruned[2] == full[2]  # (c,c) kept: unchanged
    assert pruned[0] < full[0]  # pruning only lowers log-prob
    assert set(pruned) == set(full)


def test_ccnet_partition_buckets(docs):
    part = ccnet_partition(lm_score(docs))
    rows = sorted(
        part.collect(), key=lambda r: -r["logprob_micro"] / r["n_bigrams"]
    )
    # buckets are monotone in avg nll: head <= middle <= tail
    order = {"head": 0, "middle": 1, "tail": 2}
    labels = [order[r["bucket"]] for r in rows]
    assert labels == sorted(labels)
    assert labels[0] == 0 and labels[-1] == 2
    # thirds of 4 scored docs: 2 head (interpolated tercile), then 1/1
    assert part.where("bucket = 'head'").count() >= 1
    assert part.count() == 4


def test_bm25_hand_computed(spark):
    d = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana"), (2, "cherry cherry")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in bm25_score(d, ["apple"]).collect()}
    assert set(rows) == {0}
    n, df, tf, dl, avgdl = 3, 1, 2, 3, 2.0
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    k1, b = 1.2, 0.75
    contrib = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert rows[0]["score_micro"] == round(contrib * 1e6)
    assert rows[0]["n_hits"] == 1

    # two-term query: per-term micro contributions sum exactly
    both = {
        r["doc_id"]: r for r in bm25_score(d, ["apple", "banana"]).collect()
    }
    assert both[0]["n_hits"] == 2 and both[1]["n_hits"] == 1
    assert set(both) == {0, 1}


def test_hashed_surfaces_are_integer(docs):
    """The contract payloads carry no raw doubles (driver hash-stability
    discipline, tests/test_contract_types.py)."""
    sc = lm_score(docs).select("doc_id", "n_bigrams", "logprob_micro")
    assert all(f.dataType.typeName() == "long" for f in sc.schema.fields)
    bs = bm25_score(docs, ["a"])
    assert all(f.dataType.typeName() == "long" for f in bs.schema.fields)


def test_padded_gram_counts_match_classic_tables(docs):
    """The r12 fused count pass (one padded-gram scan feeding every
    lower-order table) must be integer-identical to the classic
    per-order passes — including the 1-token / 2-token / blank-doc
    edges where the NULL padding does the boundary accounting."""
    from fourstore_spark.operators.lm import (
        _padded_gram_counts,
        _tokenized,
        trigram_counts,
    )

    toks = _tokenized(docs, "text", "doc_id")
    c2 = _padded_gram_counts(toks, 2)
    uni = {r["w1"]: r["c1"] for r in
           c2.groupBy("w1").agg(F.sum("c").alias("c1")).collect()}
    assert uni == {r["w1"]: r["c1"] for r in unigram_counts(docs).collect()}
    big = {(r["w1"], r["w2"]): r["c"] for r in
           c2.where(F.col("w2").isNotNull()).collect()}
    assert big == {(r["w1"], r["w2"]): r["c12"]
                   for r in bigram_counts(docs).collect()}

    c3 = _padded_gram_counts(toks, 3)
    uni3 = {r["w1"]: r["c1"] for r in
            c3.groupBy("w1").agg(F.sum("c").alias("c1")).collect()}
    assert uni3 == uni
    big3 = {(r["w1"], r["w2"]): r["c12"] for r in
            c3.where(F.col("w2").isNotNull())
            .groupBy("w1", "w2").agg(F.sum("c").alias("c12")).collect()}
    assert big3 == big
    tri3 = {(r["w1"], r["w2"], r["w3"]): r["c"] for r in
            c3.where(F.col("w3").isNotNull()).collect()}
    assert tri3 == {(r["w1"], r["w2"], r["w3"]): r["c123"]
                    for r in trigram_counts(docs).collect()}


def test_no_cartesian_in_scoring_plan(docs):
    plan = lm_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_recall(spark):
    from fourstore_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], ["query_id", "vec_id"]
    )
    same = ann_recall(exact, exact).collect()
    assert all(r["recall_micro"] == 1_000_000 for r in same)
    half = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 77), (2, 78)], ["query_id", "vec_id"]
    )
    rows = {r["query_id"]: r for r in ann_recall(exact, half).collect()}
    assert rows[1]["n_hits"] == 1 and rows[1]["recall_micro"] == 500_000
    assert rows[2]["n_hits"] == 0 and rows[2]["recall_micro"] == 0


def test_int8_recall_on_real_embeddings(spark):
    """int8 quantization keeps recall@5 high on the real vectors."""
    from fourstore_spark.operators.similarity import (
        ann_recall, cosine_topk, dequantize_embeddings, quantize_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, q, k=5)
    approx = cosine_topk(
        dequantize_embeddings(quantize_embeddings(emb)), q, k=5
    )
    rows = ann_recall(exact, approx).collect()
    assert len(rows) == 5
    avg = sum(r["recall_micro"] for r in rows) / len(rows)
    assert avg >= 800_000  # int8 loses little recall
