"""Differential fuzz: lm_score / bm25_score vs pure-Python replicas on
random corpora, plus partitioning-invariance of the integer surfaces."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from fourstore_spark.operators.lm import bm25_score, lm_score

WORDS = ["ab", "ba", "cc", "d", "ee", "f", "gg", "h", "aa", "b"]


def _corpus(seed: int, n_docs: int = 40) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        n = rng.randint(0, 12)
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(n))))
    return docs


def _ref_lm(docs: list[tuple[int, str]], k: float = 0.5) -> dict:
    toks = {i: t.lower().split() for i, t in docs if t.split()}
    uni: Counter = Counter(w for t in toks.values() for w in t)
    big: Counter = Counter(
        (t[i], t[i + 1]) for t in toks.values() for i in range(len(t) - 1)
    )
    v = len(uni)
    out = {}
    for d, t in toks.items():
        if len(t) < 2:
            continue
        s = 0
        for i in range(len(t) - 1):
            c12 = big[(t[i], t[i + 1])]
            c1 = uni[t[i]]
            s += round(math.log((c12 + k) / (c1 + k * v)) * 1e6)
        out[d] = (len(t) - 1, s)
    return out


def _ref_bm25(docs, terms, k1=1.2, b=0.75) -> dict:
    toks = {i: t.lower().split() for i, t in docs if t.split()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: Counter = Counter()
    for t in toks.values():
        for term in set(t) & set(terms):
            df[term] += 1
    out = {}
    for d, t in toks.items():
        tf = Counter(w for w in t if w in terms)
        if not tf:
            continue
        s = 0
        for term, f in tf.items():
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            c = idf * (f * (k1 + 1)) / (
                f + k1 * (1 - b + b * len(t) / avgdl)
            )
            s += round(c * 1e6)
        out[d] = (len(tf), s)
    return out


@pytest.mark.parametrize("seed", range(6))
def test_lm_score_matches_reference(spark, seed):
    docs = _corpus(seed)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in lm_score(df).collect()
    }
    assert got == _ref_lm(docs), f"seed {seed}"


@pytest.mark.parametrize("seed", range(6))
def test_bm25_matches_reference(spark, seed):
    docs = _corpus(seed + 100)
    terms = ["ab", "cc", "ee"]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_hits"], r["score_micro"])
        for r in bm25_score(df, terms).collect()
    }
    assert got == _ref_bm25(docs, terms), f"seed {seed}"


def test_partitioning_invariance(spark):
    """Integer surfaces are exact: any repartitioning gives identical
    totals (the point of quantize-before-sum)."""
    docs = _corpus(7, n_docs=80)
    df1 = spark.createDataFrame(docs, ["doc_id", "text"])
    df2 = df1.repartition(13)
    a = sorted(
        (r["doc_id"], r["logprob_micro"]) for r in lm_score(df1).collect()
    )
    b = sorted(
        (r["doc_id"], r["logprob_micro"]) for r in lm_score(df2).collect()
    )
    assert a == b
