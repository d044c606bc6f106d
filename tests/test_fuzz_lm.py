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


def _ref_backoff(score_docs, train_docs, a=0.4):
    toks = {d: t.lower().split() for d, t in score_docs if t.split()}
    ttoks = [t.lower().split() for _, t in train_docs if t.split()]
    uni = Counter(w for t in ttoks for w in t)
    n = sum(uni.values())
    big = Counter((t[i], t[i + 1]) for t in ttoks for i in range(len(t) - 1))
    tri = Counter(
        (t[i], t[i + 1], t[i + 2]) for t in ttoks for i in range(len(t) - 2)
    )
    out = {}
    for d, t in toks.items():
        if len(t) < 3:
            continue
        s = 0
        for i in range(len(t) - 2):
            w1, w2, w3 = t[i], t[i + 1], t[i + 2]
            if tri[(w1, w2, w3)]:
                ls = math.log(tri[(w1, w2, w3)] / big[(w1, w2)])
            elif big[(w2, w3)]:
                ls = math.log(a) + math.log(big[(w2, w3)] / uni[w2])
            else:
                ls = 2 * math.log(a) + math.log((uni[w3] or 0.5) / n)
            s += round(ls * 1e6)
        out[d] = (len(t) - 2, s)
    return out


@pytest.mark.parametrize("seed", range(4))
def test_stupid_backoff_matches_reference(spark, seed):
    """Held-out split: every backoff tier (trigram hit, bigram backoff,
    unigram floor, unseen-word floor) exercised and exact."""
    from fourstore_spark.operators.lm import stupid_backoff_score

    docs = _corpus(seed + 50, n_docs=50)
    # held-out docs get an extra unseen token sometimes
    docs = [
        (d, t + " zz" if d % 7 == 0 and t else t) for d, t in docs
    ]
    train = [(d, t) for d, t in docs if d % 3 != 0]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_trigrams"], r["logscore_micro"])
        for r in stupid_backoff_score(df, tdf).collect()
    }
    assert got == _ref_backoff(docs, train), f"seed {seed}"


@pytest.mark.parametrize("seed", [0, 1])
def test_stream_lm_filter_matches_batch(spark, tmp_path_factory, seed):
    """stream_lm_filter (pretrained pruned LM, stateless projection)
    equals batch lm_score against the same LM, batch-split-invariant."""
    from fourstore_spark.operators.lm import (
        bigram_counts,
        lm_score,
        unigram_counts,
    )
    from fourstore_spark.streaming import stream_lm_filter

    train = _corpus(seed, n_docs=40)
    score_docs = _corpus(seed + 500, n_docs=30)
    # some unseen words so the unseen-w1 skip path runs
    score_docs = [
        (d, (t + " unseen") if d % 5 == 0 and t else t)
        for d, t in score_docs
    ]
    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    sdf = spark.createDataFrame(score_docs, ["doc_id", "text"])
    uni, big = unigram_counts(tdf), bigram_counts(tdf)
    v = uni.count()

    batch = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in lm_score(sdf, uni, big, vocab_size=v).collect()
    }

    src = tmp_path_factory.mktemp(f"lmstream_{seed}")
    for ci in range(3):
        chunk = [p for p in score_docs if p[0] % 3 == ci]
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"b{ci}"))
    stream = spark.readStream.schema("doc_id long, text string").option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    out = stream_lm_filter(stream, uni, big, vocab_size=v)
    name = f"lmf_{seed}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert got == batch

    # ceiling filter: stream subset == batch rows within the ceiling
    ceiling = 11_000_000
    kept = {
        r["doc_id"]
        for r in stream_lm_filter(
            sdf, uni, big, vocab_size=v, max_avg_nll_micro=ceiling
        ).collect()
    }
    want = {
        d for d, (n, s) in batch.items() if -s / n <= ceiling
    }
    assert kept == want


# --- adversarial whitespace (ADVICE r9): tabs/newlines/NBSP/Unicode
# separators tokenize differently under Python str.split() (any Unicode
# whitespace, empties dropped) than under Spark's
# split(trim(lower(text)), '\s+') (Java \s is ASCII-only, trim strips
# only spaces). stream_lm_filter now pre-tokenizes with the SAME Spark
# lm_tokens expression, so stream == batch must hold on nasty input too.

_NASTY = [
    "\tab ba cc",          # leading tab -> Java-split leading "" token
    "cc d ee",        # NBSP: one Spark token "cc d", two in Python
    "  ee\nf  ",           # newline separator + trimmable spaces
    "gg h aa",        # U+2028 line separator: non-\s in Java
    "aa\tb\t",             # trailing tab (Java split drops trailing "")
    "ab\r\nba cc d",       # CRLF run
    " ",              # NBSP-only doc: one 1-token doc, no bigrams
    "ab  ba   cc",         # multi-space runs
]


def test_stream_lm_filter_nasty_whitespace_equals_batch(spark):
    from fourstore_spark.operators.lm import (
        bigram_counts,
        lm_score,
        unigram_counts,
    )
    from fourstore_spark.streaming import stream_lm_filter

    docs = [(i, t) for i, t in enumerate(_NASTY * 3)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    uni, big = unigram_counts(df), bigram_counts(df)
    v = uni.count()
    batch = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in lm_score(df, uni, big, vocab_size=v).collect()
    }
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in stream_lm_filter(df, uni, big, vocab_size=v).collect()
    }
    assert got == batch


def test_stream_lm_filter_rejects_oversized_lm(spark):
    """The max_lm_rows guard (VERDICT r9 #5): an unpruned web-scale
    count table must raise, pointing at prune_top, before any
    collect()."""
    from fourstore_spark.operators.lm import bigram_counts, unigram_counts
    from fourstore_spark.streaming import stream_lm_filter

    docs = [(i, f"w{i} w{i+1} w{i+2}") for i in range(50)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    uni, big = unigram_counts(df), bigram_counts(df)
    with pytest.raises(ValueError, match="prune_top"):
        stream_lm_filter(df, uni, big, max_lm_rows=10)


def test_ccnet_partition_exact_guard(spark):
    """ccnet_partition(exact=True) must refuse to buffer more than
    max_exact_rows in one percentile buffer; exact=False (approx) must
    still bucket every row into the three-way split."""
    from fourstore_spark.operators.lm import ccnet_partition, lm_score

    docs = _corpus(3, n_docs=60)
    scored = lm_score(spark.createDataFrame(docs, ["doc_id", "text"]))
    with pytest.raises(ValueError, match="approx_percentile"):
        ccnet_partition(scored, max_exact_rows=5)
    out = ccnet_partition(scored, exact=False).collect()
    assert len(out) == scored.count()
    assert {r["bucket"] for r in out} <= {"head", "middle", "tail"}


def test_bm25_index_query_equals_inmemory(spark, tmp_path_factory):
    """bm25_query over the written postings index == bm25_score over
    the corpus it was built from, and the postings scan partition-
    prunes to exactly the query terms' md5 buckets (the IVF-index
    discipline, applied to text retrieval)."""
    import re

    from pyspark.sql import functions as F

    from fourstore_spark.operators.lm import (
        bm25_query,
        bm25_score,
        write_bm25_index,
    )
    from fourstore_spark.operators.sampling import hash_bucket

    docs = _corpus(21, n_docs=60)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    path = str(tmp_path_factory.mktemp("bm25idx") / "idx")
    write_bm25_index(df, path, n_buckets=16)

    terms = ["ab", "cc", "ee"]
    want = sorted(
        (r["doc_id"], r["n_hits"], r["score_micro"])
        for r in bm25_score(df, terms).collect()
    )
    out = bm25_query(spark, path, terms)
    got = sorted(
        (r["doc_id"], r["n_hits"], r["score_micro"])
        for r in out.collect()
    )
    assert got == want

    # driver-side hashlib bucket replay == hash_bucket expression
    expected_buckets = sorted(
        r["b"]
        for r in spark.createDataFrame(
            [(t,) for t in terms], ["term"]
        ).select((hash_bucket(F.col("term")) % 16).alias("b"))
        .distinct()
        .collect()
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no PartitionFilters in bm25_query plan:\n{plan[:2000]}"
    got_b = sorted(
        int(x) for x in re.findall(r"\d+", m.group(1).split("IN")[-1])
    )
    assert got_b == expected_buckets, (got_b, expected_buckets)


def test_bm25_index_append_equals_rebuild(spark, tmp_path_factory):
    """Incremental maintenance: build on half the corpus + append the
    other half == rebuild from scratch, query-for-query. Postings are
    never rewritten (per-doc facts), df sums partials, the sidecar's
    exact integer sum_dl reproduces the full-corpus avgdl division."""
    from fourstore_spark.operators.lm import (
        append_bm25_index,
        bm25_query,
        write_bm25_index,
    )

    docs = _corpus(31, n_docs=80)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    first = df.where("doc_id % 2 = 0")
    second = df.where("doc_id % 2 = 1")

    base = tmp_path_factory.mktemp("bm25app")
    full_p, inc_p = str(base / "full"), str(base / "inc")
    write_bm25_index(df, full_p, n_buckets=16)
    write_bm25_index(first, inc_p, n_buckets=16)
    append_bm25_index(second, inc_p)

    terms = ["ab", "cc", "ee", "gg"]
    want = sorted(
        map(tuple, bm25_query(spark, full_p, terms).collect())
    )
    got = sorted(
        map(tuple, bm25_query(spark, inc_p, terms).collect())
    )
    assert got == want
    import json

    s_full = json.load(open(f"{full_p}/_bm25_stats.json"))
    s_inc = json.load(open(f"{inc_p}/_bm25_stats.json"))
    assert (s_inc["n_docs"], s_inc["sum_dl"], s_inc["avgdl"]) == (
        s_full["n_docs"], s_full["sum_dl"], s_full["avgdl"]
    )


def test_bm25_index_compaction_preserves_results(spark, tmp_path_factory):
    """compact_bm25_index: after three appends the df dir holds
    partials and postings many small files; compaction collapses both
    and queries return identical results with fewer df rows."""
    import glob

    from fourstore_spark.operators.lm import (
        append_bm25_index,
        bm25_query,
        compact_bm25_index,
        write_bm25_index,
    )

    docs = _corpus(41, n_docs=90)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    path = str(tmp_path_factory.mktemp("bm25cmp") / "idx")
    write_bm25_index(df.where("doc_id % 3 = 0"), path, n_buckets=8)
    append_bm25_index(df.where("doc_id % 3 = 1"), path)
    append_bm25_index(df.where("doc_id % 3 = 2"), path)

    terms = ["ab", "cc", "ee"]
    before = sorted(map(tuple, bm25_query(spark, path, terms).collect()))
    df_rows_before = spark.read.parquet(f"{path}/df").count()
    files_before = len(glob.glob(f"{path}/postings/*/*.parquet"))

    compact_bm25_index(spark, path)

    after = sorted(map(tuple, bm25_query(spark, path, terms).collect()))
    assert after == before
    df_rows_after = spark.read.parquet(f"{path}/df").count()
    files_after = len(glob.glob(f"{path}/postings/*/*.parquet"))
    assert df_rows_after < df_rows_before
    assert files_after <= files_before
    # df is now one row per (term, bucket)
    dup = (
        spark.read.parquet(f"{path}/df")
        .groupBy("term").count().where("count > 1").count()
    )
    assert dup == 0


def test_lm_artifact_roundtrip(spark, tmp_path_factory):
    """save_lm/load_lm: scoring against the loaded artifact equals
    self-train scoring exactly, including through stream_lm_filter,
    and the sidecar's training-time V survives pruning."""
    from fourstore_spark.operators.lm import (
        bigram_counts,
        lm_score,
        load_lm,
        save_lm,
        unigram_counts,
    )
    from fourstore_spark.streaming import stream_lm_filter

    docs = _corpus(61, n_docs=50)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    uni, big = unigram_counts(df), bigram_counts(df)
    path = str(tmp_path_factory.mktemp("lmart") / "lm")
    save_lm(uni, big, path)

    luni, lbig, meta = load_lm(spark, path)
    assert meta["k"] == 0.5 and meta["vocab_size"] == uni.count()
    want = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in lm_score(df).collect()
    }
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in lm_score(
            df, luni, lbig, vocab_size=meta["vocab_size"], k=meta["k"]
        ).collect()
    }
    assert got == want
    streamed = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in stream_lm_filter(
            df, luni, lbig, vocab_size=meta["vocab_size"], k=meta["k"]
        ).collect()
    }
    assert streamed == want


def test_lm_score_fused_self_train_equals_two_join_form(spark):
    """The fused self-train plan (one corpus-side join against a
    pre-joined score table) must equal the general two-join form fed
    the same counts — including on nasty-whitespace text."""
    from fourstore_spark.operators.lm import (
        bigram_counts,
        lm_score,
        unigram_counts,
    )

    docs = _corpus(71, n_docs=60) + [
        (1000 + i, t) for i, t in enumerate(_NASTY)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    uni, big = unigram_counts(df), bigram_counts(df)
    v = uni.count()
    fused = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in lm_score(df).collect()
    }
    general = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"])
        for r in lm_score(df, uni, big, vocab_size=v).collect()
    }
    assert fused == general
