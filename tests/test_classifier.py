"""Hashed n-gram linear quality classifier (operators/classifier.py).

The training recurrence is transcendental-free and integer-quantized by
design, so a pure-Python/numpy replica must agree EXACTLY with the
distributed run, iteration for iteration — the bpe_train test
discipline. Scoring is pinned against the same replica and against the
saved-artifact round trip, and must be partitioning-invariant.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _round_half(x: float) -> int:
    # Spark F.round(x, 0): HALF_UP = away from zero (python round() is
    # banker's and would disagree on exact .5 boundaries)
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _bucket(gram: str, n_features: int) -> int:
    return (
        int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % 1_000_000
    ) % n_features


def _feats(text: str, n_features: int) -> tuple[dict[int, int], int]:
    toks = text.strip().lower().split()
    grams = toks + [
        f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
    ]
    counts: dict[int, int] = {}
    for g in grams:
        b = _bucket(g, n_features)
        counts[b] = counts.get(b, 0) + 1
    return counts, len(grams)


def _train_replica(pos, neg, iters, lr, n_features):
    docs = [(f"p:{i}", t, 1) for i, t in pos] + [
        (f"n:{i}", t, 0) for i, t in neg
    ]
    feats = [
        (_feats(t, n_features), y)
        for _, t, y in docs
        if t.strip()
    ]
    n_docs = len(feats)
    w: dict[int, int] = {}
    bias = 0
    for _ in range(iters):
        grad: dict[int, int] = {}
        gbias = 0
        for (counts, n), y in feats:
            s = bias + sum(c * w.get(b, 0) for b, c in counts.items())
            z = s / (1_000_000.0 * n)
            p = min(max(0.5 + z / 4.0, 0.0), 1.0)
            r = _round_half((p - y) * 1_000_000.0)
            gbias += r
            for b, c in counts.items():
                grad[b] = grad.get(b, 0) + _round_half(r * c / n)
        for b, g in grad.items():
            step = round(lr * g / n_docs)
            if step:
                w[b] = w.get(b, 0) - step
        bias -= round(lr * gbias / n_docs)
    return {b: v for b, v in w.items() if v != 0}, bias


def _score_replica(text, w, bias, n_features):
    counts, n = _feats(text, n_features)
    s = bias + sum(c * w.get(b, 0) for b, c in counts.items())
    return _round_half(1_000_000.0 * (s / (1_000_000.0 * n)))


POS = [
    (i, t)
    for i, t in enumerate(
        [
            "the quick brown fox jumps over the lazy dog",
            "a well written article about science and method",
            "careful analysis shows the method works in practice",
            "the experiment was repeated with consistent results",
            "clear writing and sound structure improve the article",
            "the study reports results with appropriate caveats",
        ]
    )
]
NEG = [
    (i, t)
    for i, t in enumerate(
        [
            "click here buy now cheap cheap cheap",
            "win win win free free prize prize",
            "zzz spam spam keyword keyword keyword stuffing",
            "buy cheap now click click free prize",
            "free free free win now now now",
            "keyword spam cheap prize click zzz",
        ]
    )
]


def test_train_matches_numpy_replica_exactly(spark):
    from fourstore_spark.operators.classifier import (
        train_quality_classifier,
    )

    pos = spark.createDataFrame(POS, ["doc_id", "text"])
    neg = spark.createDataFrame(NEG, ["doc_id", "text"])
    wdf, bias = train_quality_classifier(
        pos, neg, iters=4, lr=4.0, n_features=512
    )
    got = {r["b"]: r["w_micro"] for r in wdf.collect()}
    want_w, want_b = _train_replica(POS, NEG, 4, 4.0, 512)
    assert got == want_w
    assert bias == want_b


def test_scores_match_replica_and_separate_classes(spark):
    from fourstore_spark.operators.classifier import (
        classifier_logits,
        train_quality_classifier,
    )

    pos = spark.createDataFrame(POS, ["doc_id", "text"])
    neg = spark.createDataFrame(NEG, ["doc_id", "text"])
    wdf, bias = train_quality_classifier(
        pos, neg, iters=10, lr=4.0, n_features=512
    )
    w, b = _train_replica(POS, NEG, 10, 4.0, 512)

    # held-out docs recombining seen vocabulary
    test_docs = [
        (100, "the article shows consistent results in practice", True),
        (101, "cheap prize click free spam now", False),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in test_docs], ["doc_id", "text"]
    ).repartition(7)  # partitioning must not change a single micro-unit
    got = {
        r["doc_id"]: (r["logit_micro"], r["quality"])
        for r in classifier_logits(
            df, wdf, bias_micro=bias, n_features=512
        ).collect()
    }
    for i, t, want_quality in test_docs:
        want_logit = _score_replica(t, w, b, 512)
        assert got[i] == (want_logit, want_logit >= 0)
        assert got[i][1] is want_quality


def test_artifact_roundtrip_and_guard(spark, tmp_path):
    from fourstore_spark.operators.classifier import (
        classifier_logits,
        classifier_score_artifact,
        save_classifier,
        train_quality_classifier,
    )

    pos = spark.createDataFrame(POS, ["doc_id", "text"])
    neg = spark.createDataFrame(NEG, ["doc_id", "text"])
    wdf, bias = train_quality_classifier(
        pos, neg, iters=3, lr=4.0, n_features=256
    )
    path = str(tmp_path / "clf")
    save_classifier(wdf, bias, path, n_features=256)
    docs = pos.unionByName(
        neg.withColumn("doc_id", F.col("doc_id") + 100)
    )
    direct = sorted(
        map(tuple, classifier_logits(
            docs, wdf, bias_micro=bias, n_features=256
        ).collect())
    )
    via_artifact = sorted(
        map(tuple, classifier_score_artifact(spark, docs, path).collect())
    )
    assert direct == via_artifact

    with pytest.raises(ValueError, match="n_features"):
        train_quality_classifier(pos, neg, n_features=1 << 23)


def test_stream_quality_filter_matches_batch(spark, tmp_path):
    """stream_quality_filter (pretrained weights, stateless Arrow
    projection) equals batch classifier_logits doc-for-doc, through a
    real streaming micro-batch run and under the threshold filter."""
    from fourstore_spark.operators.classifier import (
        classifier_logits,
        train_quality_classifier,
    )
    from fourstore_spark.streaming import stream_quality_filter

    pos = spark.createDataFrame(POS, ["doc_id", "text"])
    neg = spark.createDataFrame(NEG, ["doc_id", "text"])
    wdf, bias = train_quality_classifier(
        pos, neg, iters=6, lr=4.0, n_features=512
    )
    score_docs = (
        [(i + 50, t) for i, t in POS]
        + [(i + 70, t) for i, t in NEG]
        + [(998, "   "), (999, "single")]
    )
    sdf = spark.createDataFrame(score_docs, "doc_id long, text string")
    batch = {
        tuple(r)
        for r in classifier_logits(
            sdf, wdf, bias_micro=bias, n_features=512
        ).select("doc_id", "n_grams", "logit_micro").collect()
    }

    src = tmp_path / "qstream"
    for ci in range(3):
        chunk = [p for p in score_docs if p[0] % 3 == ci]
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"b{ci}"))
    stream = spark.readStream.schema("doc_id long, text string").option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    out = stream_quality_filter(
        stream, wdf, bias_micro=bias, n_features=512
    )
    q = (
        out.writeStream.format("memory").queryName("qf")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM qf").collect()}
    assert got == batch

    # threshold filter on the batch frame == logit-space cut
    kept = {
        r["doc_id"]
        for r in stream_quality_filter(
            sdf, wdf, bias_micro=bias, n_features=512, threshold_micro=0
        ).collect()
    }
    assert kept == {d for d, _, lm in batch if lm >= 0}

    # oversized-weight-table guard
    big = spark.range(3).select(
        F.col("id").alias("b"), F.lit(1).alias("w_micro")
    )
    with pytest.raises(ValueError, match="weight table"):
        stream_quality_filter(sdf, big, max_weight_rows=2)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_train_and_score_match_replica(spark, seed):
    """Random corpora (including empty/1-token/duplicate-gram docs and
    non-ASCII words): train + score must equal the replica exactly for
    every seed — the recurrence has no float-accumulation freedom."""
    import random

    from fourstore_spark.operators.classifier import (
        classifier_logits,
        train_quality_classifier,
    )

    rng = random.Random(seed)
    words = ["alpha", "beta", "γάμμα", "δέλτα", "x", "longerword",
             "naïve", "word-with-dash", "12", "..."]

    def corpus(n, base):
        return [
            (base + i,
             " ".join(rng.choice(words) for _ in range(rng.randint(0, 9))))
            for i in range(n)
        ]

    pos, neg = corpus(12, 0), corpus(12, 0)
    pdf = spark.createDataFrame(pos, ["doc_id", "text"])
    ndf = spark.createDataFrame(neg, ["doc_id", "text"])
    wdf, bias = train_quality_classifier(
        pdf, ndf, iters=3, lr=4.0, n_features=128
    )
    want_w, want_b = _train_replica(pos, neg, 3, 4.0, 128)
    got = {r["b"]: r["w_micro"] for r in wdf.collect()}
    assert got == want_w and bias == want_b

    score = corpus(15, 100)
    sdf = spark.createDataFrame(score, ["doc_id", "text"]).repartition(5)
    out = {
        r["doc_id"]: r["logit_micro"]
        for r in classifier_logits(
            sdf, wdf, bias_micro=bias, n_features=128
        ).collect()
    }
    for i, t in score:
        if not t.strip():
            assert i not in out
        else:
            assert out[i] == _score_replica(t, want_w, want_b, 128)


def test_blank_documents_drop_like_lm_score(spark):
    from fourstore_spark.operators.classifier import classifier_logits

    df = spark.createDataFrame(
        [(1, "real words here"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    w = spark.createDataFrame([(0, 0)], "b long, w_micro long")
    got = classifier_logits(df, w, n_features=64).collect()
    assert [r["doc_id"] for r in got] == [1]


# ---------------------------------------------------------- langid OvR
def test_train_langid_equals_per_label_binary_trains(spark):
    """One-vs-rest is EXACTLY K binary trains: each label's weight
    slice and bias must equal a direct train_quality_classifier run on
    (label, rest) — the determinism contract composes."""
    from fourstore_spark.operators.classifier import (
        train_langid,
        train_quality_classifier,
    )

    rows = [
        (i, "en the table of spark merge " * 3 + f"x{i}", "en")
        for i in range(8)
    ] + [
        (100 + i, "fr le table du spark fusion " * 3 + f"y{i}", "fr")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w, b = train_langid(df, iters=3, n_features=256)
    biases = {r["lang"]: r["bias_micro"] for r in b.collect()}
    assert set(biases) == {"en", "fr"}
    for lab in ("en", "fr"):
        dw, dbias = train_quality_classifier(
            df.where(F.col("lang") == lab),
            df.where(F.col("lang") != lab),
            iters=3, n_features=256,
        )
        direct = {(r["b"], r["w_micro"]) for r in dw.collect()}
        got = {
            (r["b"], r["w_micro"])
            for r in w.where(F.col("lang") == lab).select(
                "b", "w_micro"
            ).collect()
        }
        assert got == direct and biases[lab] == dbias


def test_langid_scores_equal_binary_logits_and_predict_ties(spark):
    """Per-label score slices must equal classifier_logits with that
    label's weights/bias (same integer algebra), every (doc, label)
    pair must be present even when no weight bucket hits (bias-only
    row), and the argmax tie-break is the smallest label."""
    from fourstore_spark.operators.classifier import (
        classifier_logits,
        langid_predict,
        langid_scores,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    # lang 'aa' weights live on buckets no document hashes into
    # (n_features buckets exist; pick two unused ones deterministically
    # by probing the real feature table)
    from fourstore_spark.operators.classifier import doc_features

    used = {
        r["b"] for r in doc_features(df, n_features=64).collect()
    }
    free = sorted(set(range(64)) - used)[:2]
    weights = spark.createDataFrame(
        [("aa", free[0], 500_000), ("aa", free[1], -250_000)]
        + [("bb", b, 100_000) for b in sorted(used)],
        "lang string, b long, w_micro long",
    )
    biases = spark.createDataFrame(
        [("aa", 0), ("bb", 0)], "lang string, bias_micro long"
    )
    sc = langid_scores(df, weights, biases, n_features=64)
    rows = {(r["doc_id"], r["lang"]): r for r in sc.collect()}
    assert set(rows) == {(1, "aa"), (1, "bb"), (2, "aa"), (2, "bb")}
    # 'aa' hits nothing -> bias-only 0; 'bb' weights every used bucket
    # at 100_000, so the mean-pooled logit is exactly 100_000
    for (did, lang), r in rows.items():
        assert r["logit_micro"] == (0 if lang == "aa" else 100_000)
    for lang in ("aa", "bb"):
        direct = {
            r["doc_id"]: r["logit_micro"]
            for r in classifier_logits(
                df,
                weights.where(F.col("lang") == lang).select("b", "w_micro"),
                bias_micro=0, n_features=64,
            ).collect()
        }
        for did in (1, 2):
            assert rows[(did, lang)]["logit_micro"] == direct[did]

    # equal-logit tie (both labels 0 on a bias-only doc set) -> 'aa'
    tie_w = spark.createDataFrame(
        [("aa", free[0], 1), ("bb", free[0], 1)],
        "lang string, b long, w_micro long",
    )
    pred = langid_predict(df, tie_w, biases, n_features=64)
    assert all(r["lang"] == "aa" for r in pred.collect())


def test_train_langid_max_labels_guard(spark):
    import pytest

    from fourstore_spark.operators.classifier import train_langid

    df = spark.createDataFrame(
        [(i, f"text {i}", f"l{i}") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="distinct labels"):
        train_langid(df, max_labels=3)


def test_stream_langid_filter_matches_predict_and_artifacts(
    spark, tmp_path
):
    """stream_langid_filter (pretrained OvR stack, stateless Arrow
    projection) equals batch langid_predict doc-for-doc through a real
    availableNow run, keep_langs filters on the prediction, and
    save_langid/load_langid round-trips the stack with n_features
    pinned."""
    from fourstore_spark.operators.classifier import (
        langid_predict,
        load_langid,
        save_langid,
        train_langid,
    )
    from fourstore_spark.streaming import stream_langid_filter

    rows = (
        [(i, "the table of spark merge join " * 2 + f"x{i}", "en")
         for i in range(6)]
        + [(50 + i, "le table du spark fusion et " * 2 + f"y{i}", "fr")
           for i in range(6)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w, b = train_langid(df, iters=4, n_features=512)

    score_docs = [(i, t) for i, t, _ in rows] + [
        (998, "   "), (999, "mixed le table"),
    ]
    sdf = spark.createDataFrame(score_docs, "doc_id long, text string")
    batch = {
        tuple(r)
        for r in langid_predict(sdf, w, b, n_features=512).collect()
    }

    src = tmp_path / "lstream"
    for ci in range(2):
        spark.createDataFrame(
            [p for p in score_docs if p[0] % 2 == ci],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(str(src / f"b{ci}"))
    stream = spark.readStream.schema("doc_id long, text string").option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    out = stream_langid_filter(stream, w, b, n_features=512)
    q = (
        out.writeStream.format("memory").queryName("lf")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM lf").collect()}
    assert got == batch

    # keep_langs filters on the PREDICTED label
    kept = {
        r["doc_id"]
        for r in stream_langid_filter(
            sdf, w, b, n_features=512, keep_langs=["en"]
        ).collect()
    }
    assert kept == {d for d, lang, _ in batch if lang == "en"}

    # artifact round-trip pins n_features and replays identically
    path = str(tmp_path / "langid_model")
    save_langid(w, b, path, n_features=512)
    w2, b2, nf = load_langid(spark, path)
    assert nf == 512
    again = {
        tuple(r)
        for r in langid_predict(sdf, w2, b2, n_features=nf).collect()
    }
    assert again == batch
