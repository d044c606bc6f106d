"""Property-based checks for dedup_lines and top_fraction_by_score.

Both operators avoid global sorts by construction (line dedup is a
frequency aggregate + back-join; top-fraction is a bounded histogram
walk + filter + TakeOrdered tie group) — the models below answer the
same questions the slow, obvious way.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

_SETTINGS = dict(
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "10")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small alphabet -> dense cross-document collisions; "" exercises empty
# lines (split("\n") keeps them) and all-removed documents
_LINES = ["alpha", "beta", "gamma", "", "common footer", "x"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_LINES), min_size=0, max_size=5),
    min_size=1,
    max_size=6,
)


def _model_dedup_lines(rows, max_docs, keep_first):
    """Brute-force line dedup: which (doc, pos) survive?"""
    doc_lines = {i: t.split("\n") for i, t in rows}
    per_line_docs = defaultdict(set)
    for i, lines in doc_lines.items():
        for ln in lines:
            per_line_docs[ln].add(i)
    over = {ln for ln, s in per_line_docs.items() if len(s) > max_docs}
    first = {}
    for i in sorted(doc_lines):
        for p, ln in enumerate(doc_lines[i]):
            if ln in over and ln not in first:
                first[ln] = (i, p)
    out = {}
    for i, lines in doc_lines.items():
        kept, removed = [], 0
        for p, ln in enumerate(lines):
            if ln in over and not (keep_first and first[ln] == (i, p)):
                removed += 1
            else:
                kept.append(ln)
        out[i] = ("\n".join(kept), removed)
    return out


@given(
    corpus=docs_strategy,
    max_docs=st.sampled_from([1, 2]),
    keep_first=st.booleans(),
)
@settings(**_SETTINGS)
def test_dedup_lines_matches_model(spark, corpus, max_docs, keep_first):
    from fourstore_spark.operators.cleaning import dedup_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in dedup_lines(
            docs, max_docs=max_docs, keep_first=keep_first
        ).collect()
    }
    want = _model_dedup_lines(rows, max_docs, keep_first)
    assert got == want, (rows, max_docs, keep_first)


scores_strategy = st.lists(
    st.sampled_from([None, 0.0, 0.25, 0.25, 0.5, 0.9, 1.0]),
    min_size=1,
    max_size=12,
)


@given(
    scores=scores_strategy,
    frac=st.sampled_from([0.0, 0.3, 0.5, 0.77, 1.0]),
)
@settings(**_SETTINGS)
def test_top_fraction_matches_row_number_model(spark, scores, frac):
    """top_fraction_by_score == take ceil(frac*N) by (score desc NULLS
    LAST, id asc) — exercised under heavy ties, NULL scores, and the
    frac in {0, 1} edges."""
    from fourstore_spark.operators.sampling import top_fraction_by_score

    rows = [(i, s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = sorted(
        r["doc_id"]
        for r in top_fraction_by_score(
            df, frac, "score", "doc_id"
        ).collect()
    )
    ranked = sorted(
        rows,
        key=lambda r: ((0, -r[1]) if r[1] is not None else (1, 0.0), r[0]),
    )
    want = sorted(i for i, _ in ranked[: math.ceil(frac * len(rows))])
    assert got == want, (rows, frac, got, want)


def test_cap_per_group_deterministic_and_nested(spark):
    import hashlib

    from fourstore_spark.operators.sampling import cap_per_group

    rows = [(i, f"src{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    cap10 = {
        (r["doc_id"], r["source"])
        for r in cap_per_group(df, "source", 10).collect()
    }
    # replay: smallest (md5(str(id)), id) per group
    by_group: dict = {}
    for i, s in rows:
        by_group.setdefault(s, []).append(i)
    want = set()
    for s, ids in by_group.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want.update((i, s) for i in ids[:10])
    assert cap10 == want
    # nested: raising the cap only adds rows
    cap20 = {
        (r["doc_id"], r["source"])
        for r in cap_per_group(df, "source", 20).collect()
    }
    assert cap10 <= cap20
    # partitioning-invariant
    cap10b = {
        (r["doc_id"], r["source"])
        for r in cap_per_group(df.repartition(13), "source", 10).collect()
    }
    assert cap10b == cap10


def test_normalize_unicode(spark):
    from fourstore_spark.operators.scrubbing import normalize_unicode

    df = spark.createDataFrame(
        [(1, "café"), (2, "plain ascii"), (3, None), (4, "é")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["text"], r["changed"])
           for r in normalize_unicode(df).collect()}
    assert out[1] == ("café", True)   # combining -> precomposed
    assert out[2] == ("plain ascii", False)
    assert out[3] == (None, False)
    assert out[4] == ("é", False)     # already NFC


def test_dsir_weights_matches_reference(spark):
    """Differential fuzz for dsir_weights (Xie 2023): pure-Python
    replica of the hashed unigram+bigram bucket LMs and the
    micro-quantized log-ratio sum, plus partitioning invariance of the
    integer surface."""
    import hashlib
    import math
    import random
    from collections import Counter

    from fourstore_spark.operators.sampling import dsir_weights

    B, S = 10_000, 1.0
    WORDS = ["ab", "ba", "cc", "d", "ee", "f", "gg", "h"]
    rng = random.Random(5)
    docs = [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 9))))
        for i in range(120)
    ]
    raw = [(i, t) for i, t in docs if i % 3 != 0]
    tgt = [(i, t) for i, t in docs if i % 3 == 0]

    def bucket(g: str) -> int:
        return (
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % 1_000_000
        ) % B

    def grams(t: str) -> list[int]:
        w = t.lower().split()
        gs = w + [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
        return [bucket(g) for g in gs]

    cr: Counter = Counter(b for _, t in raw for b in grams(t))
    ct: Counter = Counter(b for _, t in tgt for b in grams(t))
    nr, nt = sum(cr.values()), sum(ct.values())

    def lr(b: int) -> int:
        x = math.log((ct[b] + S) / (nt + S * B)) - math.log(
            (cr[b] + S) / (nr + S * B)
        )
        # half-away-from-zero like F.round
        return int(math.copysign(math.floor(abs(x * 1e6) + 0.5), x))

    want = {}
    for i, t in raw:
        bs = grams(t)
        if bs:
            want[i] = (len(bs), sum(lr(b) for b in bs))

    rdf = spark.createDataFrame(raw, ["doc_id", "text"])
    tdf = spark.createDataFrame(tgt, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["logweight_micro"])
        for r in dsir_weights(rdf, tdf).collect()
    }
    assert got == want
    got13 = {
        r["doc_id"]: (r["n_grams"], r["logweight_micro"])
        for r in dsir_weights(rdf.repartition(13), tdf).collect()
    }
    assert got13 == got


def test_dsir_composes_with_top_fraction(spark):
    """The documented resample composition: dsir_weights ->
    top_fraction_by_score keeps exactly ceil(frac*N) best-weighted
    docs, deterministic across partitionings."""
    import math

    from fourstore_spark.operators.sampling import (
        dsir_weights,
        top_fraction_by_score,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    w = dsir_weights(
        docs.where("doc_id % 7 != 0"), docs.where("doc_id % 7 = 0")
    )
    n = w.count()
    kept = top_fraction_by_score(w, 0.25, "logweight_micro", "doc_id")
    assert kept.count() == math.ceil(0.25 * n)
    # deterministic under repartitioning
    kept_b = top_fraction_by_score(
        w.repartition(7), 0.25, "logweight_micro", "doc_id"
    )
    assert {r["doc_id"] for r in kept.collect()} == {
        r["doc_id"] for r in kept_b.collect()
    }


def test_url_host_feeds_domain_caps(spark):
    """url_host as the cap_per_group key — the per-domain cap use the
    two operators were built to compose into."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.sampling import cap_per_group
    from fourstore_spark.operators.scrubbing import url_host

    rows = [
        (i, f"https://Hot.example/{i}") for i in range(40)
    ] + [(100 + i, f"http://cold{i}.org/x") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "url"]).withColumn(
        "domain", url_host(F.col("url"))
    )
    out = cap_per_group(df, "domain", 10)
    per = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert per["hot.example"] == 10
    assert all(v == 1 for k, v in per.items() if k != "hot.example")
