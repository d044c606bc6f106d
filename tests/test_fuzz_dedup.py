"""Differential check for the production MinHash signature stage.

The production path (operators/dedup.py minhash_signatures) computes
signatures via explode + min(xxhash64) hash-aggregate for whole-stage
codegen. The reference formulation below computes the SAME signature
with array higher-order functions (transform + aggregate over the
shingle array) — an independent expression tree over the same hash
family, kept here as the differential oracle (it was the r1-r5
production implementation before the explode form measured 3x faster).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Column
from pyspark.sql import functions as F

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

_SETTINGS = dict(
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "8")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_char_shingles(text: Column, k: int) -> Column:
    """Character k-shingles of a lowercased text column (HOF form)."""
    t = F.lower(text)
    idx = F.sequence(F.lit(0), F.greatest(F.length(t) - k, F.lit(0)))
    return F.transform(idx, lambda i: F.substring(t, i + 1, k))


def _ref_minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """sig[i] = min over shingles of h1 XOR rotl64(h2, i) (HOF form)."""
    base = F.transform(
        shingles,
        lambda s: F.struct(
            F.xxhash64(s).alias("h1"), F.xxhash64(s, F.lit(1)).alias("h2")
        ),
    )
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes)
    return F.aggregate(
        base,
        init,
        lambda acc, b: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            # call_function: the shiftleft/shiftrightunsigned Python
            # wrappers only take literal bit counts, not a Column index
            lambda a, i: F.least(
                a,
                b["h1"].bitwiseXOR(
                    F.call_function(
                        "shiftleft", b["h2"], i.cast("int")
                    ).bitwiseOR(
                        F.call_function(
                            "shiftrightunsigned",
                            b["h2"],
                            (F.lit(64) - i).cast("int"),
                        )
                    )
                ),
            ),
        ),
    )


texts = st.lists(
    st.sampled_from(
        [
            "the quick brown fox jumps over the lazy dog",
            "THE QUICK BROWN FOX",  # case folding
            "ab",  # shorter than shingle_k
            "",  # empty -> one empty shingle both ways
            "aaaaaaaaaaaaaaaa",  # degenerate: one distinct shingle
            "pack my box with five dozen liquor jugs",
            "x",
            "emoji ☃ and unicode éèê text",
        ]
    ),
    min_size=1,
    max_size=6,
    unique=True,
)


@given(corpus=texts, num_hashes=st.sampled_from([8, 64]), k=st.sampled_from([3, 5]))
@settings(**_SETTINGS)
def test_minhash_signatures_match_hof_reference(spark, corpus, num_hashes, k):
    from fourstore_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    prod = {
        r["__id"]: [r[f"__h{i}"] for i in range(num_hashes)]
        for r in minhash_signatures(
            docs, "text", "doc_id", num_hashes=num_hashes, shingle_k=k
        ).collect()
    }
    ref = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select(
            "doc_id",
            _ref_minhash_signature(
                _ref_char_shingles(F.col("text"), k), num_hashes
            ).alias("sig"),
        ).collect()
    }
    assert prod == ref, (corpus, num_hashes, k)


def test_semantic_decontaminate_matches_numpy(spark):
    """semantic_decontaminate vs a numpy replica: integer max of
    micro-rounded cosines, every corpus row present, guards raise."""
    import math
    import random

    import numpy as np
    import pytest as _pytest

    from fourstore_spark.operators.dedup import semantic_decontaminate

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    # plant a near-exact leak: corpus 8 ~ eval 3 (same direction)
    rows[8] = (8, [x * 2.0 for x in rows[3][1]])
    corpus = [(i, v) for i, v in rows if i % 4 != 3]
    evals = [(i, v) for i, v in rows if i % 4 == 3]
    cdf = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    edf = spark.createDataFrame(evals, ["vec_id", "embedding"])

    got = {
        r["vec_id"]: (r["max_cos_micro"], r["contaminated"])
        for r in semantic_decontaminate(
            cdf, edf, threshold_micro=990_000
        ).collect()
    }
    E = np.array([v for _, v in evals])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    want = {}
    for i, v in corpus:
        c = En @ (np.array(v) / np.linalg.norm(v))
        ms = max(
            int(math.copysign(math.floor(abs(x * 1e6) + 0.5), x))
            for x in c
        )
        want[i] = (ms, ms >= 990_000)
    assert got == want
    assert got[8][1], "planted leak must be flagged"
    assert len(got) == len(corpus), "every corpus row gets a flag row"

    with _pytest.raises(ValueError, match="empty eval"):
        semantic_decontaminate(cdf, edf.limit(0))
    with _pytest.raises(ValueError, match="LSH"):
        semantic_decontaminate(cdf, edf, max_eval_rows=3)


def test_subtract_corpus_bloom_no_false_negatives(spark):
    """Bloom-path cross-corpus subtraction: every true duplicate is
    dropped (no false negatives — the Bloom guarantee), survivors are
    a subset of the exact path's survivors, and at fpp=1e-3 on this
    corpus the two paths agree exactly."""
    from fourstore_spark.operators.dedup import (
        subtract_corpus,
        subtract_corpus_bloom,
    )

    docs = [(i, f"doc number {i} body text") for i in range(400)]
    # reference shares 100 documents verbatim (modulo case/punct noise)
    ref = [(i, f"DOC NUMBER {i} BODY TEXT!") for i in range(0, 400, 4)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rdf = spark.createDataFrame(ref, ["rid", "text"])

    exact = {r["doc_id"] for r in subtract_corpus(df, rdf).collect()}
    bloom = {
        r["doc_id"] for r in subtract_corpus_bloom(df, rdf).collect()
    }
    dupes = set(range(0, 400, 4))
    assert not (bloom & dupes), "false negative: a true duplicate survived"
    assert bloom <= exact, "bloom may only over-drop, never under-drop"
    assert bloom == exact  # at this size/fpp no false positives expected


def test_subtract_corpus_bloom_null_text_parity(spark):
    """NULL-text rows must survive the Bloom path unconditionally —
    subtract_corpus parity: fingerprint(NULL) never equi-joins, so the
    exact path keeps them, and the Bloom path must too even when the
    REFERENCE also contains NULL text (xxhash64 of a NULL input would
    otherwise give every NULL-text doc the same deterministic
    positions and drop them all)."""
    from fourstore_spark.operators.dedup import (
        subtract_corpus,
        subtract_corpus_bloom,
    )

    df = spark.createDataFrame(
        [(1, "shared text"), (2, None), (3, "unique text"), (4, None)],
        "doc_id long, text string",
    )
    rdf = spark.createDataFrame(
        [(10, "shared text"), (11, None)], "rid long, text string"
    )
    exact = {r["doc_id"] for r in subtract_corpus(df, rdf).collect()}
    bloom = {
        r["doc_id"] for r in subtract_corpus_bloom(df, rdf).collect()
    }
    assert exact == {2, 3, 4}
    assert bloom == exact


def test_subtract_corpus_bloom_filter_size_guard(spark):
    """The m-bit array reaches the driver AND every executor: the
    guard must raise BEFORE the build, naming the remediation knobs
    (fpp / expected_items / sharding)."""
    import pytest as _pytest

    from fourstore_spark.operators.dedup import subtract_corpus_bloom

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    rdf = spark.createDataFrame([(2, "b")], "rid long, text string")
    with _pytest.raises(ValueError) as exc:
        subtract_corpus_bloom(
            df, rdf, expected_items=10_000_000_000, fpp=0.001,
            max_filter_bytes=512 * 1024 * 1024,
        )
    msg = str(exc.value)
    assert "fpp" in msg and "expected_items" in msg and "shard" in msg
    # under the cap the same call builds fine
    assert subtract_corpus_bloom(df, rdf, fpp=0.001).count() == 1


def test_semantic_decontaminate_zero_norm_embedding(spark):
    """Zero-norm embeddings: cosine is 0/0 = NaN and must surface as
    max_cos_micro NULL / contaminated=false — never a silent 0L cast
    (and never a crash). Both directions: a zero corpus vector against
    a real eval set, and a real corpus against an eval set containing
    a zero vector."""
    from fourstore_spark.operators.dedup import semantic_decontaminate

    cdf = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    edf = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: (r["max_cos_micro"], r["contaminated"])
        for r in semantic_decontaminate(cdf, edf).collect()
    }
    assert got[1] == (None, False)  # zero corpus vector: unknowable
    assert got[2] == (1_000_000, True)
    # zero vector in the EVAL set: its NaN pairs drop out of the max
    edf2 = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got2 = {
        r["vec_id"]: (r["max_cos_micro"], r["contaminated"])
        for r in semantic_decontaminate(cdf, edf2).collect()
    }
    assert got2[2] == (0, False)  # only the orthogonal real pair counts
    assert got2[1] == (None, False)


# ------------------------------------------------ edit-distance pairs
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_matches_replica(spark):
    """Fuzz vs a pure-Python replica of the WHOLE contract (normalize,
    prefix/suffix-4 blocking, hot-block drop, length prefilter,
    levenshtein threshold): the reported pair set must be identical —
    the DuckDB oracle replays the same algebra."""
    import random

    from fourstore_spark.operators.dedup import edit_distance_pairs

    random.seed(11)
    words = ["table", "spark", "merge", "query", "widget", "gizmo"]
    base = [" ".join(random.choice(words) for _ in range(2))
            for _ in range(60)]
    rows = []
    for i, s in enumerate(base):
        rows.append((i * 3, s))
        if i % 2 == 0:  # one-char mutation -> dist 1 of its source
            pos = random.randrange(len(s))
            rows.append((i * 3 + 1, s[:pos] + "x" + s[pos + 1:]))
        if i % 5 == 0:  # exact duplicate (case/space variant) -> dist 0
            rows.append((i * 3 + 2, "  " + s.upper()))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    got = sorted(
        tuple(r)
        for r in edit_distance_pairs(df, max_dist=1, max_block=50).collect()
    )

    norm = {i: s.strip().lower() for i, s in rows}
    from collections import defaultdict

    blocks = defaultdict(set)
    for i, s in norm.items():
        blocks["p:" + s[:4]].add(i)
        blocks["s:" + s[max(len(s) - 4, 0):]].add(i)
    cand = set()
    for ids in blocks.values():
        if len(ids) > 50:
            continue
        for a in ids:
            for b in ids:
                if a < b:
                    cand.add((a, b))
    want = sorted(
        (a, b, _lev(norm[a], norm[b]))
        for a, b in cand
        if abs(len(norm[a]) - len(norm[b])) <= 1
        and _lev(norm[a], norm[b]) <= 1
    )
    assert got == want
    assert any(d == 0 for _, _, d in got)  # exact dups reported
    assert any(d == 1 for _, _, d in got)


def test_edit_distance_pairs_recall_contract_and_clusters(spark):
    """The documented miss: edits touching BOTH the first and last
    block_chars window defeat prefix/suffix blocking. And the pair set
    composes with resolve_duplicate_clusters like every other pair
    producer."""
    from fourstore_spark.operators.components import (
        resolve_duplicate_clusters,
    )
    from fourstore_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "Xlpha beta gammX"),   # dist 2, edits in BOTH windows
            (3, "alpha beta gammX"),   # dist 1, prefix block catches it
            (4, "alpha beta gamma"),   # dist 0 of 1
        ],
        "doc_id long, text string",
    )
    pairs = edit_distance_pairs(df, max_dist=2)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in pairs.collect()}
    assert (1, 2) not in got        # the stated blocking miss
    assert got[(1, 3)] == 1 and got[(1, 4)] == 0
    # 2 and 3 share the suffix window (both end "gammX") and differ
    # only at the first char — blocking catches what 1-2 missed, and
    # transitivity re-links 2 into the cluster anyway:
    assert got[(3, 4)] == 1 and got[(2, 3)] == 1

    surv = resolve_duplicate_clusters(
        df, pairs.select("id_a", "id_b"), id_col="doc_id"
    )
    ids = {r["doc_id"] for r in surv.collect()}
    assert ids == {1}  # one cluster {1,2,3,4} via 2-3; min-id survives


def test_edit_distance_clusters_equals_pair_composition(spark):
    """edit_distance_clusters (string-level dedup, no id pairs) must
    keep exactly the rows the naive resolve-over-id-pairs composition
    keeps when no block is capped — and stay linear where the naive
    path is quadratic in duplicate multiplicity."""
    import random

    from fourstore_spark.operators.components import (
        resolve_duplicate_clusters,
    )
    from fourstore_spark.operators.dedup import (
        edit_distance_clusters,
        edit_distance_pairs,
    )

    random.seed(5)
    words = ["alpha", "beta", "gamma", "delta", "tango"]
    strings = [" ".join(random.choice(words) for _ in range(2))
               for _ in range(25)]
    rows, next_id = [], 0
    for s in strings:
        for _ in range(random.randrange(1, 5)):  # duplicate multiplicity
            rows.append((next_id, s)); next_id += 1
        if random.random() < 0.5:  # a near-dup variant
            pos = random.randrange(len(s))
            rows.append((next_id, s[:pos] + "x" + s[pos + 1:]))
            next_id += 1
    rows.append((next_id, "   "))  # blank passes through both paths
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)

    naive = {
        r["doc_id"]
        for r in resolve_duplicate_clusters(
            df,
            edit_distance_pairs(df, max_dist=1).select("id_a", "id_b"),
        ).collect()
    }
    fast = {
        r["doc_id"]
        for r in edit_distance_clusters(df, max_dist=1).collect()
    }
    assert fast == naive

    # degenerate duplicate-heavy input: 3000 copies of one name would
    # be ~4.5M id pairs; the cluster path compares 2 strings once
    heavy = spark.createDataFrame(
        [(i, "same title") for i in range(3000)]
        + [(9000, "same titlx"), (9001, "other thing")],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in edit_distance_clusters(heavy, max_dist=1).collect()
    }
    assert kept == {0, 9001}  # min id of the near-dup cluster + loner
