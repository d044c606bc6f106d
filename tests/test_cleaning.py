"""Corpus-cleaning operators: decontamination + repetition filters."""

from pyspark.sql import functions as F

from fourstore_spark.operators.cleaning import (
    ngram_decontaminate,
    repetition_filter,
    repetition_stats,
    word_ngrams,
)


def test_word_ngrams_sliding_and_short(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("x y",), ("",)], "text string"
    ).select(word_ngrams(F.col("text"), 3).alias("g"))
    rows = [r.g for r in df.collect()]
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == ["x y"]  # shorter than n: whole sequence is one gram
    assert rows[2] == []


def test_decontaminate_drop_and_flag(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "totally unrelated content here now"),
            (3, "quick brown fox jumps high today"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [("benchmark says quick brown fox jumps",)], "text string"
    )
    clean = ngram_decontaminate(docs, ev, n=4)
    assert {r.doc_id for r in clean.select("doc_id").collect()} == {2}
    flagged = ngram_decontaminate(docs, ev, n=4, mode="flag")
    got = {r.doc_id: r.contaminated for r in flagged.collect()}
    assert got == {1: True, 2: False, 3: True}


def test_decontaminate_plan_broadcasts_eval_side(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([("a b c d e f g h",)], "text string")
    plan = ngram_decontaminate(docs, ev, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_repetition_stats_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all words here are distinct"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    # 4 tokens, 1 distinct -> dup 0.75; 3 bigrams all "spam spam" -> ~0.667
    assert abs(got[1].dup_word_frac - 0.75) < 1e-9
    assert abs(got[1].dup_2gram_frac - (1 - 1 / 3)) < 1e-6
    assert got[1].top_word_frac == 1.0
    assert got[2].dup_word_frac == 0.0
    assert got[2].dup_2gram_frac == 0.0
    assert abs(got[2].top_word_frac - 0.2) < 1e-9


def test_repetition_stats_long_doc_linear(spark):
    """A 50k-token document must be cheap: top_word_frac is one
    array_sort + one aggregate pass (the r6 O(n^2) lambda took ~10^9
    comparisons on a doc this size and would blow the bound)."""
    import time

    words = [f"w{i % 997}" for i in range(50_000)] + ["peak"] * 1_000
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    t0 = time.monotonic()
    row = repetition_stats(docs).collect()[0]
    elapsed = time.monotonic() - t0
    # 997 buckets of ~50-51 plus the 1000-run of "peak" over 51k tokens
    assert abs(row.top_word_frac - round(1000 / 51_000, 6)) < 1e-9
    assert elapsed < 30, f"repetition_stats took {elapsed:.1f}s on 51k tokens"


def test_repetition_filter_drops_spam(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "a perfectly normal document with varied words"),
        ],
        "doc_id long, text string",
    )
    kept = repetition_filter(docs)
    assert [r.doc_id for r in kept.select("doc_id").collect()] == [2]
    assert "dup_word_frac" not in kept.columns


def test_corpus_clean_composition(spark):
    from fourstore_spark.operators.cleaning import corpus_clean

    docs = spark.createDataFrame(
        [
            (1, "a normal document with plenty of varied interesting words"),
            (2, "a normal document with plenty of varied interesting words"),
            (3, "spam spam spam spam spam spam spam spam spam spam"),
            (4, "benchmark probe question answer pair goes right here now"),
            (5, "another clean and unique document nobody else resembles"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [("benchmark probe question answer pair goes right here today",)],
        "text string",
    )
    kept = {r.doc_id for r in corpus_clean(docs, ev).select("doc_id").collect()}
    # 2 deduped against 1 (same fingerprint, lowest id wins), 3 dropped by
    # repetition, 4 decontaminated (shares an 8-gram with the eval set)
    assert kept == {1, 5}


def test_connected_components_chains_and_cycles(spark):
    from fourstore_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain -> component 1
            (10, 11), (11, 10),              # cycle -> component 10
            (20, 21), (22, 21), (23, 22),    # star-ish chain -> 20
        ],
        "src long, dst long",
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 200-node path converges under a cap far below its diameter:
    pointer jumping gives O(log n) rounds (plain min-propagation would
    need ~200 and, pre-r6, silently returned wrong labels)."""
    import pytest

    from fourstore_spark.operators.components import connected_components

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    ).coalesce(4)
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges, max_iterations=12).collect()
    }
    assert got == {(i, 0) for i in range(n)}

    # non-convergence must raise, never return partial labels
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2)


def test_resolve_duplicate_clusters_transitive(spark):
    from fourstore_spark.operators.components import (
        resolve_duplicate_clusters,
    )

    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(7)], "doc_id long, text string"
    )
    # A~B, B~C: transitivity must drop BOTH 2 and 3 (pairwise "keep one
    # per pair" would leave 3 alive); 5~6 separately
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in resolve_duplicate_clusters(docs, pairs).collect()
    )
    assert kept == [0, 1, 4, 5]


def test_corpus_report_shape_and_dup_frac(spark):
    from fourstore_spark.operators.reports import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "src1", "the quick brown fox jumps over the lazy dog"),
            (2, "src1", "THE QUICK  brown fox jumps over the lazy dog"),
            (3, "src1", "this is a different text and it has other words"),
            (4, "src2", "le chat est sur la table dans la maison"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        (r["source"], r["lang_guess"]): r
        for r in corpus_report(docs).collect()
    }
    en = rows[("src1", "en")]
    # docs 1 and 2 share a normalization fingerprint -> dup_frac 1/3
    assert en["n_docs"] == 3 and en["n_distinct"] == 2
    assert abs(en["dup_frac"] - round(1 - 2 / 3, 6)) < 1e-9
    assert en["total_tokens"] == 9 + 9 + 10
    fr = rows[("src2", "fr")]
    assert fr["n_docs"] == 1 and fr["dup_frac"] == 0.0


def test_corpus_report_approx_hll(spark):
    """r12: approx=True swaps the corpus-sized exact-distinct state for
    per-bucket HLL registers. Volume/quality columns must be IDENTICAL
    to the exact path (they stay exact sums); n_distinct lands within
    the documented ~1.04/sqrt(m) HLL error band and never exceeds
    n_docs (clamped so dup_frac stays in [0, 1])."""
    from fourstore_spark.operators.reports import corpus_report

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    exact = {
        (r["source"], r["lang_guess"]): r
        for r in corpus_report(docs).collect()
    }
    m = 1024
    approx = {
        (r["source"], r["lang_guess"]): r
        for r in corpus_report(docs, approx=True, m=m).collect()
    }
    assert set(exact) == set(approx)
    for key, e in exact.items():
        a = approx[key]
        assert a["n_docs"] == e["n_docs"]
        assert a["total_tokens"] == e["total_tokens"]
        assert a["avg_quality"] == e["avg_quality"]
        assert a["n_distinct"] <= a["n_docs"]
        assert 0.0 <= a["dup_frac"] <= 1.0
        # 5 sigma of the documented standard error (+1 for tiny buckets
        # where rounding dominates)
        tol = 5 * 1.04 / (m**0.5) * e["n_distinct"] + 1
        assert abs(a["n_distinct"] - e["n_distinct"]) <= tol, key

    # exact path result shape is unchanged by the new parameter
    assert corpus_report(docs).columns == corpus_report(
        docs, approx=True
    ).columns

    # all-NULL-text bucket: no fingerprints, no registers — the approx
    # readout must see all-zero registers and report 0 distinct like
    # the exact path, not propagate a NULL register sum (r12 fix)
    nulls = spark.createDataFrame(
        [(900 + i, "nullsrc", None) for i in range(3)],
        "doc_id long, source string, text string",
    )
    ae = {
        (r["source"], r["lang_guess"]): r
        for r in corpus_report(nulls).collect()
    }
    aa = {
        (r["source"], r["lang_guess"]): r
        for r in corpus_report(nulls, approx=True).collect()
    }
    assert set(ae) == set(aa)
    for key in ae:
        assert aa[key]["n_distinct"] == ae[key]["n_distinct"], key
        assert aa[key]["n_docs"] == ae[key]["n_docs"] == 3


def test_hash_sampling_deterministic_and_partitioned(spark):
    from fourstore_spark.operators.sampling import (
        sample_by_hash,
        split_by_hash,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    s1 = {r["doc_id"] for r in sample_by_hash(docs, "doc_id", 0.2).collect()}
    s2 = {r["doc_id"] for r in sample_by_hash(
        docs.repartition(7), "doc_id", 0.2).collect()}
    assert s1 == s2  # identical across partitionings/runs
    assert 0.1 < len(s1) / 2000 < 0.3
    sp = split_by_hash(docs, "doc_id", {"train": 0.8, "val": 0.2})
    counts = {r["split"]: r["count"] for r in sp.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val"}
    assert counts["train"] + counts["val"] == 2000
    assert counts["train"] > counts["val"]
    # remainder split -> None bucket
    sp2 = split_by_hash(docs, "doc_id", {"train": 0.5})
    n_none = sp2.where(F.col("split").isNull()).count()
    assert 0 < n_none < 2000
    import pytest as _p

    with _p.raises(ValueError):
        split_by_hash(docs, "doc_id", {"a": 0.9, "b": 0.2})
    # cutoffs land on exact round numbers even when frac*1e6 is not
    # float-exact (int(0.29*1e6) == 289999): ranges must tile [0, 1e6)
    from fourstore_spark.operators.sampling import split_ranges

    assert split_ranges({"a": 0.29, "b": 0.57, "c": 0.14}) == [
        ("a", 0, 290000),
        ("b", 290000, 860000),
        ("c", 860000, 1000000),
    ]


def test_pack_sequences_greedy_and_chunked(spark):
    from fourstore_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    docs = spark.createDataFrame(
        [(0, 60), (1, 50), (2, 30), (3, 100), (4, 120), (5, 10)],
        "doc_id long, ntok long",
    )
    packed = pack_sequences(docs, "doc_id", "ntok", budget=100, chunk=1000)
    got = {r["doc_id"]: r["pack_id"] for r in packed.collect()}
    # greedy in id order at budget 100: [60] [50+30] [100] [120] [10]
    assert got[0] != got[1]
    assert got[1] == got[2]
    assert got[3] not in (got[2], got[4])
    assert got[4] != got[5]  # 120 oversized packs alone
    st = packing_stats(packed, "ntok", 100).collect()[0]
    assert st["n_packs"] == 5 and st["total_tokens"] == 370
    assert st["over_budget_multi"] == 0
    # chunk boundaries: chunk=3 -> ids 0-2 and 3-5 pack independently
    packed2 = pack_sequences(docs, "doc_id", "ntok", budget=100, chunk=3)
    g2 = {r["doc_id"]: r["pack_id"] for r in packed2.collect()}
    assert (g2[2] >> 32) == 0 and (g2[3] >> 32) == 1
    # determinism across partitionings
    packed3 = pack_sequences(
        docs.repartition(5), "doc_id", "ntok", budget=100, chunk=1000
    )
    assert {r["doc_id"]: r["pack_id"] for r in packed3.collect()} == got


def test_pack_sequences_metadata_only_arrow_boundary(spark):
    """The applyInPandas stage must see (id, tokens, __chunk) ONLY —
    never the corpus payload columns (at 100 TB that would serialize
    the whole corpus into pandas for a counter loop)."""
    from fourstore_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, 10 + i, "payload text " * 5, b"\x00\x01") for i in range(6)],
        "doc_id long, ntok long, text string, blob binary",
    )
    packed = pack_sequences(docs, "doc_id", "ntok", budget=25, chunk=1000)
    # output keeps the full corpus schema + pack_id
    assert packed.columns == ["doc_id", "ntok", "text", "blob", "pack_id"]
    plan = packed._jdf.queryExecution().analyzed().toString()
    fmg = [
        ln for ln in plan.splitlines() if "FlatMapGroupsInPandas" in ln
    ]
    assert len(fmg) == 1
    # the pandas stage's argument list carries only the metadata columns
    assert "text" not in fmg[0] and "blob" not in fmg[0]
    # and the packing itself is unchanged by the extra columns
    got = {r["doc_id"]: r["pack_id"] for r in packed.collect()}
    assert len(set(got.values())) == 4  # [10+11] [12+13] [14] [15] at 25


def test_contamination_report(spark):
    from fourstore_spark.operators.cleaning import contamination_report

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today fine"),
            (2, "quick brown fox jumps over the lazy dog today extra pad"),
            (3, "completely unrelated words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (10, "quick brown fox jumps over the lazy dog today"),
            (11, "never appearing benchmark question answer pair item x"),
        ],
        "eval_id long, text string",
    )
    got = {
        r["eval_id"]: (r["n_docs_hit"], r["n_gram_hits"])
        for r in contamination_report(docs, ev, n=8).collect()
    }
    # eval 10 has two 8-grams; doc1 contains both, doc2 contains both
    assert got[10] == (2, 4)
    assert got[11] == (0, 0)


def test_top_fraction_by_score_exact_threshold_and_ties(spark):
    from fourstore_spark.operators.sampling import top_fraction_by_score

    # scores with a fat tie group at 0.5 and a null tail
    rows = [(i, 0.9) for i in range(3)] + [(i, 0.5) for i in range(10, 20)] \
        + [(i, None) for i in range(30, 33)]
    docs = spark.createDataFrame(rows, "doc_id long, q double")
    # N=16, frac .5 -> k=8: the 3 at 0.9 + the 5 smallest-id ties at 0.5
    kept = sorted(
        r["doc_id"]
        for r in top_fraction_by_score(docs, 0.5, "q", "doc_id").collect()
    )
    assert kept == [0, 1, 2, 10, 11, 12, 13, 14]
    # spill into nulls: k=15 -> all 13 scored + 2 smallest-id nulls
    kept = sorted(
        r["doc_id"]
        for r in top_fraction_by_score(docs, 15 / 16, "q", "doc_id").collect()
    )
    assert kept == [0, 1, 2] + list(range(10, 20)) + [30, 31]
    # degenerate fracs
    assert top_fraction_by_score(docs, 0.0, "q", "doc_id").count() == 0
    assert top_fraction_by_score(docs, 1.0, "q", "doc_id").count() == 16
    # determinism across partitionings
    kept2 = sorted(
        r["doc_id"]
        for r in top_fraction_by_score(
            docs.repartition(7), 0.5, "q", "doc_id"
        ).collect()
    )
    assert kept2 == [0, 1, 2, 10, 11, 12, 13, 14]


def test_top_fraction_guard_probes_before_collect(spark):
    """The max_distinct_scores guard must fire from a bounded
    cardinality probe, not after collecting the (potentially
    corpus-sized) histogram to the driver (VERDICT r12 #4)."""
    import pytest

    from fourstore_spark.operators.sampling import top_fraction_by_score

    docs = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "doc_id long, q double"
    )
    with pytest.raises(ValueError, match="max_distinct_scores"):
        top_fraction_by_score(
            docs, 0.5, "q", "doc_id", max_distinct_scores=3
        )
    # at exactly the bound the walk still runs and stays exact
    kept = sorted(
        r["doc_id"]
        for r in top_fraction_by_score(
            docs, 0.3, "q", "doc_id", max_distinct_scores=10
        ).collect()
    )
    assert kept == [7, 8, 9]


def test_dedup_lines_drop_all_and_rebuild(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared line\nbeta", "s0"),
            (2, "shared line\ngamma", "s1"),
            (3, "delta\nepsilon", "s0"),
            (4, "shared line", "s1"),  # loses everything
        ],
        "doc_id long, text string, source string",
    )
    from fourstore_spark.operators.cleaning import dedup_lines

    out = {r.doc_id: r for r in dedup_lines(docs, max_docs=1).collect()}
    assert out[1].text == "alpha\nbeta" and out[1].n_lines_removed == 1
    assert out[2].text == "gamma" and out[2].n_lines_removed == 1
    assert out[3].text == "delta\nepsilon" and out[3].n_lines_removed == 0
    assert out[4].text == "" and out[4].n_lines_removed == 1
    # passthrough columns survive
    assert out[3].source == "s0"


def test_dedup_lines_keep_first(spark):
    docs = spark.createDataFrame(
        [
            (5, "x\ndup", None),
            (2, "dup\ny\ndup", None),
            (9, "dup", None),
        ],
        "doc_id long, text string, source string",
    )
    from fourstore_spark.operators.cleaning import dedup_lines

    out = {
        r.doc_id: r
        for r in dedup_lines(docs, max_docs=1, keep_first=True).collect()
    }
    # smallest (doc_id, pos) = (2, 0) keeps its copy; all others removed
    assert out[2].text == "dup\ny" and out[2].n_lines_removed == 1
    assert out[5].text == "x" and out[5].n_lines_removed == 1
    assert out[9].text == "" and out[9].n_lines_removed == 1


def test_line_frequencies(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb\na"), (2, "b")], "doc_id long, text string"
    )
    from fourstore_spark.operators.cleaning import line_frequencies

    got = {
        r.line: (r.n_docs, r.n_occurrences)
        for r in line_frequencies(docs).collect()
    }
    assert got == {"a": (1, 2), "b": (2, 2)}


def test_blocklist_flags_word_boundary_and_lengths(spark):
    """C4-style blocked-phrase gate: word-boundary exact (no substring
    false positives), mixed phrase lengths, DISTINCT-gram counting,
    normalization (case/whitespace), short-doc safety, empty list."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from fourstore_spark.operators.cleaning import blocklist_flags

    docs = spark.createDataFrame(
        [
            (1, "this classify step is classy"),     # substrings only
            (2, "drop this CLASS now"),              # 1-gram, case-folded
            (3, "a bad phrase here and bad phrase again"),  # dup counts once
            (4, "bad phrase and class together"),    # two different hits
            (5, "bad"),                              # shorter than phrase
            (6, ""),                                 # empty doc
            (7, "three word phrase inside text"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_blocked"], r["blocked"])
        for r in blocklist_flags(
            docs, ["class", "Bad  Phrase", "three word phrase"]
        ).collect()
    }
    assert got[1] == (0, False), "substring must not match"
    assert got[2] == (1, True)
    assert got[3] == (1, True), "distinct grams count once"
    assert got[4] == (2, True)
    assert got[5] == (0, False), "short doc cannot match a longer phrase"
    assert got[6] == (0, False)
    assert got[7] == (1, True)
    assert len(got) == 7, "every row gets a flag row"

    # empty / whitespace-only phrase lists flag nothing
    none = blocklist_flags(docs, ["", "   "]).where("blocked").count()
    assert none == 0

    with _pytest.raises(ValueError, match="max_inline_phrases"):
        blocklist_flags(
            docs, [f"p{i}" for i in range(11)], max_inline_phrases=10
        )

    # zero-shuffle claim: the whole gate is one scan projection
    plan = blocklist_flags(
        docs, ["class", "bad phrase"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
