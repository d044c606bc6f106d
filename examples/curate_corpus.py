"""End-to-end training-corpus curation pipeline, composed entirely from
fourstore_spark operators — the canonical order most published pipelines
(C4, CCNet, Gopher/MassiveWeb, Dolma, RefinedWeb) follow:

    0. langid     — one-vs-rest fastText-style language ID (CCNet's
                    first step; gate with keep_langs on a real crawl)
    1. scrub      — HTML strip, PII redaction, Unicode NFC
    2. rule gate  — Gopher quality flags (exact scaled-integer rules)
    3. clf gate   — fastText-style hashed n-gram classifier trained on
                    a reference slice vs the rest (the CCNet
                    Wikipedia-vs-crawl move, self-supervised here)
    4. dedup      — exact fingerprint, then MinHash-LSH near-dup with
                    connected-component cluster resolution
    5. decontam   — n-gram overlap vs an eval set + embedding-cosine
                    semantic decontamination
    6. score      — CCNet bigram-LM perplexity buckets + DSIR importance
                    weights against a target slice
    7. select     — keep the head/middle buckets, cap per source domain
    8. pack/shard — fixed-token-budget packing, deterministic shards
    9. report     — CMS heavy-hitter tokens + HLL distinct-token count
                    + qsketch doc-length quantiles over the final
                    selection (the sketches a 100 TB run keeps instead
                    of a distinct-key groupBy or a full sort)

Run:  python examples/curate_corpus.py [sf_dir]   (default sf0.001)

Every step is deterministic (md5-bucket draws, integer-exact scores), so
re-running yields byte-identical selections — the property that makes a
100 TB curation run auditable and resumable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def curate(spark: SparkSession, sf_dir: str):
    from fourstore_spark.operators.cleaning import ngram_decontaminate
    from fourstore_spark.operators.dedup import semantic_decontaminate
    from fourstore_spark.operators.lm import ccnet_partition, lm_score
    from fourstore_spark.operators.packing import pack_sequences, shard_corpus
    from fourstore_spark.operators.sampling import cap_per_group, dsir_weights
    from fourstore_spark.operators.scrubbing import (
        normalize_unicode,
        scrub_pii,
        strip_html,
    )
    from fourstore_spark.operators.textstats import (
        fingerprint,
        gopher_rules,
        token_count,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = docs.count()

    # 0. language ID — CCNet's actual FIRST step: a one-vs-rest
    # fastText-style stack trained on labeled data, argmax per doc.
    # On a real crawl you would gate here (keep_langs=target set /
    # streaming.stream_langid_filter at the frontier); the synthetic
    # demo corpus is language-agnostic word soup, so this run reports
    # the predicted distribution instead of gating on it
    from fourstore_spark.operators.classifier import (
        langid_predict,
        train_langid,
    )

    lw, lb = train_langid(docs, iters=4, n_features=2048)
    n_langs = (
        langid_predict(docs, lw, lb, n_features=2048)
        .select("lang").distinct().count()
    )

    # 1. scrub (column-expression stages; normalize_unicode projects to
    # (doc_id, text, changed), so re-attach the metadata columns by id)
    meta = docs.select("doc_id", "source", "lang")
    docs = (
        normalize_unicode(scrub_pii(strip_html(docs)))
        .select("doc_id", "text")
        .join(meta, "doc_id")
    )

    # 2. Gopher rule gate — relax word bounds for the tiny demo corpus
    # and skip ok_stop: the synthetic vocabulary carries almost no
    # English stopwords (on real corpora gate on `passes`)
    flags = gopher_rules(docs, min_words=5, max_words=100_000)
    gate = flags.where(
        "ok_words AND ok_mean_len AND ok_symbol AND ok_bullet "
        "AND ok_ellipsis AND ok_alpha"
    )
    docs = docs.join(gate.select("doc_id"), "doc_id", "left_semi")
    n_rules = docs.count()

    # 3. classifier gate: train the hashed n-gram linear model with a
    # deterministic slice as the quality reference (on a real corpus:
    # Wikipedia as positive, raw crawl as negative) and keep docs the
    # model does NOT score far below the reference (logit floor well
    # under 0 — the demo corpus is homogeneous, so this is a
    # tail-trim, not a halving)
    from fourstore_spark.operators.classifier import (
        classifier_logits,
        train_quality_classifier,
    )

    wdf, bias = train_quality_classifier(
        docs.where(F.col("doc_id") % 5 == 0),
        docs.where(F.col("doc_id") % 5 != 0),
        iters=4,
        n_features=2048,
    )
    scores = classifier_logits(
        docs, wdf, bias_micro=bias, n_features=2048,
        threshold_micro=-500_000,
    )
    docs = docs.join(
        scores.where("quality").select("doc_id"), "doc_id", "left_semi"
    )
    n_clf = docs.count()

    # 4a. exact dedup by normalization fingerprint (keep smallest id)
    keep = docs.groupBy(
        fingerprint(F.col("text")).alias("__fp")
    ).agg(F.min("doc_id").alias("doc_id"))
    docs = docs.join(keep.select("doc_id"), "doc_id", "left_semi")

    # 4b. near-dup: MinHash-LSH candidates -> connected-component
    # cluster resolution (keep each cluster's minimum id). On an
    # INCREMENTAL run, replace minhash_lsh_candidates with
    # write_lsh_index once + lsh_query_index per new batch (the corpus
    # is then never re-signed — see examples/build_retrieval_indexes.py
    # for the written-index maintenance pattern).
    from fourstore_spark.operators.components import (
        resolve_duplicate_clusters,
    )
    from fourstore_spark.operators.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(docs, "text", "doc_id")
    docs = resolve_duplicate_clusters(docs, pairs)
    n_dedup = docs.count()

    # 5. decontamination: lexical n-gram + embedding-cosine
    eval_set = docs.where(F.col("doc_id") % 97 == 0)
    docs = ngram_decontaminate(
        docs.where(F.col("doc_id") % 97 != 0), eval_set.select("text"), n=13
    )
    sem = semantic_decontaminate(
        emb.where("vec_id % 97 != 0"),
        emb.where("vec_id % 97 = 0"),
        threshold_micro=990_000,
    )
    docs = docs.join(
        sem.where("contaminated").select(
            F.col("vec_id").alias("doc_id")
        ),
        "doc_id",
        "left_anti",
    )
    n_decon = docs.count()

    # 6. scoring: CCNet perplexity buckets + DSIR importance
    buckets = ccnet_partition(lm_score(docs)).select("doc_id", "bucket")
    weights = dsir_weights(
        docs, docs.where(F.col("doc_id") % 5 == 0)
    ).select("doc_id", "logweight_micro")
    docs = docs.join(buckets, "doc_id").join(weights, "doc_id", "left")

    # 7. selection: drop the perplexity tail, cap each source domain
    docs = docs.where(F.col("bucket") != "tail")
    docs = cap_per_group(docs, "source", 40)
    n_sel = docs.count()

    # 8. pack + shard
    sized = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(sized, "doc_id", "n_tokens", budget=256)
    shards = shard_corpus(docs.select("doc_id", "source"), "doc_id", 8)

    # 9. sketch report over the final selection: the vocabulary stats a
    # 100 TB run keeps (depth*width / m bounded) instead of a
    # distinct-token groupBy
    from fourstore_spark.operators.lm import lm_tokens
    from fourstore_spark.operators.sketch import (
        cms_build,
        cms_heavy_hitters,
        hll_build,
        hll_estimate,
        qsketch_build,
        qsketch_quantile,
    )

    toks = docs.select(F.explode(lm_tokens(F.col("text"))).alias("tok"))
    heavy = cms_heavy_hitters(
        toks, "tok", width=1024, depth=4, threshold=50
    ).count()
    distinct_est = hll_estimate(hll_build(toks, "tok", m=1024), m=1024)
    # doc-length quantiles from the histogram sketch — the per-shard
    # mergeable answer to "what does the selected length distribution
    # look like" (no sort, bucket-bounded)
    p50, p99 = qsketch_quantile(
        qsketch_build(docs.select(F.length("text").alias("len")), "len"),
        [0.50, 0.99],
    )
    return {
        "input_docs": n0,
        "langid_langs": n_langs,
        "after_rules": n_rules,
        "after_classifier": n_clf,
        "after_dedup": n_dedup,
        "after_decontam": n_decon,
        "selected": n_sel,
        "packs": packed.select("pack_id").distinct().count(),
        "shards": shards.select("shard").distinct().count(),
        "heavy_tokens_ge50": heavy,
        "distinct_tokens_est": round(distinct_est),
        "len_p50": p50,
        "len_p99": p99,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("curate-corpus")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    stats = curate(spark, sf_dir)
    for k, v in stats.items():
        print(f"{k:>16}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
