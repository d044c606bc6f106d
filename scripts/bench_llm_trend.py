"""Scale-trend measurement for the r9 LLM operators (r9 verdict #7).

The SPARQL bench queries earned their sf0.1 -> sf1 -> sf3 slope table in
BASELINE.md; this script gives the r9 corpus/graph operators the same
evidence: lm_score, bm25_score, pagerank (6 iters) and
ahash_neardup_pairs each run on Spark AND as a DuckDB replay of the
identical integer-exact algorithm, best-of-3, with a cross-engine
CHECKSUM compare (the integer surfaces make equality exact, never
float-noise).

The ahash input is synthesized deterministically from doc_id on BOTH
engines (groups of 8 near-identical hashes, single-bit flips), because
the test corpora carry no image payloads at sf0.1+ — what's being
measured is the banded candidate join, the part that scales.

Usage: python scripts/bench_llm_trend.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/sfdata/sf1 /tmp/sfdata/sf3,
        skipping dirs that don't exist)
Prints one line per (operator, sf) plus a final markdown table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

LM_TOKS = r"""
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
"""

DUCK_LM = f"""
WITH toks AS ({LM_TOKS}), uni AS (
  SELECT w1, count(*) AS c1
  FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY w1
), v AS (SELECT count(*) AS v FROM uni),
big AS (
  SELECT doc_id, unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                         for i in range(1, len(t))]) AS p
  FROM toks WHERE len(t) >= 2
), bp AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM big),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bp GROUP BY 1, 2),
sc AS (
  SELECT bp.doc_id,
         CAST(round(ln((bc.c12 + 0.5) / (uni.c1 + 0.5 * v.v))
                    * 1000000) AS BIGINT) AS lp
  FROM bp JOIN uni USING (w1) JOIN bc USING (w1, w2), v
), agg AS (
  SELECT doc_id, count(*) AS n, CAST(SUM(lp) AS BIGINT) AS s
  FROM sc GROUP BY doc_id
)
SELECT count(*), CAST(sum(s) AS BIGINT), CAST(sum(n) AS BIGINT) FROM agg
"""

DUCK_BM25 = f"""
WITH toks AS ({LM_TOKS}),
corpus AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM toks),
tf AS (
  SELECT doc_id, len(t) AS dl, term, count(*) AS tf FROM (
    SELECT doc_id, t,
           unnest(list_filter(t, x -> x IN ('merge', 'spark', 'table')))
             AS term
    FROM toks) GROUP BY 1, 2, 3
), df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
agg AS (
  SELECT doc_id,
    CAST(SUM(CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5))
        * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        * 1000000) AS BIGINT)) AS BIGINT) AS s
  FROM tf JOIN df USING (term), corpus GROUP BY doc_id
)
SELECT count(*), CAST(sum(s) AS BIGINT) FROM agg
"""

# identical deterministic hash synthesis on both engines: groups of 8
# doc_ids share a base hash; members 1-7 flip one low bit -> every
# within-group pair is hamming <= 2, cross-group pairs collide on a
# band only by accident and get verified away
SYNTH_HI = "(doc_id // 8 * 2654435761) % 4294967296"
SYNTH_LO = ("xor((doc_id // 8 * 40503) % 4294967296, "
            "CASE WHEN doc_id % 8 = 0 THEN 0 "
            "ELSE (1::BIGINT << (doc_id % 29)) END)")

DUCK_AHASH = f"""
WITH h AS (
  SELECT doc_id AS id,
         CAST({SYNTH_HI} AS BIGINT) AS hi,
         CAST({SYNTH_LO} AS BIGINT) AS lo
  FROM documents
), banded AS (
  SELECT id, hi, lo, band,
         CASE WHEN band >= 4 THEN (hi >> ((band % 4) * 8)) & 255
              ELSE (lo >> ((band % 4) * 8)) & 255 END AS key
  FROM h, (SELECT unnest(range(8)) AS band)
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
), pairs AS (
  SELECT id_a, id_b,
         CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT)
           AS hamming
  FROM cand
)
SELECT count(*), CAST(sum(hamming) AS BIGINT)
FROM pairs WHERE hamming <= 6
"""


DUCK_DSIR = f"""
WITH toks AS ({LM_TOKS}),
grams AS (
  SELECT doc_id,
         unnest(list_concat(t, [t[i] || ' ' || t[i + 1]
                                for i in range(1, len(t))])) AS gram
  FROM toks
), bucketed AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(gram), 1, 8))::UBIGINT
              % 1000000 AS BIGINT) % 10000 AS b
  FROM grams
), raw_c AS (
  SELECT b, count(*) AS cr FROM bucketed WHERE doc_id % 7 != 0 GROUP BY b
), tgt_c AS (
  SELECT b, count(*) AS ct FROM bucketed WHERE doc_id % 7 = 0 GROUP BY b
), nr AS (SELECT CAST(COALESCE(sum(cr), 0) AS BIGINT) AS n FROM raw_c),
nt AS (SELECT CAST(COALESCE(sum(ct), 0) AS BIGINT) AS n FROM tgt_c),
ratio AS (
  SELECT COALESCE(raw_c.b, tgt_c.b) AS b,
         CAST(round((ln((COALESCE(ct, 0) + 1.0) / (nt.n + 1.0 * 10000))
                   - ln((COALESCE(cr, 0) + 1.0) / (nr.n + 1.0 * 10000)))
                    * 1000000) AS BIGINT) AS lr
  FROM raw_c FULL OUTER JOIN tgt_c ON raw_c.b = tgt_c.b, nr, nt
), agg AS (
  SELECT doc_id, count(*) AS n, CAST(SUM(lr) AS BIGINT) AS s
  FROM bucketed JOIN ratio USING (b)
  WHERE doc_id % 7 != 0 GROUP BY doc_id
)
SELECT count(*), CAST(sum(s) AS BIGINT) FROM agg
"""

DUCK_GOPHER = r"""
WITH base AS (
  SELECT doc_id,
    CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t,
    string_split_regex(text, '\n') AS l,
    text AS raw
  FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(t) AS BIGINT) AS n_words,
    CAST(COALESCE(list_sum([length(x) for x in t]), 0) AS BIGINT)
      AS word_chars,
    CAST(len(regexp_extract_all(raw, '#|\.\.\.|…')) AS BIGINT)
      AS n_symbols,
    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
      AS alpha_words,
    CAST(len(list_filter(
      ['the','be','to','of','and','that','have','with'],
      w -> list_contains(t, w))) AS BIGINT) AS stop_hits
  FROM base
)
SELECT CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n_words >= 50 AND n_words <= 100000
                      AND n_words > 0 AND word_chars >= 3 * n_words
                      AND word_chars <= 10 * n_words
                      AND 10 * n_symbols <= n_words
                      AND 5 * alpha_words >= 4 * n_words
                      AND stop_hits >= 2
                 THEN 1 ELSE 0 END) AS BIGINT)
FROM m
"""


DUCK_CLF = f"""
WITH toks AS ({LM_TOKS}),
grams AS (
  SELECT doc_id,
         unnest(list_concat(t, [t[i] || ' ' || t[i + 1]
                                for i in range(1, len(t))])) AS gram
  FROM toks
), f AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(gram), 1, 8))::UBIGINT
              % 1000000 AS BIGINT) % 4096 AS b
  FROM grams
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM((b * 2654435761) % 2000001 - 1000000) AS BIGINT) AS s
  FROM f GROUP BY doc_id
)
SELECT count(*),
       CAST(SUM(CAST(round(1000000.0 * (s / (1000000.0 * n)))
                AS BIGINT)) AS BIGINT)
FROM agg
"""

DUCK_CMS = f"""
WITH toks AS ({LM_TOKS}),
stream AS (SELECT unnest(t) AS tok FROM toks),
cells AS (
  SELECT r,
         CAST(('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || tok),
                                 1, 8))::UBIGINT
              % 1000000 AS BIGINT) % 2048 AS c,
         CAST(count(*) AS BIGINT) AS cnt
  FROM stream, (SELECT unnest(range(5)) AS r)
  GROUP BY 1, 2
)
SELECT count(*), CAST(SUM(cnt) AS BIGINT) FROM cells
"""

DUCK_HLL = f"""
WITH toks AS ({LM_TOKS}),
stream AS (SELECT unnest(t) AS tok FROM toks),
h AS (
  SELECT CAST(('0x' || substring(md5(tok), 1, 8))::UBIGINT
              AS BIGINT) AS hv
  FROM stream
), jr AS (
  SELECT hv % 1024 AS j,
         CASE WHEN hv // 1024 = 0 THEN 23
              ELSE 22 - length(bin(hv // 1024)) + 1 END AS rho
  FROM h
), regs AS (SELECT j, MAX(rho) AS m FROM jr GROUP BY j)
SELECT count(*), CAST(SUM(m) AS BIGINT) FROM regs
"""

# quantile histogram (r12): per-language n_chars bucket table — the
# identical integer bucket algebra as operators/sketch.qsketch_bucket
DUCK_QSKETCH = """
WITH bk AS (
  SELECT lang,
         greatest(length(bin(n_chars))-1-5, 0)*32
         + (n_chars >> greatest(length(bin(n_chars))-1-5, 0)) AS b
  FROM documents WHERE n_chars IS NOT NULL
), g AS (SELECT lang, b, CAST(count(*) AS BIGINT) AS cnt
         FROM bk GROUP BY lang, b)
SELECT count(*), CAST(SUM(b * cnt) AS BIGINT) FROM g
"""


def spark_clf(spark, sf):
    from pyspark.sql import functions as FF

    from fourstore_spark.operators.classifier import classifier_logits

    d = spark.read.parquet(f"{sf}/documents.parquet")
    weights = spark.range(4096).select(
        FF.col("id").alias("b"),
        ((FF.col("id") * FF.lit(2654435761)) % 2000001 - 1000000)
        .alias("w_micro"),
    )
    r = classifier_logits(d, weights, n_features=4096).agg(
        F.count("*"), F.sum("logit_micro")
    ).head()
    return (r[0], r[1])


def spark_cms(spark, sf):
    from fourstore_spark.operators.lm import lm_tokens
    from fourstore_spark.operators.sketch import cms_build

    d = spark.read.parquet(f"{sf}/documents.parquet")
    toks = d.select(F.explode(lm_tokens(F.col("text"))).alias("tok"))
    r = cms_build(toks, "tok", width=2048, depth=5).agg(
        F.count("*"), F.sum("cnt")
    ).head()
    return (r[0], r[1])


def spark_hll(spark, sf):
    from fourstore_spark.operators.lm import lm_tokens
    from fourstore_spark.operators.sketch import hll_build

    d = spark.read.parquet(f"{sf}/documents.parquet")
    toks = d.select(F.explode(lm_tokens(F.col("text"))).alias("tok"))
    r = hll_build(toks, "tok", m=1024).agg(
        F.count("*"), F.sum("M")
    ).head()
    return (r[0], r[1])


def spark_qsketch(spark, sf):
    from fourstore_spark.operators.sketch import qsketch_build

    d = spark.read.parquet(f"{sf}/documents.parquet")
    r = qsketch_build(d, "n_chars", group_cols=["lang"]).agg(
        F.count("*"), F.sum(F.col("b") * F.col("cnt"))
    ).head()
    return (r[0], r[1])


def spark_dsir(spark, sf):
    from fourstore_spark.operators.sampling import dsir_weights

    d = spark.read.parquet(f"{sf}/documents.parquet")
    r = dsir_weights(
        d.where(F.col("doc_id") % 7 != 0),
        d.where(F.col("doc_id") % 7 == 0),
    ).agg(F.count("*"), F.sum("logweight_micro")).head()
    return (r[0], r[1])


def spark_gopher(spark, sf):
    from fourstore_spark.operators.textstats import gopher_rules

    d = spark.read.parquet(f"{sf}/documents.parquet")
    r = gopher_rules(d).agg(
        F.count("*"),
        F.sum(
            (
                F.col("ok_words") & F.col("ok_mean_len")
                & F.col("ok_symbol") & F.col("ok_alpha")
                & F.col("ok_stop")
            ).cast("long")
        ),
    ).head()
    return (r[0], r[1])


def spark_lm(spark, sf):
    from fourstore_spark.operators.lm import lm_score

    d = spark.read.parquet(f"{sf}/documents.parquet")
    r = lm_score(d).agg(
        F.count("*"), F.sum("logprob_micro"), F.sum("n_bigrams")
    ).head()
    return (r[0], r[1], r[2])


def spark_bm25(spark, sf):
    from fourstore_spark.operators.lm import bm25_score

    d = spark.read.parquet(f"{sf}/documents.parquet")
    r = bm25_score(d, ["merge", "spark", "table"]).agg(
        F.count("*"), F.sum("score_micro")
    ).head()
    return (r[0], r[1])


def _edges(spark, sf):
    n = spark.read.parquet(f"{sf}/nation.parquet").select(
        F.concat(F.lit("urn:nation:"), "n_nationkey").alias("src"),
        F.concat(F.lit("urn:region:"), "n_regionkey").alias("dst"),
    )
    c = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.concat(F.lit("urn:customer:"), "c_custkey").alias("src"),
        F.concat(F.lit("urn:nation:"), "c_nationkey").alias("dst"),
    )
    s = spark.read.parquet(f"{sf}/supplier.parquet").select(
        F.concat(F.lit("urn:supplier:"), "s_suppkey").alias("src"),
        F.concat(F.lit("urn:nation:"), "s_nationkey").alias("dst"),
    )
    return n.unionByName(c).unionByName(s)


def spark_pagerank(spark, sf):
    from fourstore_spark.operators.graph import pagerank

    r = pagerank(_edges(spark, sf), iters=6).agg(
        F.count("*"), F.sum("rank")
    ).head()
    return (r[0], r[1])


def spark_ahash(spark, sf):
    from fourstore_spark.operators.multimodal import ahash_neardup_pairs

    h = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").alias("media_id"),
        F.expr(
            "cast((doc_id div 8) * 2654435761 % 4294967296 as bigint)"
        ).alias("ahash_hi"),
        F.expr(
            "cast((doc_id div 8) * 40503 % 4294967296 as bigint) ^ "
            "(case when doc_id % 8 = 0 then cast(0 as bigint) "
            "else shiftleft(cast(1 as bigint), "
            "cast(doc_id % 29 as int)) end)"
        ).alias("ahash_lo"),
    )
    r = ahash_neardup_pairs(h, max_hamming=6).agg(
        F.count("*"), F.sum("hamming")
    ).head()
    return (r[0], r[1])


def duck_checksum(con, sql):
    row = con.execute(sql).fetchone()
    return tuple(int(x) if x is not None else None for x in row)


def norm(t):
    return tuple(int(x) if x is not None else None for x in t)


def best_of(fn, n=3):
    best, out = None, None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, out


def _part_files(root: str) -> int:
    import glob

    return len(glob.glob(os.path.join(root, "**", "part-*.parquet"),
                         recursive=True))


def _pinned_partition_filters(df, path: str, expected: list[int]) -> None:
    """Runtime re-check of the plan pin the unit tests assert at test
    scale: the index scan's PartitionFilters must select exactly the
    probed partition values (the index's whole value is the files it
    does NOT open). Parses the scan over ``path`` specifically and its
    IN-list specifically (other scans carry empty PartitionFilters, and
    join-key isnotnull(col#NNN) attribute ids are not values)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    got = None
    for line in plan.splitlines():
        if "FileScan" in line and path in line:
            m = re.search(
                r"PartitionFilters: \[[^\]]*?IN \(([0-9,]+)\)", line
            )
            assert m, f"index scan without IN partition filter:\n{line}"
            got = sorted(int(x) for x in m.group(1).split(","))
    assert got == sorted(expected), (got, expected)


def index_slope(spark, dirs):
    """Written-index slope evidence (r10 verdict #5): the point of
    write_bm25_index / write_ivf_index is the fraction of index files a
    probe does NOT open, so measure indexed-vs-fullscan wall AND
    files-opened per probe at every scale; results must be
    value-identical between the two paths (both are plan-pinned
    equality surfaces). Build time is reported separately — it
    amortizes over every query after."""
    import hashlib

    from fourstore_spark.operators.lm import (
        bm25_query,
        bm25_score,
        write_bm25_index,
    )
    from fourstore_spark.operators.similarity import (
        _probe_cells,
        _to_double,
        ivf_probe_indexed,
        ivf_search,
        train_centroids,
        write_ivf_index,
    )

    terms = ["merge", "spark", "table"]
    nb = 64
    rows = []
    for sf in dirs:
        tag = os.path.basename(sf.rstrip("/"))
        d = spark.read.parquet(f"{sf}/documents.parquet")
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")

        # ---- BM25: full-scan score vs written-index query
        idx = f"/tmp/llm_trend_bm25_{tag}"
        t0 = time.time()
        write_bm25_index(d, idx, n_buckets=nb)
        bm_build = time.time() - t0
        full_t, full_r = best_of(
            lambda: bm25_score(d, terms)
            .agg(F.count("*"), F.sum("score_micro")).head()
        )
        probe_df = bm25_query(spark, idx, terms)
        idx_t, idx_r = best_of(
            lambda: bm25_query(spark, idx, terms)
            .agg(F.count("*"), F.sum("score_micro")).head()
        )
        ok = norm(tuple(full_r)) == norm(tuple(idx_r))
        buckets = sorted({
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
             % 1_000_000) % nb
            for t in terms
        })
        post = os.path.join(idx, "postings")
        total = _part_files(post)
        opened = sum(
            _part_files(os.path.join(post, f"bucket={b}"))
            for b in buckets
        )
        probe_df.collect()
        _pinned_partition_filters(probe_df, idx, buckets)
        print(
            f"{sf} bm25 indexed {idx_t:.3f}s vs full {full_t:.3f}s "
            f"(speedup {full_t / idx_t:.2f}x, build {bm_build:.1f}s) "
            f"files {opened}/{total} "
            f"{'MATCH' if ok else f'MISMATCH {full_r} vs {idx_r}'}",
            flush=True,
        )
        rows.append(("bm25", tag, idx_t, full_t, opened, total, ok))

        # ---- IVF: full-corpus probe join vs written-index pruned scan.
        # 64 cells / 5 queries / nprobe 4: the probe set stays a small
        # fraction of the cells, which is the regime the index exists
        # for (10 diverse queries over 16 cells would touch nearly
        # every cell and measure nothing but overhead)
        cents = train_centroids(emb, k=64, iters=4)
        ividx = f"/tmp/llm_trend_ivf_{tag}"
        t0 = time.time()
        write_ivf_index(emb, cents, ividx)
        ivf_build = time.time() - t0
        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        chk = [F.count("*"), F.sum(F.col("vec_id") * 997 + F.col("rank"))]
        full_t, full_r = best_of(
            lambda: ivf_search(emb, queries, cents, k=10, nprobe=4)
            .agg(*chk).head()
        )
        idx_t, idx_r = best_of(
            lambda: ivf_probe_indexed(spark, ividx, queries, k=10,
                                      nprobe=4).agg(*chk).head()
        )
        ok = norm(tuple(full_r)) == norm(tuple(idx_r))
        probed = sorted(
            r["c"]
            for r in queries.select(
                F.explode(
                    F.transform(
                        _probe_cells(
                            _to_double(F.col("embedding")), cents, 4
                        ),
                        lambda p: p["i"],
                    )
                ).alias("c")
            ).distinct().collect()
        )
        total = _part_files(ividx)
        opened = sum(
            _part_files(os.path.join(ividx, f"ivf_cell={c}"))
            for c in probed
        )
        print(
            f"{sf} ivf indexed {idx_t:.3f}s vs full {full_t:.3f}s "
            f"(speedup {full_t / idx_t:.2f}x, build {ivf_build:.1f}s) "
            f"files {opened}/{total} "
            f"{'MATCH' if ok else f'MISMATCH {full_r} vs {idx_r}'}",
            flush=True,
        )
        rows.append(("ivf", tag, idx_t, full_t, opened, total, ok))

        # ---- LSH: incremental dedup of a 1% batch against the corpus.
        # "Full" = what you pay WITHOUT the written index: re-sign the
        # whole corpus fresh and join against the batch's bands (same
        # algebra, same corpus-side hot-bucket cap, so the candidate
        # sets are value-identical). Indexed = sign only the batch +
        # partition-pruned scan of the written rows.
        from fourstore_spark.operators.dedup import (
            _banded_rows,
            _cap_buckets,
            lsh_query_index,
            write_lsh_index,
        )

        corpus = d.where("doc_id % 100 != 0")
        batch = d.where("doc_id % 100 = 0")
        lidx = f"/tmp/llm_trend_lsh_{tag}"
        t0 = time.time()
        write_lsh_index(corpus, lidx, n_dirs=64)
        lsh_build = time.time() - t0
        chk = [
            F.count("*"),
            F.sum(F.col("id_a") * 1000003 + F.col("id_b")),
        ]

        def full_lsh():
            cb = _cap_buckets(
                _banded_rows(corpus, "text", "doc_id"),
                ["band", "bucket"], 1000,
            ).select(F.col("__id").alias("id_a"), "band", "bucket")
            qb = _banded_rows(batch, "text", "doc_id").select(
                F.col("__id").alias("id_b"), "band", "bucket"
            )
            return (
                cb.join(qb, ["band", "bucket"])
                .where(F.col("id_a") != F.col("id_b"))
                .select("id_a", "id_b").distinct()
            )

        full_t, full_r = best_of(lambda: full_lsh().agg(*chk).head())
        idx_t, idx_r = best_of(
            lambda: lsh_query_index(spark, lidx, batch).agg(*chk).head()
        )
        ok = norm(tuple(full_r)) == norm(tuple(idx_r))
        probed = sorted(
            r["pdir"]
            for r in _banded_rows(batch, "text", "doc_id")
            .select(F.pmod(F.col("bucket"), F.lit(64)).cast("int")
                    .alias("pdir"))
            .distinct().collect()
        )
        lpath = os.path.join(lidx, "bands")
        total = _part_files(lpath)
        opened = sum(
            _part_files(os.path.join(lpath, f"pdir={c}"))
            for c in probed
        )
        print(
            f"{sf} lsh indexed {idx_t:.3f}s vs full {full_t:.3f}s "
            f"(speedup {full_t / idx_t:.2f}x, build {lsh_build:.1f}s) "
            f"files {opened}/{total} "
            f"{'MATCH' if ok else f'MISMATCH {full_r} vs {idx_r}'}",
            flush=True,
        )
        rows.append(("lsh", tag, idx_t, full_t, opened, total, ok))

        if tag == "sf1":
            # the r10 verdict's files-opened assertion: at sf1 a probe
            # must open only the probed partitions' files. lsh is
            # exempt: a corpus-scale batch's buckets hash into nearly
            # every directory by design (b bands x docs buckets) — its
            # index win is not re-signing the corpus, not pruned I/O;
            # single-doc-probe pruning is pinned in
            # tests/test_lsh_index.py instead
            for kind, _t, _i, _f, op_, tot_, _ok in [
                r for r in rows if r[1] == "sf1" and r[0] != "lsh"
            ]:
                assert 0 < op_ < tot_, (kind, op_, tot_)

    print("\n| index | " + " | ".join(
        f"{os.path.basename(d)} idx/full (files)" for d in dirs) + " |")
    print("|---|" + "---|" * len(dirs))
    for kind in ("bm25", "ivf", "lsh"):
        cells = []
        for sf in dirs:
            tag = os.path.basename(sf.rstrip("/"))
            r = next(
                (x for x in rows if x[0] == kind and x[1] == tag), None
            )
            if r is None:
                cells.append("-")
                continue
            cells.append(
                f"{r[2]:.3f}/{r[3]:.3f} ({r[4]}/{r[5]}"
                + ("" if r[6] else " MISMATCH") + ")"
            )
        print(f"| {kind} | " + " | ".join(cells) + " |")


def main():
    args = sys.argv[1:]
    index_only = "--index-only" in args
    skip_index = "--no-index" in args
    args = [a for a in args if not a.startswith("--")]
    dirs = args or [
        "/root/testdata/sf0.1", "/tmp/sfdata/sf1", "/tmp/sfdata/sf3"
    ]
    dirs = [d for d in dirs if os.path.isdir(d)]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("llm-trend")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        # single-file corpora otherwise plan as one input split (see
        # bench.py — q8's tokenizer measured 1 of 32 cores busy)
        .config("spark.sql.files.minPartitionNum", str(CPUS))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    if index_only:
        index_slope(spark, dirs)
        return
    ops = [
        ("lm_score", spark_lm, DUCK_LM),
        ("bm25_score", spark_bm25, DUCK_BM25),
        ("pagerank6", spark_pagerank, None),
        ("ahash_neardup", spark_ahash, DUCK_AHASH),
        ("dsir_weights", spark_dsir, DUCK_DSIR),
        ("gopher_rules", spark_gopher, DUCK_GOPHER),
        ("quality_clf", spark_clf, DUCK_CLF),
        ("cms_sketch", spark_cms, DUCK_CMS),
        ("hll_sketch", spark_hll, DUCK_HLL),
        ("qsketch", spark_qsketch, DUCK_QSKETCH),
    ]
    rows = []
    for sf in dirs:
        con = duckdb.connect()
        for t in ("documents", "nation", "customer", "supplier"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        for name, sfn, dsql in ops:
            if dsql is None:  # pagerank builds its oracle at call time
                import __spark_entry__ as entry

                dsql = (
                    "SELECT count(*), CAST(sum(rank) AS BIGINT) FROM ("
                    + entry._pagerank_oracle_sql()
                    + ")"
                )
            s_t, s_sum = best_of(lambda: sfn(spark, sf))
            d_t, d_sum = best_of(lambda: duck_checksum(con, dsql))
            ok = norm(s_sum) == norm(d_sum)
            print(
                f"{sf} {name}: spark {s_t:.3f}s duck {d_t:.3f}s "
                f"ratio {s_t / d_t:.2f}x checksum "
                f"{'MATCH' if ok else f'MISMATCH {s_sum} vs {d_sum}'}",
                flush=True,
            )
            rows.append((name, sf, s_t, d_t, ok))
        con.close()

    print("\n| operator | " + " | ".join(
        os.path.basename(d) + " S/D (ratio)" for d in dirs) + " |")
    print("|---|" + "---|" * len(dirs))
    for name, _, _, _, _ in [r for i, r in enumerate(rows) if i < len(ops)]:
        cells = []
        for sf in dirs:
            r = next(x for x in rows if x[0] == name and x[1] == sf)
            cells.append(
                f"{r[2]:.3f}/{r[3]:.3f} ({r[2] / r[3]:.2f}x"
                + ("" if r[4] else " CHECKSUM-MISMATCH") + ")"
            )
        print(f"| {name} | " + " | ".join(cells) + " |")

    if not skip_index:
        index_slope(spark, dirs)


if __name__ == "__main__":
    main()
