"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Extends the reference's free-text machinery (token/stem/metaphone derived
quads, src/frontend/import.c:603-700) with the text-quality primitives a
training-data pipeline needs. Everything is a column expression — at 100 TB
these run inside the parquet scan projection with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately small + ASCII so the same logic is expressible in the DuckDB
# oracle SQL.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "es"],
    "de": ["der", "die", "und", "das", "ein", "ist", "nicht", "mit"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text -> empty array)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def word_token_count(text: Column) -> Column:
    """BPE-ish token estimate: word pieces + punctuation marks counted
    separately (a cheap proxy for tokenizer-length filtering)."""
    words = F.size(F.split(F.trim(text), r"\s+"))
    puncts = F.regexp_count(text, F.lit(r"[.,;:!?]"))
    return (words + puncts).cast("long")


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """Count of ``words`` present in a distinct-token array (one score
    per candidate language inside lang_id; exposed for ad-hoc single-
    language scoring)."""
    return F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
    )


def lang_id(text: Column) -> Column:
    """Stopword-hit argmax language guess; 'und' when nothing matches.

    (A deterministic heuristic — deliberately simple so it has an exact
    SQL oracle; swap in a real n-gram model per-partition if needed.)
    """
    toks = F.array_distinct(tokens(F.lower(text)))
    scores = {
        lang: stopword_hits(toks, words)
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    # deterministic tie-break: alphabetically-first language wins, so build
    # the when-chain bottom-up in reverse order
    out = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column, n_tokens: Column | None = None) -> Column:
    """Heuristic document quality in [0,1]: penalizes very short docs,
    high punctuation ratio, and low mean word length.  Pass a precomputed
    ``n_tokens`` column to avoid re-tokenizing."""
    n_chars = F.length(text).cast("double")
    n_tokens = (token_count(text) if n_tokens is None else n_tokens).cast(
        "double"
    )
    # regexp_count beats length(regexp_replace(...)): counting matches
    # skips materializing the stripped string per row (~15% on the q8
    # one-pass scan at sf0.1)
    punct = F.regexp_count(text, F.lit(r"[^a-zA-Z0-9\s]")).cast("double")
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(1.0))
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    length_term = F.least(n_tokens / 100.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
    wordlen_term = F.when(
        (mean_word_len >= 3.0) & (mean_word_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round((length_term + punct_term + wordlen_term) / 3.0, 6)


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercase, punctuation-stripped,
    whitespace-collapsed text — the exact-dedup key for 'same modulo
    formatting' documents."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )
    return F.md5(norm.cast("binary"))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stats frame.

    The two tokenizations (raw + lowercased-distinct) are projected ONCE
    into staging columns and every stat derives from those — a naive
    expression tree re-runs the split per derived column (6x in the
    physical plan), and at 100 TB the per-row tokenize cost dominates the
    scan.  CollapseProject keeps the staging projection separate because
    the arrays are referenced more than once, so codegen evaluates each
    split exactly once per row."""
    t = F.col(text_col)
    staged = df.select(
        "*",
        tokens(t).alias("__toks"),
        F.array_distinct(tokens(F.lower(t))).alias("__ltoks"),
    )
    n_tokens = F.size("__toks").cast("long")
    # word_token_count semantics on the staged array: split(trim(text))
    # yields [''] (size 1) for empty text where tokens() yields []
    bpeish_words = F.when(F.length(F.trim(t)) == 0, F.lit(1)).otherwise(
        F.size("__toks")
    )
    puncts = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    scores = {
        lang: F.size(
            F.array_intersect(
                F.col("__ltoks"), F.array(*[F.lit(w) for w in words])
            )
        )
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    lang = F.lit("und")
    for lg in sorted(STOPWORDS, reverse=True):
        lang = F.when((best > 0) & (scores[lg] == best), F.lit(lg)).otherwise(lang)
    return staged.select(
        "*",
        n_tokens.alias("n_tokens"),
        (bpeish_words + puncts).cast("long").alias("n_bpeish_tokens"),
        lang.alias("lang_guess"),
        quality_score(t, n_tokens).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    ).drop("__toks", "__ltoks")


def top_ngrams(
    df: DataFrame,
    n: int = 1,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-level top-k n-gram vocabulary: (ngram, n_docs, n_occurrences),
    ordered by occurrences desc then ngram asc, limited to k.

    The workhorse behind vocabulary audits, contamination scans and
    tokenizer sizing. Scale shape: explode(ngrams) -> one groupBy(ngram)
    computing occurrence count and exact document frequency together
    (Spark expands the distinct leg map-side); the final top-k is a
    TakeOrderedAndProject over the aggregated stream, never a full sort
    of the vocabulary.
    """
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = tokens(t)
    if n == 1:
        grams = toks
    else:
        # sliding window via transform over the valid start offsets;
        # guard short docs: sequence(0, -1) would DESCEND ([0, -1]) and
        # slice() rejects start 0, so < n tokens must yield no grams
        grams = F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    exploded = df.select(
        F.col(id_col).alias("__doc"), F.explode(grams).alias("ngram")
    )
    agg = exploded.groupBy("ngram").agg(
        F.count_distinct("__doc").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )
    return agg.orderBy(
        F.col("n_occurrences").desc(), F.col("ngram").asc()
    ).limit(k)
