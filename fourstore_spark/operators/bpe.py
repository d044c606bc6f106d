"""Distributed BPE tokenizer training and encoding.

Byte-pair-encoding vocabulary induction (Sennrich 2016) is the canonical
tokenizer-training step of an LLM data pipeline. The classic algorithm is
inherently iterative (each merge depends on the global pair-count argmax
after the previous merge), so this is one of the few operators with a
driver-side loop — but the loop body is fully distributed and each
iteration touches only the WORD-FREQUENCY table, never the corpus:

1. one corpus pass folds 100 TB of text into (word, count) — vocabulary-
   sized, millions of rows, not billions (`word_counts`);
2. each merge iteration is one map-side-combined groupBy over that table
   (pair counts weighted by word count) plus a codegen'd array fold that
   rewrites the segmentation — no Python, no corpus re-scan;
3. lineage is checkpoint-truncated every `checkpoint_every` merges
   (pointer-jumping discipline, operators/components.py:48).

Encoding (`bpe_encode`) applies the learned merge ranks per word — a
genuinely sequential inner loop, so it runs as an Arrow-batched pandas
UDF with a per-worker word memo (natural-language corpora repeat words;
the cache turns per-token work into per-distinct-word work).

Determinism: pair-count argmax ties break on (pair count desc, left,
right); greedy left-to-right non-overlapping rewrite. The same rules in
the pure-Python reference oracle (tests/test_bpe.py) make train and
encode byte-comparable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_counts", "bpe_train", "bpe_encode", "merges_df",
           "merges_from_df"]

END = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) frequency table: lowercased whitespace words (the
    shared `lm_tokens` expression — bpe_encode tokenizes with the same
    one, so train and encode can never diverge). The one corpus-sized
    job — everything after runs on this reduction."""
    from .lm import lm_tokens

    toks = lm_tokens(F.col(text_col))
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character segmentation + end-of-word sentinel."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping rewrite of (a, b) -> a||b —
    an array fold in codegen (words are short; the quadratic array
    copies are over ~dozens of symbols)."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    words: DataFrame,
    num_merges: int,
    *,
    checkpoint_every: int = 16,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from a (word, wc) table; returns
    the ordered merge list. Each iteration: one pair-count groupBy
    (argmax pulled to the driver — a single row) + one fold rewrite."""
    seg = words.select(
        "wc", _initial_symbols(F.col("word")).alias("s")
    ).localCheckpoint()
    pairs_of = F.expr(
        "transform(sequence(0, size(s) - 2), "
        "i -> struct(s[i] AS a, s[i + 1] AS b))"
    )
    merges: list[tuple[str, str]] = []
    for step in range(num_merges):
        top = (
            seg.where(F.size("s") >= 2)
            .select("wc", F.explode(pairs_of).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("wc").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        seg = seg.select("wc", _merge_pair(F.col("s"), a, b).alias("s"))
        if (step + 1) % checkpoint_every == 0:
            seg = seg.localCheckpoint()
    return merges


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merges as rows (step, left, right) — the contract/
    inspection surface for the iterative trainer."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "step int, left string, right string",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_pieces, pieces) — encode each document with the
    learned merges. Lowest-rank pair merged first, greedy left-to-right,
    identical to training semantics. Words come from the SAME Spark
    split expression `word_counts` trains on (a Python
    str.lower().split() re-tokenization diverges on tabs/NBSP/Unicode
    whitespace — Java `\\s` is ASCII-only; ADVICE r9). Arrow-batched; a
    per-worker memo makes repeated words free."""
    import pandas as pd

    from .lm import lm_tokens

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(w: str, memo: dict) -> list[str]:
        got = memo.get(w)
        if got is not None:
            return got
        syms = list(w) + [END]
        while len(syms) >= 2:
            best_rank, best_pair = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (syms[i], syms[i + 1])
            if best_pair is None:
                break
            a, b = best_pair
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[w] = syms
        return syms

    def encode_batches(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            pieces = [
                [
                    p
                    for w in (list(ws) if ws is not None else [])
                    for p in encode_word(w, memo)
                ]
                for ws in pdf["__words"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_pieces": [len(p) for p in pieces],
                    "pieces": pieces,
                }
            )

    vid_dt = df.select(F.col(id_col).alias("doc_id")).schema[
        "doc_id"
    ].dataType.simpleString()
    return df.select(
        F.col(id_col).alias("doc_id"),
        lm_tokens(F.col(text_col)).alias("__words"),
    ).mapInPandas(
        encode_batches,
        f"doc_id {vid_dt}, n_pieces long, pieces array<string>",
    )


def merges_from_df(df: DataFrame) -> list[tuple[str, str]]:
    """Inverse of merges_df: reload a persisted merge table (parquet/
    anything) back into the ordered list bpe_encode consumes — the
    tokenizer-artifact round trip (train once, encode everywhere)."""
    return [
        (r["left"], r["right"])
        for r in df.select("step", "left", "right")
        .orderBy("step")
        .collect()
    ]
