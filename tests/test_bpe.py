"""BPE trainer/encoder vs a pure-Python reference implementation.

The distributed trainer's contract (pair-count argmax with
(count desc, left, right) tie-break; greedy left-to-right rewrite) is
replayed by a dict-based reference here, then both are compared on a
hand corpus AND on the real sf0.001 documents table.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from fourstore_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_train,
    merges_df,
    word_counts,
)

SF = "/root/testdata/sf0.001"


def ref_word_counts(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            c[w] += 1
    return c


def ref_train(wc: Counter, num_merges: int) -> list[tuple[str, str]]:
    seg = {w: list(w) + [END] for w in wc}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in seg.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        # argmax with (count desc, left, right) tie-break
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[w] = out
    return merges


def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [END]
    while len(syms) >= 2:
        cand = [
            (ranks[(syms[i], syms[i + 1])], (syms[i], syms[i + 1]))
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cand:
            break
        _, (a, b) = min(cand)
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
]


def test_train_matches_reference_hand_corpus(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), ["doc_id", "text"]
    )
    wc = word_counts(docs)
    got = bpe_train(wc, 12)
    want = ref_train(ref_word_counts(TEXTS), 12)
    assert got == want
    # the classic Sennrich example learns 'est</w>' early
    joined = ["".join(p) for p in got]
    assert "est" in joined or "es" in joined


def test_encode_matches_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), ["doc_id", "text"]
    )
    merges = bpe_train(word_counts(docs), 10)
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        want = [p for w in t.lower().split() for p in ref_encode(w, merges)]
        assert enc[i] == want, f"doc {i}"
    # unseen word at encode time still segments (down to chars if needed)
    new = spark.createDataFrame([(9, "zzz lowest")], ["doc_id", "text"])
    out = {r["doc_id"]: list(r["pieces"]) for r in bpe_encode(new, merges).collect()}
    assert out[9] == ref_encode("zzz", merges) + ref_encode("lowest", merges)


def test_train_on_real_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    wc = word_counts(docs)
    got = bpe_train(wc, 24, checkpoint_every=8)
    texts = [r["text"] for r in docs.select("text").collect()]
    want = ref_train(ref_word_counts(texts), 24)
    assert got == want
    # merge table surface
    mdf = merges_df(spark, got)
    assert mdf.count() == len(got)
    assert [f.name for f in mdf.schema.fields] == ["step", "left", "right"]


def test_encode_compression_monotone(spark):
    """More merges never increase the piece count of any document."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    merges = bpe_train(word_counts(docs), 16)
    n8 = {
        r["doc_id"]: r["n_pieces"]
        for r in bpe_encode(docs, merges[:8]).collect()
    }
    n16 = {
        r["doc_id"]: r["n_pieces"]
        for r in bpe_encode(docs, merges).collect()
    }
    assert set(n8) == set(n16)
    assert all(n16[k] <= n8[k] for k in n8)


def test_empty_and_blank_docs(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "ok")], ["doc_id", "text"]
    )
    merges = bpe_train(word_counts(docs), 4)
    out = {r["doc_id"]: (r["n_pieces"], list(r["pieces"]))
           for r in bpe_encode(docs, merges).collect()}
    assert out[0] == (0, []) and out[1] == (0, [])
    assert out[2][0] >= 1


def test_encode_nasty_whitespace_matches_train_tokenization(spark):
    """bpe_encode tokenizes with the SAME Spark lm_tokens expression
    word_counts trains on (ADVICE r9): on tabs/NBSP/CRLF input the
    encoded pieces must equal ref-encoding the Spark-side token arrays
    word-for-word (a Python str.split() re-tokenization would split
    NBSP and drop Java's leading empty token)."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.lm import lm_tokens

    texts = [
        "\tlow low lower",
        "newest\r\nnewest  widest",
        "    ",
        "low low low",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    wc = word_counts(df)
    merges = bpe_train(wc, 10)
    spark_tokens = {
        r["doc_id"]: list(r["t"])
        for r in df.select(
            "doc_id", lm_tokens(F.col("text")).alias("t")
        ).collect()
    }
    got = {
        r["doc_id"]: list(r["pieces"])
        for r in bpe_encode(df, merges).collect()
    }
    want = {
        d: [p for w in toks for p in ref_encode(w, merges)]
        for d, toks in spark_tokens.items()
    }
    assert got == want


def test_merges_roundtrip_through_parquet(spark, tmp_path):
    """Tokenizer artifact: merges -> merges_df -> parquet -> reload ->
    identical encoding."""
    from fourstore_spark.operators.bpe import merges_from_df

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    merges = bpe_train(word_counts(df), 12)
    path = str(tmp_path / "merges")
    merges_df(spark, merges).write.parquet(path)
    reloaded = merges_from_df(spark.read.parquet(path))
    assert reloaded == merges
    a = sorted(map(tuple, bpe_encode(df, merges).collect()))
    b = sorted(map(tuple, bpe_encode(df, reloaded).collect()))
    assert a == b
