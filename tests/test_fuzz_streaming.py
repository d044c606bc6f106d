"""Randomized streaming-vs-batch corpus_clean differential.

stream_corpus_clean documents exactly one semantic delta from the batch
corpus_clean: the fingerprint-dedup tiebreak (batch keeps the lowest id
per fingerprint; a stream keeps the first arrival, which within one
micro-batch is engine-chosen). Everything else — quality floor, Gopher
repetition filters, decontamination — must agree row-for-row. Hypothesis
generates a corpus mixing healthy docs, repetition spam, eval-set
contamination and duplicate texts, splits it into randomized
micro-batch files, runs both pipelines and checks:

- the surviving TEXT set is identical (tiebreak-agnostic comparison);
- each surviving text appears exactly once on the streaming side;
- the batch-side survivor per text is the minimum id (the documented
  batch tiebreak).
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu amber birch cedar dune ember"
).split()

_EVAL_TEXT = "quick brown fox jumps over the lazy dog today"

doc_kinds = st.sampled_from(["healthy", "spam", "contaminated", "dup"])

corpora = st.lists(
    st.tuples(doc_kinds, st.integers(0, 10 ** 6)),
    min_size=4,
    max_size=12,
).filter(lambda docs: any(k == "healthy" for k, _ in docs))

splits = st.lists(st.integers(1, 4), min_size=1, max_size=4)


def _make_docs(spec):
    """(kind, seed) list -> (doc_id, text) rows; 'dup' copies the text of
    an earlier healthy doc (or synthesizes one if none yet)."""
    rows = []
    healthy_texts = []
    for i, (kind, seed) in enumerate(spec):
        if kind == "healthy" or (kind == "dup" and not healthy_texts):
            rng = seed
            words = []
            for _ in range(14):
                rng = (rng * 1103515245 + 12345) % (1 << 31)
                words.append(_WORDS[rng % len(_WORDS)])
            # force enough distinct words to clear the repetition filters
            words = list(dict.fromkeys(words)) + _WORDS[:6]
            text = " ".join(words)
            healthy_texts.append(text)
        elif kind == "dup":
            text = healthy_texts[seed % len(healthy_texts)]
        elif kind == "spam":
            w = _WORDS[seed % len(_WORDS)]
            text = " ".join([w] * 12)
        else:  # contaminated: embeds the eval 8-gram in healthy padding
            pad = " ".join(_WORDS[(seed + j) % len(_WORDS)] for j in range(8))
            text = f"{pad} {_EVAL_TEXT} {pad}"
        rows.append((i, text))
    return rows


_SETTINGS = dict(
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "10")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_N = [0]  # unique sink names across hypothesis examples


@pytest.mark.slow  # ~46s availableNow replay fuzz; test_streaming.py keeps the deterministic stream==batch pins
@given(spec=corpora, split=splits)
@settings(**_SETTINGS)
def test_stream_corpus_clean_matches_batch(spark, tmp_path_factory, spec, split):
    from fourstore_spark.operators.cleaning import corpus_clean
    from fourstore_spark.streaming import stream_corpus_clean

    rows = _make_docs(spec)
    docs = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", t) for i, t in rows],
        "doc_id long, ts string, text string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev = spark.createDataFrame([(_EVAL_TEXT,)], "text string")

    batch = corpus_clean(docs.drop("ts"), ev, min_quality=0.1)
    batch_rows = [(r["doc_id"], r["text"]) for r in batch.collect()]

    # randomized micro-batch split: consecutive id chunks, one parquet
    # file per chunk (the file-stream source turns each into input rows)
    _N[0] += 1
    name = f"ccfuzz_{_N[0]}"
    src = tmp_path_factory.mktemp(name)
    chunks, pos = [], 0
    for w in split:
        if pos >= len(rows):
            break
        chunks.append(rows[pos:pos + w])
        pos += w
    if pos < len(rows):
        chunks.append(rows[pos:])
    for ci, chunk in enumerate(chunks):
        spark.createDataFrame(
            [(i, "2024-01-01 00:00:00", t) for i, t in chunk],
            "doc_id long, ts string, text string",
        ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
            str(src / f"b{ci}")
        )
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).option("recursiveFileLookup", "true").parquet(str(src))
    clean = stream_corpus_clean(stream, ev, min_quality=0.1)
    q = (
        clean.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = [
        (r["doc_id"], r["text"])
        for r in spark.sql(f"SELECT doc_id, text FROM {name}").collect()
    ]

    batch_texts = sorted(t for _, t in batch_rows)
    stream_texts = sorted(t for _, t in stream_rows)
    # identical survivor text multisets (both sides dedup to one per text)
    assert stream_texts == batch_texts, (rows, batch_rows, stream_rows)
    assert len(set(stream_texts)) == len(stream_texts)
    # batch tiebreak: lowest id per surviving text
    by_text: dict[str, list[int]] = {}
    for i, t in rows:
        by_text.setdefault(t, []).append(i)
    for i, t in batch_rows:
        assert i == min(by_text[t]), (t, i, by_text[t])
    # stream survivors are genuine corpus rows
    assert set(stream_rows) <= set(rows)


def test_gopher_rules_streaming_equals_batch(spark, tmp_path_factory):
    """gopher_rules is a pure scan projection, so the SAME call works
    on a streaming frame with identical per-row results — the
    ingest-time quality gate composes for free (no stateful variant
    needed)."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.textstats import gopher_rules

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    batch = {
        r["doc_id"]: tuple(r)[1:]
        for r in gopher_rules(docs).collect()
    }
    src = tmp_path_factory.mktemp("gopher_stream")
    docs.coalesce(2).write.parquet(str(src / "in"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "in")
    )
    q = (
        gopher_rules(stream)
        .writeStream.format("memory").queryName("gopher_s")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in spark.sql("SELECT * FROM gopher_s").collect()
    }
    assert got == batch
