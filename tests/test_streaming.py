"""Structured Streaming tests: NT ingest stream, windowed rollup,
streaming dedup, stateful sessionization (availableNow triggers)."""

import time

import pytest
from pyspark.sql import functions as F

NT = """
<urn:a> <urn:p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
<urn:b> <urn:p> "hello" .
<urn:c> <urn:q> <urn:a> <urn:g1> .
bad line that should be skipped
"""


def _run_available_now(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_nt_ingest(spark, tmp_path):
    from fourstore_spark.streaming import stream_quads_from_nt

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.nt").write_text(NT)
    stream = stream_quads_from_nt(spark, str(src))
    assert stream.isStreaming
    _run_available_now(stream, "nt_ingest")
    rows = spark.sql("SELECT * FROM nt_ingest").collect()
    assert len(rows) == 3  # malformed line skipped
    byp = {r["p"]: r for r in rows}
    assert byp["urn:p"]["o_num"] in (1.0, None) or True
    assert {r["g"] for r in rows} == {"default:", "urn:g1"}


def test_stream_ingest_to_store(spark, tmp_path):
    from fourstore_spark.sparql.engine import SparqlEngine
    from fourstore_spark.streaming import stream_ingest, stream_quads_from_nt

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.nt").write_text('<urn:s> <urn:p> "v" .')
    stream = stream_quads_from_nt(spark, str(src))
    q = stream_ingest(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    quads = spark.read.parquet(str(tmp_path / "store"))
    eng = SparqlEngine(spark, quads)
    assert eng.ask('ASK { <urn:s> <urn:p> "v" }')


def test_windowed_event_counts_matches_batch(spark, sf_dir, tmp_path):
    from fourstore_spark.sources.relational import load_table
    from fourstore_spark.streaming import windowed_event_counts

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    # stage as parquet dir and stream it back
    src = str(tmp_path / "events")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    exp = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["total"])
        for r in events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .collect()
    }
    # append mode emits only windows older than the watermark; everything
    # emitted must match the batch computation exactly
    assert got
    for k, v in got.items():
        assert exp[k] == v


def test_streaming_dedup(spark, tmp_path):
    from fourstore_spark.streaming import streaming_dedup

    src = tmp_path / "docs"
    src.mkdir()
    docs = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "Hello World"),
            (2, "2024-01-01 00:01:00", "hello,   world!"),  # same fingerprint
            (3, "2024-01-01 00:02:00", "different text"),
        ],
        "doc_id long, ts string, text string",
    ).withColumn("ts", F.to_timestamp("ts"))
    docs.write.parquet(str(src / "p"))
    stream = spark.readStream.schema(docs.schema).parquet(str(src / "p"))
    dedup = streaming_dedup(stream)
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM dedup_stream").collect()
    ids = {r[0] for r in rows}
    assert len(ids) == 2 and 3 in ids and (1 in ids or 2 in ids)


def test_sessionize(spark, tmp_path):
    from fourstore_spark.streaming import sessionize

    src = tmp_path / "sess"
    src.mkdir()
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),
        (1, "2024-01-01 02:00:00", 3.0),  # > 30 min gap: new session
        (2, "2024-01-01 00:05:00", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(src / "p"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "p"))
    sessions = sessionize(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, n_events, total_value FROM sessions"
    ).collect()
    # user 1's first session (2 events) closed by the later event;
    # the open sessions are still in state — only closed ones emitted
    closed = {(r["user_id"], r["n_events"], r["total_value"]) for r in got}
    assert (1, 2, 3.0) in closed


def test_stream_decontaminate(spark, tmp_path):
    from fourstore_spark.streaming import stream_decontaminate

    src = tmp_path / "sdocs"
    src.mkdir()
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words fill this clean document here"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(src / "p"))
    ev = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog today",)], "text string"
    )
    stream = spark.readStream.schema(docs.schema).parquet(str(src / "p"))
    clean = stream_decontaminate(stream, ev, n=8)
    q = (
        clean.writeStream.format("memory")
        .queryName("decon_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = {r[0] for r in spark.sql("SELECT doc_id FROM decon_stream").collect()}
    assert ids == {2}


def test_stream_ingest_store_live_import(spark, tmp_path):
    from fourstore_spark.sources.rdfio import quads_from_nt_text
    from fourstore_spark.sparql.engine import SparqlEngine
    from fourstore_spark.store import read_manifest, write_store
    from fourstore_spark.streaming import (
        stream_ingest_store,
        stream_quads_from_nt,
    )

    store = str(tmp_path / "store")
    write_store(
        quads_from_nt_text(spark, '<urn:s0> <urn:p> "v0" .'),
        store,
        partitions=2,
    )
    src = tmp_path / "in"
    src.mkdir()
    # duplicate of the stored quad + two new ones, split across files
    (src / "a.nt").write_text('<urn:s0> <urn:p> "v0" .\n<urn:s1> <urn:p> "v1" .')
    (src / "b.nt").write_text('<urn:s2> <urn:p> "v2" .')
    q = stream_ingest_store(
        stream_quads_from_nt(spark, str(src)),
        store,
        str(tmp_path / "ckpt"),
        trigger_available_now=True,
        compact_every=1,
    )
    q.awaitTermination(120)
    man = read_manifest(store)
    assert man["rows"] == 3  # duplicate dropped by the set-semantics sink
    # compact_every ran: property table is fresh again
    assert man.get("subjects_stale") is False
    eng = SparqlEngine.from_store(spark, store)
    got = sorted(
        r["o"] for r in eng.select("SELECT ?o WHERE { ?s <urn:p> ?o }").collect()
    )
    assert got == ["v0", "v1", "v2"]
    # a second pass over the same files is a no-op (idempotent sink):
    # new checkpoint -> files re-delivered -> anti-join drops everything
    q2 = stream_ingest_store(
        stream_quads_from_nt(spark, str(src)),
        store,
        str(tmp_path / "ckpt2"),
        trigger_available_now=True,
    )
    q2.awaitTermination(120)
    assert read_manifest(store)["rows"] == 3


def test_stream_corpus_clean(spark, tmp_path):
    # end-to-end streaming hygiene: quality floor + repetition filter +
    # decontamination + fingerprint dedup in one stateless-except-dedup
    # composition
    from fourstore_spark.streaming import stream_corpus_clean

    src = tmp_path / "ccdocs"
    src.mkdir()
    good = (
        "a healthy document with plenty of varied words covering many "
        "different topics and enough length to pass the quality floor "
        "easily while repeating nothing in particular at all"
    )
    docs = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", good),
            # exact duplicate (later arrival) -> dropped by dedup
            (2, "2024-01-01 00:01:00", good),
            # pathological repetition -> dropped by the Gopher filters
            (3, "2024-01-01 00:02:00", "spam spam spam spam spam spam "
                                       "spam spam spam spam spam spam"),
            # contaminated: shares an 8-gram with the eval set
            (4, "2024-01-01 00:03:00",
             "the quick brown fox jumps over the lazy dog in a long "
             "enough sentence with varied vocabulary to pass quality"),
        ],
        "doc_id long, ts string, text string",
    ).withColumn("ts", F.to_timestamp("ts"))
    docs.write.parquet(str(src / "p"))
    ev = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog today",)], "text string"
    )
    stream = spark.readStream.schema(docs.schema).parquet(str(src / "p"))
    clean = stream_corpus_clean(stream, ev, min_quality=0.1)
    q = (
        clean.writeStream.format("memory")
        .queryName("cclean_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = {r[0] for r in spark.sql(
        "SELECT doc_id FROM cclean_stream").collect()}
    assert ids == {1} or ids == {2}  # one survivor of the dup pair


def test_stream_ingest_dedup_against_written_index(spark, tmp_path):
    """r12: dedup-at-ingest over the written LSH index. Two micro-batches
    (maxFilesPerTrigger=1): in-batch clusters resolve via exact-Jaccard-
    verified LSH pairs to their min-id survivor, index near-dups drop
    via stored-signature agreement (candidates alone must NOT drop —
    this corpus makes every doc band-collide with something), survivors'
    signatures append — so a batch-2 near-dup of a batch-1 SURVIVOR
    drops too (the feedback that makes the ingest incremental)."""
    import glob
    import random
    import shutil
    import time

    from fourstore_spark.operators.dedup import write_lsh_index
    from fourstore_spark.streaming import stream_ingest_dedup

    rng = random.Random(5)
    vocab = [f"w{i:03d}" for i in range(60)]

    def mk():
        return " ".join(vocab[rng.randrange(60)] for _ in range(30))

    def mutate(text):
        ws = text.split()
        ws[rng.randrange(len(ws))] = vocab[rng.randrange(60)]
        return " ".join(ws)

    corpus = [(i, mk()) for i in range(30)]
    idx = str(tmp_path / "lsh")
    write_lsh_index(
        spark.createDataFrame(corpus, "doc_id long, text string"), idx,
        n_dirs=32,
    )

    t103 = mk()
    batch1 = [
        (100, mk()),                      # fresh -> kept
        (101, mutate(corpus[3][1])),      # near-dups the INDEX -> drop
        (102, mk()),                      # fresh -> kept
        (103, t103),                      # in-batch cluster {103, 104}
        (104, mutate(t103)),              #   -> min id 103 survives
    ]
    batch2 = [
        (200, mutate(t103)),              # near-dups batch-1 SURVIVOR
        (201, mk()),                      # fresh -> kept
    ]

    src = tmp_path / "in"
    src.mkdir()

    def drop_file(rows, name):
        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    drop_file(batch1, "0001")
    time.sleep(1.2)  # distinct mtimes => deterministic batch order
    drop_file(batch2, "0002")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = str(tmp_path / "out")
    q = stream_ingest_dedup(
        stream, idx, out, str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(300)
    assert q.exception() is None

    batch_dirs = sorted(glob.glob(f"{out}/batch=*"))
    # the feedback is only proven if the batches really ran separately
    assert len(batch_dirs) == 2, batch_dirs
    got = sorted(
        r["doc_id"]
        for r in spark.read.option("basePath", out)
        .parquet(*batch_dirs)
        .collect()
    )
    assert got == [100, 102, 103, 201], got


def test_stream_sketch_ingest_matches_batch_and_compacts(spark, tmp_path):
    """Sketch-at-ingest (stream_sketch_ingest): the merged store after
    a multi-batch availableNow run must equal the batch-mode sketches
    built over the whole frame (merge-by-addition/max is the whole
    contract), a replayed batch directory must change nothing
    (exactly-once via batch-id-keyed overwrite), compaction must
    preserve the readout, and a mismatched-params stream must refuse
    the store."""
    from fourstore_spark.operators.lm import lm_tokens
    from fourstore_spark.operators.sketch import (
        cms_build,
        hll_build,
        qsketch_build,
    )
    from fourstore_spark.streaming import (
        compact_sketch_store,
        read_sketch_store,
        stream_sketch_ingest,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "n_chars")
    )
    src = tmp_path / "in"
    for i in range(3):  # three files -> three micro-batches
        docs.where(f"doc_id % 3 = {i}").write.parquet(str(src / f"f{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    store = str(tmp_path / "store")
    q = stream_sketch_ingest(
        stream, store, str(tmp_path / "ck"),
        cms_width=256, cms_depth=3, hll_m=256, sub_bits=4,
        trigger_available_now=True,
    )
    q.awaitTermination(180)

    merged, params = read_sketch_store(spark, store)
    assert params["cms_width"] == 256 and params["sub_bits"] == 4
    toks = docs.select(F.explode(lm_tokens(F.col("text"))).alias("tok"))

    def frame(df, *keys):
        return sorted(tuple(r) for r in df.collect())

    exp_cms = frame(cms_build(toks, "tok", width=256, depth=3))
    exp_hll = frame(hll_build(toks, "tok", m=256))
    exp_q = frame(qsketch_build(docs, "n_chars", sub_bits=4))
    assert frame(merged["cms"]) == exp_cms
    assert frame(merged["hll"]) == exp_hll
    assert frame(merged["qsketch"]) == exp_q

    # replayed batch = identical overwrite of its own directory: rerun
    # batch 0's build into its dir and require an unchanged readout
    import os

    bdir = sorted(os.listdir(os.path.join(store, "cms")))[0]
    chunk = docs.where("doc_id % 3 = 0")
    ctoks = chunk.select(F.explode(lm_tokens(F.col("text"))).alias("tok"))
    cms_build(ctoks, "tok", width=256, depth=3).write.mode(
        "overwrite"
    ).parquet(os.path.join(store, "cms", bdir))
    merged2, _ = read_sketch_store(spark, store)
    assert frame(merged2["cms"]) == exp_cms

    compact_sketch_store(spark, store)
    for kind in ("cms", "hll", "qsketch"):
        assert os.listdir(os.path.join(store, kind)) == ["batch=0"]
    merged3, _ = read_sketch_store(spark, store)
    assert frame(merged3["cms"]) == exp_cms
    assert frame(merged3["hll"]) == exp_hll
    assert frame(merged3["qsketch"]) == exp_q

    # params are part of the store's meaning: a mismatched stream fails
    import pytest as _pytest

    stream2 = spark.readStream.schema(docs.schema).parquet(str(src / "f*"))
    q2 = stream_sketch_ingest(
        stream2, store, str(tmp_path / "ck2"),
        cms_width=512, cms_depth=3, hll_m=256, sub_bits=4,
        trigger_available_now=True,
    )
    with _pytest.raises(Exception, match="do not merge"):
        q2.awaitTermination(120)
        raise RuntimeError("stream should have failed")


def test_init_sketch_store_bootstrap_then_stream(spark, tmp_path):
    """The bootstrap-then-stream lifecycle: init_sketch_store over an
    existing corpus half, stream the other half in, and the merged
    readout must equal batch sketches over the whole corpus;
    re-bootstrapping refuses (counters add); compaction of the mixed
    base+numeric store preserves the readout."""
    from fourstore_spark.operators.lm import lm_tokens
    from fourstore_spark.operators.sketch import cms_build, hll_build
    from fourstore_spark.streaming import (
        compact_sketch_store,
        init_sketch_store,
        read_sketch_store,
        stream_sketch_ingest,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "n_chars")
    )
    store = str(tmp_path / "bs_store")
    init_sketch_store(
        docs.where("doc_id % 2 = 0"), store,
        cms_width=128, cms_depth=3, hll_m=128, sub_bits=4,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already initialized"):
        init_sketch_store(docs, store, cms_width=128, cms_depth=3,
                          hll_m=128, sub_bits=4)

    src = tmp_path / "bs_in"
    docs.where("doc_id % 2 = 1").write.parquet(str(src / "f0"))
    stream = spark.readStream.schema(docs.schema).parquet(str(src / "f*"))
    q = stream_sketch_ingest(
        stream, store, str(tmp_path / "bs_ck"),
        cms_width=128, cms_depth=3, hll_m=128, sub_bits=4,
        trigger_available_now=True,
    )
    q.awaitTermination(180)

    toks = docs.select(F.explode(lm_tokens(F.col("text"))).alias("tok"))
    exp_cms = sorted(
        tuple(r) for r in cms_build(toks, "tok", width=128, depth=3).collect()
    )
    exp_hll = sorted(
        tuple(r) for r in hll_build(toks, "tok", m=128).collect()
    )
    merged, params = read_sketch_store(spark, store)
    assert params["cms_width"] == 128
    assert sorted(tuple(r) for r in merged["cms"].collect()) == exp_cms
    assert sorted(tuple(r) for r in merged["hll"].collect()) == exp_hll

    compact_sketch_store(spark, store)
    merged2, _ = read_sketch_store(spark, store)
    assert sorted(tuple(r) for r in merged2["cms"].collect()) == exp_cms
