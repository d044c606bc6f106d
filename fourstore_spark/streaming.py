"""Structured Streaming operators: continuous RDF ingest, windowed event
rollups, streaming dedup, and stateful sessionization.

The reference is batch + incremental-update only (SURVEY §1.4); these are
the continuous versions of its ingest path and of the pipeline operators,
built on Spark's native streaming runtime:

- **stream_quads_from_nt**: a file-source stream of N-Triples/N-Quads
  lines parsed into quads — the continuous analogue of fs_import
  (import.c:333). Parsing is an Arrow-batched pandas UDF, one
  JVM->Python crossing per micro-batch.
- **stream_ingest**: appends parsed quads to a parquet store with
  exactly-once file-sink semantics (the streaming LOAD).
- **windowed_event_counts**: tumbling event-time windows + watermark —
  late rows beyond the watermark are dropped, state is bounded.
- **streaming_dedup**: watermarked dropDuplicates on the content
  fingerprint — the streaming form of operators.dedup.exact_dedup.
- **sessionize**: applyInPandasWithState gap-based sessionization —
  the custom-stateful-operator pattern (GroupState, per-key timeout).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from fourstore_spark.model import DEFAULT_GRAPH, QUADS_SCHEMA

_QUAD_STRUCT_DDL = (
    "struct<g:string, s:string, s_kind:tinyint, p:string, o_kind:tinyint,"
    " o_lex:string, o_dt:string, o_lang:string, o_num:double>"
)


def stream_quads_from_nt(
    spark: SparkSession,
    path: str,
    default_graph: str = DEFAULT_GRAPH,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming quads from a directory of N-Triples/N-Quads files."""
    from pyspark.sql.functions import pandas_udf

    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(path)

    @pandas_udf(_QUAD_STRUCT_DDL)
    def parse(batch: pd.Series) -> pd.DataFrame:
        from fourstore_spark.sources.rdfio import parse_nt_line

        cols = {f.name: [] for f in QUADS_SCHEMA.fields}
        for line in batch:
            try:
                q = parse_nt_line(line, default_graph)
            except ValueError:
                q = None  # skip malformed lines in the stream
            if q is None:
                q = (None,) * len(QUADS_SCHEMA.fields)
            for f, v in zip(QUADS_SCHEMA.fields, q):
                cols[f.name].append(v)
        return pd.DataFrame(cols)

    parsed = lines.select(parse(F.col("value")).alias("q"))
    return parsed.where(F.col("q.s").isNotNull()).select("q.*")


def stream_ingest(
    quads_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    trigger_available_now: bool = False,
):
    """Continuous LOAD: append the quad stream to a parquet store dir.
    The file sink's log gives exactly-once per input file."""
    writer = (
        quads_stream.writeStream.format("parquet")
        .option("path", store_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time rollup with bounded state: count + value sum
    per (window, key); rows later than the watermark are dropped."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "total",
        )
    )


def streaming_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each normalization
    fingerprint wins; state expires with the watermark."""
    from fourstore_spark.operators.textstats import fingerprint

    keyed = docs.withColumn("fingerprint", fingerprint(F.col(text_col)))
    return keyed.withWatermark(ts_col, watermark).dropDuplicates(
        ["fingerprint"]
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start", DoubleType()),  # epoch seconds
        StructField("last", DoubleType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _ts_us(epoch_sec: float) -> pd.Timestamp:
    # Spark timestamps are microsecond-precision; a float-seconds round-trip
    # leaves ns residue that Arrow refuses to cast down, so round to µs.
    return pd.Timestamp(int(round(epoch_sec * 1_000_000)), unit="us")


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (applyInPandasWithState + processing-time timeout): a session closes
    when a user is idle for gap_seconds; closed sessions are emitted."""

    def fn(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [_ts_us(start)],
                    "session_end": [_ts_us(last)],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        out = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        rows = pd.concat(list(pdf_iter)).sort_values(ts_col)
        for _, row in rows.iterrows():
            t = row[ts_col].timestamp()
            v = float(row["value"]) if "value" in row and pd.notna(row["value"]) else 0.0
            if start is None:
                start, last, n, total = t, t, 1, v
            elif t - last > gap_seconds:
                out.append((user, start, last, n, total))
                start, last, n, total = t, t, 1, v
            else:
                last = max(last, t)
                n += 1
                total += v
        state.update((start, last, n, total))
        state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [_ts_us(o[1]) for o in out],
                    "session_end": [_ts_us(o[2]) for o in out],
                    "n_events": [o[3] for o in out],
                    "total_value": [o[4] for o in out],
                }
            )

    return events.groupBy(F.col(user_col)).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
