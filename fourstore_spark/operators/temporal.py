"""Temporal / ordered-event operators: as-of join and batch
sessionization.

The reference has no time-series operators at all (SURVEY §1.4, §2.5 —
closest is ORDER BY pagination); these are beyond-parity additions for
event-log and feature-engineering pipelines over the ``events`` table.

Both are built on window functions over ONE shuffle keyed by the entity
column — the Spark-native shape for ordered per-key passes:

- ``asof_join`` does NOT use a range self-join (O(n·m) pair blow-up and
  a BroadcastNestedLoop at worst): both sides union into one frame,
  sort within the key partition by (ts, side), and a running
  ``last(right_payload, ignorenulls=True)`` carries the most recent
  right row forward onto each left row.  Wall-clock is one exchange +
  one in-partition sort regardless of how many right rows precede each
  left row.  This is the classic merge-join formulation of ASOF used by
  kdb+/QuestDB/DuckDB, expressed declaratively so Catalyst/AQE pick the
  partitioning.
- ``sessionize`` is the batch twin of streaming.py's
  ``stream_sessionize`` (applyInPandasWithState): a lag() gap test and
  a running sum assign session ordinals in one window pass, then
  ``session_stats`` aggregates per session.

100 TB notes: the single shuffle is keyed by the entity (user) column —
the natural partitioning for event data, reusable across both
operators; no driver materialization; no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(c: Column) -> Column:
    """Seconds since epoch; tolerates TIMESTAMP_NTZ inputs (Spark 4 reads
    plain-micros parquet as NTZ, which can't cast straight to long)."""
    return c.cast("timestamp").cast("long")


def _auto_chunk_seconds(
    df: DataFrame,
    key_cols: list[str],
    ep: Column,
    target_rows: int = 200_000,
) -> int:
    """Derive a salting chunk width from the data instead of assuming
    the hot key spans many days (r8 verdict: a key with 10^8 events
    inside ONE day still landed one task under the fixed 86400 default).

    One cheap pre-pass — a map-side-combined per-key (min, max, count)
    aggregate folded to a single driver row — picks chunk_seconds so
    the DENSEST key's (key, chunk) groups hold ~``target_rows`` rows,
    assuming roughly uniform density over that key's span:
    ``chunk_seconds = min over hot keys of span_k * target / n_k``.
    Keys under ``target_rows`` never constrain the width; if no key is
    hot the whole span becomes one chunk (the salted operator then
    degenerates to the plain one plus a tiny summary join).

    Floor of 1 second: a sub-second burst (10^6 events sharing one
    timestamp) is un-splittable by TIME chunking by definition — at
    that point the key needs a value-based salt, not a temporal one.
    """
    row = (
        df.groupBy(*key_cols)
        .agg(
            F.min(ep).alias("__mn"),
            F.max(ep).alias("__mx"),
            F.count(F.lit(1)).alias("__n"),
        )
        .agg(
            F.min(
                F.when(
                    F.col("__n") > target_rows,
                    F.greatest(
                        F.lit(1),
                        (
                            (F.col("__mx") - F.col("__mn") + 1)
                            * target_rows
                            / F.col("__n")
                        ).cast("long"),
                    ),
                )
            ).alias("cs"),
            (F.max("__mx") - F.min("__mn") + 1).alias("span"),
        )
        .collect()[0]
    )
    if row["cs"] is not None:
        return int(row["cs"])
    return max(1, int(row["span"] or 1))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the single most recent right row with
    ``right_ts <= left_ts`` and equal ``on`` keys (backward / inclusive
    as-of match; left rows with no prior right row keep NULLs).

    Matches DuckDB ``ASOF LEFT JOIN`` semantics.  If several right rows
    share an exact (key, right_ts), the greatest payload struct wins —
    deterministic on any partitioning.

    Output: every left column, plus each non-key right column renamed
    ``<col><suffix>``.
    """
    if isinstance(on, str):
        on = [on]
    r_payload = [c for c in right.columns if c not in on]
    if right_ts not in r_payload:
        raise ValueError(f"right_ts {right_ts!r} must be a right column")

    r1 = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
    )
    r_t = r1.schema["__r"].dataType

    l1 = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    l_t = l1.schema["__l"].dataType

    u = l1.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(r_t)
    ).unionByName(
        r1.withColumn("__side", F.lit(0)).withColumn(
            "__l", F.lit(None).cast(l_t)
        )
    )
    # ties at equal ts: right (side 0) sorts first -> inclusive match;
    # several right rows at one (key, ts) sort by payload struct so the
    # running last() picks the greatest — dedup happens INSIDE the
    # window sort instead of costing a separate groupBy exchange
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    ).where(F.col("__side") == 1)
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns]
    out_cols += [F.col("__m")[c].alias(c + suffix) for c in r_payload]
    return matched.select(*out_cols)


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-key session ordinal: a new session starts whenever
    the gap to the previous event of the same key exceeds
    ``gap_seconds`` (same rule as streaming.py stream_sessionize).
    Adds a ``session_no`` column (0-based, in ts order per key);
    ``id_col`` breaks exact-ts ties deterministically.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    gap = _epoch_s(F.col(ts_col)) - F.lag(_epoch_s(F.col(ts_col))).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return events.withColumn(
        "session_no",
        (
            F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).cast("long"),
    )


def sessionize_salted(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    chunk_seconds: int | None = None,
    target_rows_per_chunk: int = 200_000,
) -> DataFrame:
    """``sessionize`` for SKEWED keys: identical output, two phases.

    ``chunk_seconds=None`` (default) derives the chunk width from a
    cheap per-key (min, max, count) pre-pass so the densest key's
    chunks hold ~``target_rows_per_chunk`` rows (see
    ``_auto_chunk_seconds`` — this runs one eager aggregate job at
    construction time); pass an explicit width to stay fully lazy.

    The plain operator windows over ``partitionBy(key)`` — a hot entity
    (one user with 10^8 events) lands on ONE task and AQE cannot split
    a window exchange the way it splits skewed joins.  Here the hot
    key's timeline is salted into ``chunk_seconds`` buckets:

    1. local pass — window over (key, chunk): per-chunk 0-based session
       ordinals.  The hot key now spreads over range/chunk_seconds
       tasks.
    2. boundary reconciliation — ONE ROW PER (key, chunk) summary
       (first/last ts, local session count); a window over this tiny
       table decides which chunk-initial sessions merge with the
       previous chunk's final session (gap <= gap_seconds) and assigns
       each chunk a global session offset.  The summary joins back on
       (key, chunk) — broadcast-sized in practice, an AQE-skew-splittable
       equi-join otherwise.

    global session_no = offset(chunk) + local_no - merges_with_prev.
    Equivalence with ``sessionize`` is property-tested
    (tests/test_fuzz_temporal.py) and the skew win is bounded in
    tests/test_skew_temporal.py.
    """
    ep = _epoch_s(F.col(ts_col))
    if chunk_seconds is None:
        chunk_seconds = _auto_chunk_seconds(
            events, [key_col], ep, target_rows_per_chunk
        )
    ev = events.withColumn("__chunk", F.floor(ep / chunk_seconds))

    w_local = Window.partitionBy(key_col, "__chunk").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    gap = ep - F.lag(ep).over(w_local)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    ev = ev.withColumn(
        "__local_no",
        (
            F.sum(new_sess).over(
                w_local.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - 1
        ).cast("long"),
    )

    summary = ev.groupBy(key_col, "__chunk").agg(
        F.min(ep).alias("__first"),
        F.max(ep).alias("__last"),
        (F.max("__local_no") + 1).alias("__n_local"),
    )
    w_key = Window.partitionBy(key_col).orderBy(F.col("__chunk").asc())
    merge = F.when(
        F.col("__first") - F.lag("__last").over(w_key) <= gap_seconds, 1
    ).otherwise(0)
    summary = summary.withColumn("__merge", merge.cast("long"))
    summary = summary.withColumn(
        "__offset",
        F.coalesce(
            F.sum(F.col("__n_local") - F.col("__merge")).over(
                w_key.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    ).select(key_col, "__chunk", "__merge", "__offset")

    out = ev.join(summary, [key_col, "__chunk"]).withColumn(
        "session_no",
        (F.col("__offset") + F.col("__local_no") - F.col("__merge")).cast(
            "long"
        ),
    )
    return out.drop("__chunk", "__local_no", "__merge", "__offset")


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
    chunk_seconds: int | None = None,
    target_rows_per_chunk: int = 200_000,
) -> DataFrame:
    """``asof_join`` for SKEWED keys: identical semantics, two phases.

    ``chunk_seconds=None`` (default) derives the chunk width from the
    two sides' combined per-key density (``_auto_chunk_seconds``, one
    eager pre-aggregate); pass an explicit width to stay fully lazy.

    Phase 1 runs the union + running-last window over (key, chunk)
    instead of (key): the hot key spreads across its time range.  A row
    whose most recent right match lives in an EARLIER chunk gets NULL
    locally; phase 2 computes each chunk's final right payload on a
    one-row-per-(key, chunk) summary, carries it forward with a window
    over that tiny table, joins the carry back on (key, chunk) and
    coalesces.  Carry ordering note: the per-chunk final payload is the
    window's own (ts, payload)-max, so cross-chunk ties resolve exactly
    like the unsalted operator.
    """
    if isinstance(on, str):
        on = [on]
    r_payload = [c for c in right.columns if c not in on]
    if right_ts not in r_payload:
        raise ValueError(f"right_ts {right_ts!r} must be a right column")

    r1 = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
    )
    r_t = r1.schema["__r"].dataType
    l1 = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    l_t = l1.schema["__l"].dataType

    u = l1.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(r_t)
    ).unionByName(
        r1.withColumn("__side", F.lit(0)).withColumn(
            "__l", F.lit(None).cast(l_t)
        )
    )
    if chunk_seconds is None:
        chunk_seconds = _auto_chunk_seconds(
            u, on, _epoch_s(F.col("__t")), target_rows_per_chunk
        )
    u = u.withColumn(
        "__chunk", F.floor(_epoch_s(F.col("__t")) / chunk_seconds)
    )
    w = (
        Window.partitionBy(*on, "__chunk")
        .orderBy(
            F.col("__t").asc(), F.col("__side").asc(), F.col("__r").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m_local", F.last("__r", ignorenulls=True).over(w))

    # one row per (key, chunk) — EVERY chunk, including right-less ones
    # (their carry must still flow through): the chunk's final RIGHT
    # payload is the (ts, payload)-max right row, exactly the value the
    # unsalted running-last would carry out of the chunk
    chunk_last = u.groupBy(*on, "__chunk").agg(
        F.max(
            F.when(F.col("__side") == 0, F.struct("__t", "__r"))
        )["__r"].alias("__chunk_final")
    )
    w_key = Window.partitionBy(*on).orderBy(F.col("__chunk").asc())
    carry = chunk_last.withColumn(
        "__carry",
        F.last("__chunk_final", ignorenulls=True).over(
            w_key.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).select(*on, "__chunk", "__carry")

    matched = (
        u.where(F.col("__side") == 1)
        .join(carry, [*on, "__chunk"])
        .withColumn("__m", F.coalesce("__m_local", "__carry"))
    )
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns]
    out_cols += [F.col("__m")[c].alias(c + suffix) for c in r_payload]
    return matched.select(*out_cols)


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: event count, start/end, duration, exact-
    decimal value total.  One window pass (sessionize) + one groupBy on
    the same key — AQE coalesces the second exchange into the first's
    partitioning."""
    s = sessionize(events, key_col, ts_col, id_col, gap_seconds)
    return s.groupBy(key_col, "session_no").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        (F.max(_epoch_s(F.col(ts_col))) - F.min(_epoch_s(F.col(ts_col))))
        .cast("long")
        .alias("duration_s"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("total_value"),
    )
