"""Sequence packing: group documents into fixed token-budget training
rows (greedy, deterministic, chunk-parallel).

LLM pre-training consumes fixed-length sequences; feeding one short
document per sequence wastes most of the context window, so pipelines
PACK multiple documents per sequence up to a token budget. Exact
bin-packing is NP-hard and needs global state; the production-standard
compromise is greedy sequential packing, which this operator makes
deterministic AND distributed:

- documents are bucketed into CHUNKS by id range (``chunk`` ids per
  chunk) — a pure column expression, so the assignment is reproducible
  on any engine/partitioning;
- each chunk is packed independently by a greedy in-id-order walk
  (Arrow-batched applyInPandas — per-chunk state only, chunks run in
  parallel, nothing global);
- pack ids are ``chunk * 2^32 + local``, globally unique without any
  coordination.

Cost of chunking vs a global greedy: at most one partially-filled pack
per chunk — negligible at chunk sizes of 10^5+ docs, and the price of
having NO sequential dependency across a 100 TB corpus.

A document longer than the budget gets a pack of its own (downstream
tokenizers truncate); packing never splits documents.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    chunk: int = 100_000,
) -> DataFrame:
    """Add a ``pack_id`` column assigning every row to a training
    sequence whose summed ``tokens_col`` is <= ``budget`` (oversized
    rows pack alone). Deterministic in (id, chunk, budget).

    Only ``(id, tokens, __chunk)`` — three fixed-width columns — ever
    cross the Arrow/Python boundary: at 100 TB the corpus text must NOT
    be serialized into pandas just to run a counter loop, so the greedy
    walk runs on a metadata projection and ``pack_id`` joins back by id
    (an id-equi join AQE can broadcast per chunk)."""
    from pyspark.sql.types import LongType, StructField, StructType

    meta = df.select(id_col, tokens_col).withColumn(
        "__chunk", (F.col(id_col) / chunk).cast("long")
    )
    # a FRESH StructType: StructType.add mutates in place, and a
    # DataFrame's cached schema must never be mutated
    out_schema = StructType(
        [df.schema[id_col], StructField("pack_id", LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        base = int(pdf["__chunk"].iloc[0]) << 32
        packs = []
        acc, pid = 0, 0
        for t in pdf[tokens_col]:
            t = int(t)
            if acc > 0 and acc + t > budget:
                pid += 1
                acc = 0
            acc += t
            packs.append(base + pid)
        return pd.DataFrame({id_col: pdf[id_col], "pack_id": packs})

    assigned = meta.groupBy("__chunk").applyInPandas(pack, out_schema)
    return df.join(assigned, id_col).select(*df.columns, "pack_id")


def packing_stats(packed: DataFrame, tokens_col: str, budget: int) -> DataFrame:
    """One-row packing quality summary: pack count, fill rate, and the
    invariants a correct packing must satisfy (no pack over budget
    unless it is a single oversized doc; every doc packed once)."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum(tokens_col).alias("tok"), F.count(F.lit(1)).alias("n")
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("tok").alias("total_tokens"),
        F.round(
            F.sum(F.least(F.col("tok"), F.lit(budget))).cast("double")
            / (F.count(F.lit(1)) * budget),
            6,
        ).alias("fill_rate"),
        F.sum(
            ((F.col("tok") > budget) & (F.col("n") > 1)).cast("int")
        ).alias("over_budget_multi"),
    )
