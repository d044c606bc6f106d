"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Not in the reference (4store stores only RDF terms); this is the
training-pipeline pattern: media rides through Spark as `binary` + a
metadata struct, and decode/feature-extraction runs as Arrow-batched
Pandas functions over mapInPandas so each batch crosses the JVM/Python
boundary once.

The actual codec step is STUBBED (no image/audio libs in this container):
`decode_stub=True` produces deterministic fake features; passing
`decode_stub=False` raises NotImplementedError at the exact spot a real
decoder (PIL/torchaudio/pyav) plugs in. The Spark-side plumbing — schema,
batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text table as a media table (payload = utf-8 bytes) so the
    binary plumbing has test data without binary fixtures."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def extract_features(
    media: DataFrame, dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Batches arrive as Arrow; the per-batch loop is where a real decoder
    goes. The stub derives a deterministic `dim`-dim feature from payload
    bytes so downstream operators (dedup, ANN) are exercisable.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/pyav/torchaudio; "
                    "not available in this container"
                )
            feats = []
            nbytes = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    nbytes.append(None)
                    continue
                b = bytes(payload)
                nbytes.append(len(b))
                # deterministic fake embedding: byte-histogram moments
                vec = [0.0] * dim
                for i, by in enumerate(b):
                    vec[i % dim] += by / 255.0
                n = max(len(b), 1)
                feats.append([v / n for v in vec])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts).

    The decode of each frame is the stubbed step; the plan (explode of
    sample timestamps, partition-preserving) is the Spark-side work."""
    ts = F.sequence(
        F.lit(0),
        F.coalesce(F.col("duration_ms"), F.lit(0)),
        F.lit(every_ms),
    )
    return media.where(F.col("kind") == "video").select(
        "media_id", F.explode(ts).alias("frame_ts_ms")
    )
