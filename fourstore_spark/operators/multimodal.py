"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Not in the reference (4store stores only RDF terms); this is the
training-pipeline pattern: media rides through Spark as `binary` + a
metadata struct, and decode/feature-extraction runs as Arrow-batched
Pandas functions over mapInPandas so each batch crosses the JVM/Python
boundary once.

Decoding: REAL for PCM WAV (stdlib `wave`) and uncompressed 24-bit BMP
(struct + numpy) — no external media libs needed; `decode_features`
dispatches on magic bytes and extracts per-modality features (duration /
sample-rate / RMS / peak for audio, dimensions / channel means for
images). PNG/JPEG/GIF get REAL header-only probes (width/height parsed
from IHDR / SOFn / logical-screen descriptors in pure stdlib); their
PIXEL decode — and MP4 & friends entirely — still raises
NotImplementedError at the exact spot PIL/pyav/torchaudio plugs in;
`extract_features` keeps the byte-histogram stub so downstream operators
stay exercisable on arbitrary bytes.
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


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
        # soft-error channel: non-null iff this row's decode failed
        StructField("err", StringType(), True),
    ]
)


def decode_wav(b: bytes) -> dict:
    """Decode a PCM WAV payload (stdlib wave; 8/16-bit mono or
    interleaved): duration, rate, channels, RMS and peak of the
    normalized signal."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(b)) as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype="u1").astype("float64") - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {sw} needs a codec lib")
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    return {
        "kind": "audio",
        "sample_rate": rate,
        "n_channels": nch,
        "duration_ms": nframes * 1000 // rate,
        "rms": round(rms, 6),
        "peak": round(peak, 6),
    }


def decode_bmp(b: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER): dimensions
    and per-channel means of the pixel data (rows are 4-byte padded,
    bottom-up for positive heights, BGR order)."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    stride = ((w * 3 + 3) // 4) * 4
    rows = abs(h)
    arr = (
        np.frombuffer(b, dtype="u1", count=stride * rows, offset=data_off)
        .reshape(rows, stride)[:, : w * 3]
        .reshape(rows, w, 3)
        .astype("float64")
    )
    mean_bgr = arr.mean(axis=(0, 1)) / 255.0
    return {
        "kind": "image",
        "width": w,
        "height": rows,
        "mean_r": round(float(mean_bgr[2]), 6),
        "mean_g": round(float(mean_bgr[1]), 6),
        "mean_b": round(float(mean_bgr[0]), 6),
    }


def probe_png(b: bytes) -> dict:
    """PNG header-only probe: IHDR is always the first chunk after the
    8-byte signature — width/height are big-endian u32 at offsets 16/20.
    Pixel statistics would need zlib+filter decode, so only metadata."""
    import struct

    if len(b) < 24 or b[12:16] != b"IHDR":
        raise ValueError("truncated PNG")
    w, h = struct.unpack(">II", b[16:24])
    return {"kind": "image", "width": w, "height": h}


def probe_jpeg(b: bytes) -> dict:
    """JPEG header-only probe: walk the marker stream to the first SOFn
    (0xC0-0xCF except DHT 0xC4 / DAC 0xCC / RSTn): height/width are
    big-endian u16 at payload offsets 3/5. Entropy-coded pixel data needs
    a codec, so only metadata."""
    import struct

    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(b):
                break
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return {"kind": "image", "width": w, "height": h}
        i += 2 + seglen
    raise ValueError("no SOF marker found")


def probe_gif(b: bytes) -> dict:
    """GIF header-only probe: logical screen width/height are
    little-endian u16 at offsets 6/8."""
    import struct

    if len(b) < 10:
        raise ValueError("truncated GIF")
    w, h = struct.unpack("<HH", b[6:10])
    return {"kind": "image", "width": w, "height": h}


def synth_wav(rate: int, n_frames: int, amp: int) -> bytes:
    """Deterministic 16-bit mono PCM WAV: an alternating ±amp square wave
    (exact RMS and peak = amp/32768 — closed-form for oracles)."""
    import io
    import wave

    import numpy as np

    x = np.full(n_frames, amp, dtype="<i2")
    x[1::2] = -amp
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def synth_bmp(width: int, height: int, rgb: tuple) -> bytes:
    """Deterministic solid-color 24-bit BMP (channel means = rgb/255)."""
    import struct

    r, g, b = rgb
    stride = ((width * 3 + 3) // 4) * 4
    row = (bytes((b, g, r)) * width).ljust(stride, b"\x00")
    pixels = row * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def decode_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Real decode + per-modality feature extraction via mapInPandas.

    Dispatches on magic bytes: RIFF/WAVE -> decode_wav, BM -> decode_bmp.
    A payload that fails to decode — corrupt bytes, or a format needing a
    codec library (PIL/pyav/torchaudio, not in this container) — is a
    per-row SOFT error by default: null features plus an ``err`` column.
    One bad payload among billions must not fail the whole stage after N
    task retries (the reference's import path likewise soft-skips bad
    data rather than aborting the KB, error handling in import.c).
    ``strict=True`` restores the raise for fail-fast pipelines.
    One Arrow boundary crossing per batch; the decode loop is pure
    numpy/stdlib, no media libraries."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                base = {k.name: None for k in DECODED_SCHEMA.fields}
                base["media_id"] = mid
                if payload is None:
                    out.append(base)
                    continue
                b = bytes(payload)
                base["n_bytes"] = len(b)
                try:
                    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                        base.update(decode_wav(b))
                    elif b[:2] == b"BM":
                        base.update(decode_bmp(b))
                    elif b[:8] == b"\x89PNG\r\n\x1a\n":
                        # header-only: real dims, pixel stats need zlib
                        base.update(probe_png(b))
                    elif b[:3] == b"\xff\xd8\xff":
                        base.update(probe_jpeg(b))
                    elif b[:6] in (b"GIF87a", b"GIF89a"):
                        base.update(probe_gif(b))
                    else:
                        raise NotImplementedError(
                            "payload format needs a codec library "
                            "(PIL/pyav/torchaudio) — not in this container"
                        )
                except Exception as ex:
                    if strict:
                        raise
                    base = {k.name: None for k in DECODED_SCHEMA.fields}
                    base["media_id"] = mid
                    base["n_bytes"] = len(b)
                    base["err"] = f"{type(ex).__name__}: {ex}"
                out.append(base)
            yield pd.DataFrame(out)

    return media.mapInPandas(process, schema=DECODED_SCHEMA)


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


def resize_bmp(b: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of an uncompressed 24-bit BMP — a REAL
    resize in pure numpy (the PIL slot stays for other formats). Output
    is again a 24-bit BMP, so resized payloads round-trip through
    decode_bmp/decode_features."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    stride = ((w * 3 + 3) // 4) * 4
    rows = abs(h)
    arr = (
        np.frombuffer(b, dtype="u1", count=stride * rows, offset=data_off)
        .reshape(rows, stride)[:, : w * 3]
        .reshape(rows, w, 3)
    )
    yi = (np.arange(height) * rows) // height
    xi = (np.arange(width) * w) // width
    resized = arr[yi][:, xi]  # nearest neighbor
    out_stride = ((width * 3 + 3) // 4) * 4
    padded = np.zeros((height, out_stride), dtype="u1")
    padded[:, : width * 3] = resized.reshape(height, width * 3)
    pixels = padded.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII",
        40, width, height if h > 0 else -height, 1, 24, 0,
        len(pixels), 2835, 2835, 0, 0,
    )
    return header + pixels


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("err", StringType()),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """Batch image resize over (media_id, payload) binary columns.

    BMP payloads resize for real (numpy nearest-neighbor); every other
    format hits the clearly-marked codec-library slot and becomes a
    per-row soft error (strict=True raises) — same plumbing contract as
    decode_features: Arrow-batched mapInPandas, schema/partitioning
    real, decode stub isolated per format."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {
                    "media_id": mid, "payload": None,
                    "width": None, "height": None, "err": None,
                }
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    b = bytes(payload)
                    if b[:2] == b"BM":
                        row["payload"] = resize_bmp(b, width, height)
                        row["width"], row["height"] = width, height
                    else:
                        raise NotImplementedError(
                            "image format needs a codec library (PIL) — "
                            "not in this container"
                        )
                except Exception as ex:
                    if strict:
                        raise
                    row["err"] = f"{type(ex).__name__}: {ex}"
                out.append(row)
            yield pd.DataFrame(out)

    return media.mapInPandas(process, schema=RESIZED_SCHEMA)


def synth_bmp_gradient(
    width: int, height: int, base: int, sx: int, sy: int
) -> bytes:
    """Deterministic grayscale-gradient 24-bit BMP: the pixel at storage
    row j, column x has r=g=b=(base + x*sx + j*sy) % 256. Closed-form in
    its parameters, so perceptual-hash oracles can replay every bit."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    rows = []
    for j in range(height):
        row = bytearray(stride)
        for x in range(width):
            v = (base + x * sx + j * sy) % 256
            row[x * 3 : x * 3 + 3] = bytes((v, v, v))
        rows.append(bytes(row))
    pixels = b"".join(rows)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    return header + pixels


def ahash_bmp(b: bytes, hash_size: int = 8) -> tuple:
    """Average-hash of a 24-bit BMP in PURE INTEGER arithmetic:
    nearest-neighbor sample to hash_size x hash_size (the resize_bmp
    index mapping), integer luma L = 299r + 587g + 114b per sample, and
    bit (j*hash_size + x) set iff n*L >= sum(L) (n = hash_size^2) — no
    float mean, so the identical bits fall out of any engine.

    Returns (hi, lo): the upper/lower 32 bits as two non-negative ints
    (a single 64-bit int would overflow BIGINT construction in SQL
    replays; two halves band and XOR just as well)."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    stride = ((w * 3 + 3) // 4) * 4
    rows = abs(h)
    arr = (
        np.frombuffer(b, dtype="u1", count=stride * rows, offset=data_off)
        .reshape(rows, stride)[:, : w * 3]
        .reshape(rows, w, 3)
        .astype("int64")
    )
    yi = (np.arange(hash_size) * rows) // hash_size
    xi = (np.arange(hash_size) * w) // hash_size
    s = arr[yi][:, xi]  # (hash_size, hash_size, 3) BGR
    luma = 299 * s[:, :, 2] + 587 * s[:, :, 1] + 114 * s[:, :, 0]
    total = int(luma.sum())
    n = hash_size * hash_size
    bits = (n * luma.reshape(-1) >= total).astype("int64")
    hi = lo = 0
    for i, bit in enumerate(bits.tolist()):
        if not bit:
            continue
        if i < 32:
            lo |= 1 << i
        else:
            hi |= 1 << (i - 32)
    return hi, lo


def image_ahash(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """Perceptual average-hash per image payload: (media_id, ahash_hi,
    ahash_lo, err). Arrow-batched; non-BMP payloads soft-error like
    decode_features. The hash is integer-exact (see ahash_bmp), so
    near-duplicate detection over it is engine-portable end-to-end."""
    import pandas as pd

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {"media_id": mid, "ahash_hi": None,
                       "ahash_lo": None, "err": None}
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    hi, lo = ahash_bmp(bytes(payload), hash_size)
                    row["ahash_hi"], row["ahash_lo"] = hi, lo
                except NotImplementedError as exc:
                    row["err"] = f"unsupported: {exc}"
                except Exception as exc:  # malformed payload: soft error
                    row["err"] = str(exc)[:200]
                out.append(row)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        process,
        "media_id long, ahash_hi long, ahash_lo long, err string",
    )


def ahash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance over the 64-bit
    average-hash: (id_a, id_b, hamming), id_a < id_b.

    Pigeonhole banding (the SimHash trick, dedup.py simhash family): the
    64 bits split into 8 byte-bands; any pair within max_hamming <= 7
    differs in at most 7 bands, so it collides on >= 1 band — candidate
    generation is a band equi-join, never an all-pairs scan. The exact
    bit_count(XOR) verify runs on candidates only."""
    h = hashes.where(F.col("ahash_lo").isNotNull()).select(
        F.col(id_col).alias("id"), "ahash_hi", "ahash_lo"
    )

    # one scan, banded explode in the projection — NOT a union of
    # per-band selects, which would rescan the hash source per band per
    # join side. Band keys are built as ONE expr() SQL string: the
    # Column form cost ~28 structs x ~10 py4j round trips of driver
    # wall per query build (~1 s measured, r12 opt round); the parsed
    # expression tree and the key values are identical.
    def _bkey(i: int) -> str:
        return (
            f"(shiftright({'ahash_hi' if i >= 4 else 'ahash_lo'}, "
            f"{(i % 4) * 8}) & 255)"
        )

    if max_hamming <= 6:
        # two-band blocking (r12 opt round): hamming <= 6 flips bits in
        # at most 6 of the 8 byte-bands, so >= 2 bands stay identical
        # and every qualifying pair collides on >= 1 of the C(8,2)=28
        # band PAIRS. Joining on 16-bit pair keys (65536 buckets) instead
        # of 8-bit single keys (256) cuts the random-collision candidate
        # count — the join's quadratic term — by ~256x per band pair,
        # while the banded-row explode only grows 8 -> 28 (linear).
        # Values identical: the exact bit_count verify keeps the same
        # survivors, dropDuplicates the same pair set.
        from itertools import combinations

        bands = F.expr(
            "array("
            + ", ".join(
                f"struct({n} AS band, "
                f"(shiftleft({_bkey(i)}, 8) | {_bkey(j)}) AS key)"
                for n, (i, j) in enumerate(combinations(range(8), 2))
            )
            + ")"
        )
    else:
        # max_hamming == 7 only guarantees ONE identical band: fall back
        # to single-byte banding
        bands = F.expr(
            "array("
            + ", ".join(
                f"struct({i} AS band, {_bkey(i)} AS key)" for i in range(8)
            )
            + ")"
        )
    banded = h.select(
        "id", "ahash_hi", "ahash_lo", F.explode(bands).alias("bk")
    ).select("id", "ahash_hi", "ahash_lo", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    ham = (
        F.bit_count(F.col("a.ahash_hi").bitwiseXOR(F.col("b.ahash_hi")))
        + F.bit_count(F.col("a.ahash_lo").bitwiseXOR(F.col("b.ahash_lo")))
    ).cast("long")
    # hamming-verify INSIDE the join projection, BEFORE the pair dedup:
    # a pair colliding on k bands emits k duplicates, so deduping first
    # would shuffle every band collision — filtering first shrinks the
    # dedup exchange to actual near-duplicates.
    # (r12 note: a shuffle-free "keep only the first colliding band"
    # dedup was tried and REVERTED — the extra per-row band-mask CASE
    # runs on every join-candidate row, which at sf3 measured 8-14%
    # SLOWER than this small qualifying-pairs exchange; see
    # OPTIMIZATION_r12.md.)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
