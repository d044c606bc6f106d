"""LLM-pipeline operator tests over the documents/embeddings testdata."""

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    return con


def test_exact_dedup(docs, duck):
    from fourstore_spark.operators.dedup import exact_dedup

    got = {tuple(r) for r in exact_dedup(docs, ["text"], "doc_id").select("doc_id").collect()}
    exp = {
        tuple(r)
        for r in duck.execute(
            "SELECT MIN(doc_id) FROM documents GROUP BY text"
        ).fetchall()
    }
    assert got == exp


def test_charset_jaccard_matches_duckdb(docs, duck):
    from fourstore_spark.operators.dedup import charset_jaccard

    pairs = docs.alias("a").join(
        docs.alias("b"), F.col("a.doc_id") + 1 == F.col("b.doc_id")
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.round(charset_jaccard(F.col("a.text"), F.col("b.text")), 6).alias("j"),
    )
    got = dict(pairs.collect())
    exp = dict(
        duck.execute(
            """SELECT a.doc_id, ROUND(jaccard(a.text, b.text), 6)
               FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id"""
        ).fetchall()
    )
    assert got == exp


def test_minhash_lsh_finds_near_dups(spark):
    from fourstore_spark.operators.dedup import minhash_lsh_candidates

    rows = [
        (1, "the quick brown fox jumps over the lazy dog in the park today"),
        (2, "the quick brown fox jumps over the lazy dog in the park tonight"),
        (3, "completely different content about spark query optimization engines"),
        (4, "totally unrelated text regarding database storage internals design"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(df, "text", "doc_id").collect()
    }
    assert (1, 2) in pairs
    assert (3, 4) not in pairs


def test_simhash_near_dups(spark):
    from fourstore_spark.operators.dedup import simhash_dedup_candidates

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (3, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = simhash_dedup_candidates(df, "text", "doc_id")
    pairs = {(r.id_a, r.id_b): r.hamming for r in got.collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] < 16


def test_text_stats(docs, duck):
    from fourstore_spark.operators.textstats import text_stats

    got = text_stats(docs).select("doc_id", "n_tokens", "fingerprint")
    exp = duck.execute(
        """SELECT doc_id,
                  CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END,
                  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')))
           FROM documents"""
    ).fetchall()
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp}


def test_lang_id_deterministic(spark):
    from fourstore_spark.operators.textstats import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the park that day"),
            (2, "le chat et la souris sont dans la maison des voisins"),
            (3, "el perro y el gato que viven en la casa de los abuelos"),
            (4, "zzz qqq xxx yyy www"),
        ],
        "id long, text string",
    )
    got = dict(df.select("id", lang_id(F.col("text")).alias("l")).collect())
    assert got[1] == "en" and got[2] == "fr" and got[3] == "es" and got[4] == "und"


def test_cosine_topk_matches_duckdb(emb, duck):
    from fourstore_spark.operators.similarity import cosine_topk

    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(emb, queries, k=3).select("query_id", "vec_id", "rank")
    exp = duck.execute(
        """SELECT q.vec_id AS query_id, c.vec_id,
                  ROW_NUMBER() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(c.embedding::DOUBLE[],
                                                    q.embedding::DOUBLE[]) DESC,
                             c.vec_id ASC) AS rank
           FROM embeddings c, embeddings q
           WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
           QUALIFY rank <= 3"""
    ).fetchall()
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp}


def test_lsh_ann_reasonable(emb):
    from fourstore_spark.operators.similarity import cosine_topk, lsh_ann_topk

    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = lsh_ann_topk(emb, queries, k=5, nbits=4)
    # every returned neighbor must share the query's bucket and be ranked
    rows = approx.collect()
    assert len(rows) > 0
    assert all(r.rank <= 5 for r in rows)


def test_multimodal_plumbing(docs):
    from fourstore_spark.operators.multimodal import documents_as_media, extract_features

    media = documents_as_media(docs.limit(50))
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.feature) == 8 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic: same input -> same feature
    again = extract_features(media, dim=8).collect()
    assert {(r.media_id, tuple(r.feature)) for r in rows} == {
        (r.media_id, tuple(r.feature)) for r in again
    }


def test_multimodal_frame_sample_plan(spark):
    """Video frame-sampling plan: one row per (media_id, sampled ts) —
    explode of the timestamp sequence, no shuffle (the decode itself is
    the stubbed codec slot)."""
    from fourstore_spark.operators.multimodal import frame_sample_plan

    media = spark.createDataFrame(
        [(1, "video", 3500), (2, "video", 0), (3, "audio", 9000),
         (4, "video", None)],
        "media_id long, kind string, duration_ms long",
    )
    rows = frame_sample_plan(media, every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in rows)
    # 3500ms @1000 -> ts 0,1000,2000,3000; 0/None duration -> just ts 0;
    # audio rows are not sampled at all
    assert got == [(1, 0), (1, 1000), (1, 2000), (1, 3000), (2, 0), (4, 0)]


def test_multimodal_stub_raises(docs):
    from fourstore_spark.operators.multimodal import documents_as_media, extract_features

    media = documents_as_media(docs.limit(2))
    with pytest.raises(Exception):
        extract_features(media, decode_stub=False).collect()


def test_embedding_neardup_exact_matches_duckdb(emb, duck):
    from fourstore_spark.operators.similarity import cosine_neardup_pairs

    got = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in cosine_neardup_pairs(emb, threshold=0.4, k=64).collect()
    )
    want = sorted(
        (a, b, c)
        for a, b, c in duck.execute(
            "SELECT a.vec_id, b.vec_id, "
            "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS c "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) >= 0.4"
        ).fetchall()
    )
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, g), (_, _, w) in zip(got, want):
        assert abs(g - w) < 1e-6


def test_embedding_neardup_lsh_planted(spark):
    """Planted near-identical vectors: LSH-verified path finds them with
    exact precision (every returned pair really >= threshold)."""
    import random

    from fourstore_spark.operators.dedup import embedding_neardup
    from fourstore_spark.operators.similarity import cosine_neardup_pairs

    rng = random.Random(7)
    dim = 32
    base = [rng.gauss(0, 1) for _ in range(dim)]
    near = [x + rng.gauss(0, 0.01) for x in base]  # cosine ~0.9999
    rows = [(0, base), (1, near)] + [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(2, 40)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(df, threshold=0.95, dim=dim).collect()
    }
    assert (0, 1) in got
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(df, threshold=0.95).collect()
    }
    # precision: LSH-verified output is a subset of the exact answer
    assert got <= exact


def test_multimodal_real_decode(spark):
    """Real stdlib WAV/BMP decode: synthesized payloads with closed-form
    expected features."""
    import pandas as pd

    from fourstore_spark.operators.multimodal import (
        decode_bmp,
        decode_features,
        decode_wav,
        synth_bmp,
        synth_wav,
    )

    wav = synth_wav(16000, 3200, 1024)
    got = decode_wav(wav)
    assert got["duration_ms"] == 200 and got["sample_rate"] == 16000
    assert got["rms"] == got["peak"] == 1024 / 32768

    bmp = synth_bmp(7, 5, (255, 0, 128))
    img = decode_bmp(bmp)
    assert (img["width"], img["height"]) == (7, 5)
    assert img["mean_r"] == 1.0 and img["mean_g"] == 0.0

    media = spark.createDataFrame(
        [(1, wav), (2, bmp)], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in decode_features(media).collect()}
    assert rows[1]["kind"] == "audio" and rows[1]["n_bytes"] == len(wav)
    assert rows[2]["kind"] == "image" and rows[2]["width"] == 7


def test_multimodal_decode_soft_errors(spark):
    # a corrupt payload and an unsupported format must NOT kill the
    # stage: both complete with null features + a per-row err, while
    # good rows in the same batch decode normally
    from fourstore_spark.operators.multimodal import (
        decode_features,
        synth_wav,
    )

    wav = synth_wav(8000, 800, 256)
    media = spark.createDataFrame(
        [
            (1, b"\x89PNG...."),          # unsupported format
            (2, b"RIFFxxxxWAVEgarbage"),  # corrupt WAV
            (3, wav),                     # good row
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_features(media).collect()}
    assert "NotImplementedError" in rows[1]["err"]
    assert rows[1]["kind"] is None and rows[1]["n_bytes"] == 8
    assert rows[2]["err"] is not None and rows[2]["kind"] is None
    assert rows[3]["err"] is None and rows[3]["kind"] == "audio"


def test_multimodal_strict_mode_raises(spark):
    import pytest as _pytest

    from fourstore_spark.operators.multimodal import decode_features

    media = spark.createDataFrame(
        [(1, b"\x89PNG....")], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="codec"):
        decode_features(media, strict=True).collect()


def test_multimodal_header_probes(spark):
    """PNG/JPEG/GIF header-only probes: real dimensions from pure-stdlib
    marker parsing; pixel decode stays the codec-library slot."""
    import struct

    from fourstore_spark.operators.multimodal import (
        decode_features,
        probe_gif,
        probe_jpeg,
        probe_png,
    )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + b"\x08\x02\x00\x00\x00"
    )
    assert probe_png(png) == {"kind": "image", "width": 640, "height": 480}

    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9
    )
    assert probe_jpeg(jpeg) == {"kind": "image", "width": 640, "height": 480}

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert probe_gif(gif) == {"kind": "image", "width": 320, "height": 200}

    media = spark.createDataFrame(
        [(1, png), (2, jpeg), (3, gif), (4, b"\x89PNGbad")],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_features(media).collect()}
    for mid in (1, 2, 3):
        assert rows[mid]["kind"] == "image" and rows[mid]["err"] is None
    assert rows[1]["width"] == 640 and rows[3]["height"] == 200
    assert rows[4]["err"] is not None  # truncated signature: soft error


def test_multimodal_resize_real_bmp(spark):
    import struct

    import numpy as np

    from fourstore_spark.operators.multimodal import (
        decode_features,
        resize_bmp,
        resize_images,
        synth_bmp,
    )

    # 2x1 left-black right-white -> 4x2: quadrant-exact nearest neighbor
    raw = synth_bmp(2, 1, (0, 0, 0))
    # overwrite the right pixel with white (pixels start at offset 54)
    raw = raw[:54] + bytes([0, 0, 0, 255, 255, 255]) + raw[60:]
    big = resize_bmp(raw, 4, 2)
    off = struct.unpack_from("<I", big, 10)[0]
    stride = ((4 * 3 + 3) // 4) * 4
    arr = np.frombuffer(big, dtype="u1", count=stride * 2, offset=off)
    arr = arr.reshape(2, stride)[:, :12].reshape(2, 4, 3)
    assert (arr[:, :2] == 0).all() and (arr[:, 2:] == 255).all()

    media = spark.createDataFrame(
        [
            (1, bytearray(synth_bmp(8, 4, (200, 100, 50)))),
            (2, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30)),  # needs PIL
            (3, None),
        ],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in resize_images(media, 4, 2).collect()}
    assert got[1]["err"] is None and (got[1]["width"], got[1]["height"]) == (4, 2)
    assert got[2]["payload"] is None and "NotImplementedError" in got[2]["err"]
    assert "ValueError" in got[3]["err"]
    # resized payload round-trips through the real decoder: solid color
    # means survive the resize exactly
    back = decode_features(
        spark.createDataFrame(
            [(1, bytearray(got[1]["payload"]))], "media_id long, payload binary"
        )
    ).collect()[0]
    assert (back["width"], back["height"]) == (4, 2)
    assert (back["mean_r"], back["mean_g"], back["mean_b"]) == (
        round(200 / 255, 6), round(100 / 255, 6), round(50 / 255, 6))

    import pytest as _p
    with _p.raises(Exception, match="codec"):
        resize_images(media.where("media_id = 2"), 4, 2, strict=True).collect()


def test_chunk_documents_windows(spark):
    from fourstore_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
            (2, "a b"),
            (3, "   "),  # whitespace-only: no chunks
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # starts 0,3,6,9 -> 4 chunks, last one short
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in c1] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9",
    ]
    assert [r.n_tokens for r in c1] == [4, 4, 4, 1]
    # every token covered, consecutive chunks overlap by window-stride
    assert [r.chunk_text for r in by_doc[2]] == ["a b"]
    assert 3 not in by_doc


def test_chunk_documents_validates(spark):
    from fourstore_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, window=0, stride=1)
    with _pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=0)


def test_stratified_sample_nested_and_default(spark):
    from fourstore_spark.operators.sampling import (
        hash_bucket,
        stratified_sample,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
    )
    lo = stratified_sample(df, "id", "grp", {"even": 0.2, "odd": 0.5})
    hi = stratified_sample(df, "id", "grp", {"even": 0.6, "odd": 0.9})
    lo_ids = {r.id for r in lo.collect()}
    hi_ids = {r.id for r in hi.collect()}
    # nested property: a row kept at the lower fraction stays kept
    assert lo_ids <= hi_ids
    # groups without a fraction use the default (0.0 -> dropped)
    none_kept = stratified_sample(df, "id", "grp", {"even": 0.3})
    assert all(r.grp == "even" for r in none_kept.collect())
    # membership matches the documented bucket rule exactly
    manual = {
        r.id
        for r in df.withColumn("b", hash_bucket(F.col("id")))
        .where(
            ((F.col("grp") == "even") & (F.col("b") < 200000))
            | ((F.col("grp") == "odd") & (F.col("b") < 500000))
        )
        .collect()
    }
    assert manual == lo_ids


def test_subtract_corpus_fingerprint_match(spark):
    from fourstore_spark.operators.dedup import subtract_corpus

    corpus = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello world"),       # same fingerprint as 1
            (3, "totally new text"),
            (4, "Another doc."),
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(100, "HELLO  world"), (101, "another doc")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in subtract_corpus(corpus, ref).collect()}
    # 1 and 2 normalize to the reference's "hello world"; 4 to
    # "another doc"; only 3 survives — and payload columns pass through
    assert kept == {3}
    out = subtract_corpus(corpus, ref)
    assert out.columns == ["doc_id", "text"]


def test_image_ahash_and_neardup(spark):
    """Integer average-hash: determinism, upscale invariance through the
    real resize path, soft errors, and banded near-dup == brute force."""
    from fourstore_spark.operators.multimodal import (
        ahash_bmp,
        ahash_neardup_pairs,
        image_ahash,
        resize_bmp,
        synth_bmp_gradient,
    )

    imgs = {
        1: synth_bmp_gradient(9, 7, 10, 20, 35),
        2: synth_bmp_gradient(9, 7, 10, 20, 35),   # exact dup of 1
        3: synth_bmp_gradient(9, 7, 14, 20, 35),   # near dup (ham 2)
        4: synth_bmp_gradient(12, 9, 200, 3, 90),  # unrelated
        5: resize_bmp(synth_bmp_gradient(9, 7, 10, 20, 35), 18, 14),
    }
    media = spark.createDataFrame(
        [(k, v) for k, v in imgs.items()] + [(9, b"not a bmp")],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_ahash(media).collect()}
    assert rows[9]["err"] and rows[9]["ahash_lo"] is None
    h1 = (rows[1]["ahash_hi"], rows[1]["ahash_lo"])
    assert h1 == (rows[2]["ahash_hi"], rows[2]["ahash_lo"])
    # 2x nearest-neighbor upscale preserves every sampled bit
    assert h1 == (rows[5]["ahash_hi"], rows[5]["ahash_lo"])
    assert h1 == ahash_bmp(imgs[1])

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_neardup_pairs(image_ahash(media), max_hamming=6).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 5)] == 0 and pairs[(2, 5)] == 0
    assert 0 < pairs[(1, 3)] <= 6
    assert not any(4 in p or 9 in p for p in pairs)
    # banded candidates == brute force at max_hamming <= 7 (pigeonhole)
    import itertools
    want = {}
    ok = {k: (rows[k]["ahash_hi"], rows[k]["ahash_lo"]) for k in imgs}
    for a, b in itertools.combinations(sorted(ok), 2):
        ham = bin(ok[a][0] ^ ok[b][0]).count("1") + bin(
            ok[a][1] ^ ok[b][1]
        ).count("1")
        if ham <= 6:
            want[(a, b)] = ham
    assert pairs == want


def test_gopher_rules_reference(spark):
    """gopher_rules (Rae 2021 A1) vs a pure-Python replica on documents
    engineered to trip each rule individually; integer-scaled ratio
    flags must agree exactly."""
    import re

    from fourstore_spark.operators.textstats import (
        GOPHER_STOPWORDS,
        gopher_rules,
    )

    long_ok = "the boy said that they have fun with words " * 8  # 72 w
    docs = [
        (0, long_ok),                                   # passes all
        (1, "short doc"),                               # fails min_words
        (2, "the " + "a " * 80),                        # mean len < 3
        (3, ("# " + long_ok)),                          # symbols borderline
        (4, "\n".join("- bullet line the be to of and that" for _ in range(10))),
        (5, "\n".join((long_ok + "...") for _ in range(10))),  # ellipsis
        (6, "12 34 " * 40 + "the be"),                  # alpha < 80%
        (7, "zzz qqq " * 40),                           # no stopwords
        (8, ""),                                        # empty
        (9, "\tthe   be \nto of and that have with " * 10 + "wordy " * 30),
    ]

    def replica(text):
        t = re.split(r"[ \t\n\x0b\f\r]+", text.strip(" ").lower()) \
            if text.strip(" ").lower() else []
        # Java split drops trailing empties only
        while t and t[-1] == "":
            t.pop()
        lines = text.split("\n")
        nw, nl = len(t), len(lines)
        wc = sum(len(x) for x in t)
        syms = len(re.findall(r"#|\.\.\.|…", text))
        bul = sum(1 for x in lines if re.match(r"^[-*•]", x.lstrip(" ")))
        ell = sum(
            1 for x in lines if re.search(r"(\.\.\.|…)$", x.rstrip(" "))
        )
        alpha = sum(1 for x in t if re.search("[a-z]", x))
        stop = sum(1 for w in GOPHER_STOPWORDS if w in t)
        return (
            nw, nl,
            50 <= nw <= 100_000,
            nw > 0 and 3 * nw <= wc <= 10 * nw,
            10 * syms <= nw,
            10 * bul <= 9 * nl,
            10 * ell <= 3 * nl,
            5 * alpha >= 4 * nw,
            stop >= 2,
        )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_lines"], r["ok_words"], r["ok_mean_len"],
            r["ok_symbol"], r["ok_bullet"], r["ok_ellipsis"],
            r["ok_alpha"], r["ok_stop"],
        )
        for r in gopher_rules(df).collect()
    }
    for i, text in docs:
        assert got[i] == replica(text), (i, got[i], replica(text))
    # the engineered failures actually fail their intended rule
    flags = {
        r["doc_id"]: r for r in gopher_rules(df).collect()
    }
    assert flags[0]["passes"]
    assert not flags[1]["ok_words"]
    assert not flags[2]["ok_mean_len"]
    assert not flags[6]["ok_alpha"]
    assert not flags[7]["ok_stop"]


def test_punct_translate_matches_regex(spark):
    """r12 perf rewrite: the translate-based punctuation/word-char
    counters must equal the regex forms they replaced, including on
    unicode, control chars, case-changing-lower (Istanbul dotted I) and
    empty/null text."""
    from fourstore_spark.operators.textstats import (
        _ALNUM_WS, _WS, _count_inside, _count_outside,
    )

    rows = [
        "", " \t\n", "a\x0bb", "héllo, wörld!!",
        "İstanbul İİ", "emoji \U0001f600 ... test",
        "1 2\t3\n4\x0c5\r6", "plain words here.", None,
    ]
    sdf = spark.createDataFrame([(r,) for r in rows], "text string")
    t = F.col("text")
    old_word_chars = F.expr(
        r"aggregate(CASE WHEN length(trim(lower(text))) = 0 THEN array()"
        r" ELSE split(trim(lower(text)), '\\s+') END, 0L,"
        r" (a, x) -> a + length(x))"
    )
    for r in sdf.select(
        _count_outside(t, _ALNUM_WS).alias("n1"),
        F.regexp_count(t, F.lit(r"[^a-zA-Z0-9\s]")).alias("o1"),
        _count_inside(t, ".,;:!?").alias("n2"),
        F.regexp_count(t, F.lit(r"[.,;:!?]")).alias("o2"),
        _count_outside(F.lower(t), _WS).cast("long").alias("n3"),
        old_word_chars.alias("o3"),
    ).collect():
        assert r["n1"] == r["o1"], r
        assert r["n2"] == r["o2"], r
        assert r["n3"] == r["o3"], r


def test_ahash_neardup_pair_semantics(spark):
    """ahash_neardup_pairs must emit exactly one row per qualifying
    pair (any-band collision, hamming filter), matching a brute-force
    replica — pinned while r12 explored (and reverted) a shuffle-free
    dedup shape."""
    from fourstore_spark.operators.multimodal import ahash_neardup_pairs

    # groups of near-identical hashes (single-bit flips across both
    # words) plus isolated values; mirrors the trend harness synth
    h = spark.range(200).select(
        F.col("id").alias("media_id"),
        F.expr(
            "cast((id div 8) * 2654435761 % 4294967296 as bigint)"
        ).alias("ahash_hi"),
        F.expr(
            "cast((id div 8) * 40503 % 4294967296 as bigint) ^ "
            "(case when id % 8 = 0 then cast(0 as bigint) else "
            "shiftleft(cast(1 as bigint), cast(id % 29 as int)) end)"
        ).alias("ahash_lo"),
    )
    got = ahash_neardup_pairs(h, max_hamming=6)
    rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in got.collect()}
    # old-form replica: keep every band collision, hamming filter, dedup
    banded = []
    hv = {r["media_id"]: (r["ahash_hi"], r["ahash_lo"]) for r in h.collect()}
    exp = {}
    ids = sorted(hv)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            (ahi, alo), (bhi, blo) = hv[a], hv[b]
            ham = bin((ahi ^ bhi) & 0xFFFFFFFF).count("1") + bin(
                (alo ^ blo) & 0xFFFFFFFF
            ).count("1")
            collides = any(
                ((ahi if i >= 4 else alo) >> ((i % 4) * 8)) & 255
                == ((bhi if i >= 4 else blo) >> ((i % 4) * 8)) & 255
                for i in range(8)
            )
            if collides and ham <= 6:
                exp[(a, b)] = ham
    assert rows == exp
