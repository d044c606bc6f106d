"""Temporal operators (operators/temporal.py) and the r6 sampling/
similarity/dedup additions: as-of join, batch sessionization, weighted
corpus mixing, distributed k-means, SemDedup."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fourstore_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)


def _t(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            Row(tid=1, ts=_t(10), sym="A"),
            Row(tid=2, ts=_t(20), sym="A"),
            Row(tid=3, ts=_t(5), sym="B"),
            Row(tid=4, ts=_t(100), sym="C"),  # no quote for C
        ]
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=_t(8), px=1.0),
            Row(sym="A", ts=_t(10), px=2.0),  # equal-ts: inclusive match
            Row(sym="A", ts=_t(15), px=3.0),
            Row(sym="A", ts=_t(21), px=4.0),  # after both trades
            Row(sym="B", ts=_t(6), px=9.0),  # after B's only trade
        ]
    )


class TestAsofJoin:
    def test_backward_inclusive(self, trades, quotes):
        out = {
            r["tid"]: (r["px_r"], r["ts_r"])
            for r in asof_join(trades, quotes, ["sym"]).collect()
        }
        assert out[1] == (2.0, _t(10))  # equal ts matches (inclusive)
        assert out[2] == (3.0, _t(15))  # most recent prior, not first
        assert out[3] == (None, None)  # only later quotes exist
        assert out[4] == (None, None)  # key absent from right

    def test_left_rows_preserved(self, trades, quotes):
        out = asof_join(trades, quotes, ["sym"])
        assert out.count() == trades.count()
        assert set(out.columns) == {"tid", "ts", "sym", "px_r", "ts_r"}

    def test_duplicate_right_ts_deterministic(self, spark, trades):
        q = spark.createDataFrame(
            [
                Row(sym="A", ts=_t(8), px=1.0),
                Row(sym="A", ts=_t(8), px=7.0),  # same (key, ts)
            ]
        )
        rows = asof_join(trades, q, ["sym"]).where(F.col("tid") == 1)
        # greatest payload struct wins: (ts=_t(8), px=7.0)
        assert rows.collect()[0]["px_r"] == 7.0

    def test_string_key_accepted(self, trades, quotes):
        a = asof_join(trades, quotes, "sym").count()
        assert a == trades.count()


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        ev = spark.createDataFrame(
            [
                Row(event_id=i, user_id=1, ts=_t(s), value=1.0)
                for i, s in enumerate([0, 10, 20, 2000, 2010, 9000])
            ]
        )
        out = sessionize(ev, gap_seconds=1800)
        by_id = {r["event_id"]: r["session_no"] for r in out.collect()}
        assert [by_id[i] for i in range(6)] == [0, 0, 0, 1, 1, 2]

    def test_stats(self, spark):
        ev = spark.createDataFrame(
            [
                Row(event_id=0, user_id=1, ts=_t(0), value=1.5),
                Row(event_id=1, user_id=1, ts=_t(30), value=2.25),
                Row(event_id=2, user_id=1, ts=_t(5000), value=1.0),
                Row(event_id=3, user_id=2, ts=_t(0), value=4.0),
            ]
        )
        out = {
            (r["user_id"], r["session_no"]): r
            for r in session_stats(ev, gap_seconds=1800).collect()
        }
        s0 = out[(1, 0)]
        assert s0["n_events"] == 2 and s0["duration_s"] == 30
        assert float(s0["total_value"]) == 3.75
        assert out[(1, 1)]["n_events"] == 1
        assert out[(2, 0)]["n_events"] == 1

    def test_partitioning_invariance(self, spark):
        ev = spark.createDataFrame(
            [
                Row(event_id=i, user_id=i % 3, ts=_t(i * 700), value=1.0)
                for i in range(30)
            ]
        )
        a = sorted(
            map(tuple, sessionize(ev).select("event_id", "session_no").collect())
        )
        b = sorted(
            map(
                tuple,
                sessionize(ev.repartition(7))
                .select("event_id", "session_no")
                .collect(),
            )
        )
        assert a == b


class TestMixCorpus:
    def test_multiplicities(self, spark):
        from fourstore_spark.operators.sampling import hash_bucket, mix_corpus

        df = spark.createDataFrame(
            [Row(id=i, src="a" if i % 2 == 0 else "b") for i in range(200)]
        )
        out = mix_corpus(df, "id", "src", {"a": 2.5, "b": 0.0}, default=1.0)
        rows = out.collect()
        # b-rows all drop at weight 0
        assert all(r["src"] == "a" for r in rows)
        per_id = {}
        for r in rows:
            per_id.setdefault(r["id"], []).append(r["epoch"])
        buckets = {
            r["id"]: r["b"]
            for r in df.select("id", hash_bucket(F.col("id")).alias("b")).collect()
        }
        for i, epochs in per_id.items():
            want = 2 + (1 if buckets[i] < 500_000 else 0)
            assert sorted(epochs) == list(range(want)), i

    def test_weight_below_one_matches_sample(self, spark):
        from fourstore_spark.operators.sampling import mix_corpus, sample_by_hash

        df = spark.createDataFrame([Row(id=i, src="x") for i in range(500)])
        mixed = {
            r["id"] for r in mix_corpus(df, "id", "src", {"x": 0.3}).collect()
        }
        sampled = {r["id"] for r in sample_by_hash(df, "id", 0.3).collect()}
        assert mixed == sampled

    def test_negative_weight_rejected(self, spark):
        from fourstore_spark.operators.sampling import mix_corpus

        df = spark.createDataFrame([Row(id=1, src="x")])
        with pytest.raises(ValueError):
            mix_corpus(df, "id", "src", {"x": -1.0})


class TestKmeansSemdedup:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )

    def test_kmeans_fit_matches_numpy(self, emb):
        import numpy as np

        from fourstore_spark.operators.similarity import kmeans_fit

        rows = emb.orderBy("vec_id").collect()
        X = np.array([list(r["embedding"]) for r in rows], dtype="float64")
        k, iters = 4, 3
        cents = X[:k] / np.maximum(
            np.linalg.norm(X[:k], axis=1, keepdims=True), 1e-12
        )
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        for _ in range(iters):
            # cosine argmax, ties toward higher cell id (array_max rule)
            sims = Xn @ cents.T
            assign = (sims.shape[1] - 1) - np.argmax(sims[:, ::-1], axis=1)
            nxt = cents.copy()
            for c in range(k):
                m = X[assign == c]
                if len(m):
                    v = m.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 1e-12:
                        nxt[c] = v / n
            cents = nxt
        got = np.array(kmeans_fit(emb, k=k, iters=iters))
        assert np.allclose(got, cents, atol=1e-9)

    def test_semdedup_drop_rule(self, emb):
        from fourstore_spark.operators.dedup import semdedup, semdedup_pairs
        from fourstore_spark.operators.similarity import train_centroids

        cents = train_centroids(emb, k=6, iters=2)
        pairs = semdedup_pairs(emb, cents, threshold=0.4).collect()
        survivors = {
            r["vec_id"] for r in semdedup(emb, cents, threshold=0.4).collect()
        }
        dropped = {r["id_b"] for r in pairs}
        all_ids = {r["vec_id"] for r in emb.collect()}
        assert survivors == all_ids - dropped
        assert all(p["id_a"] < p["id_b"] and p["cos"] >= 0.4 for p in pairs)

    def test_semdedup_threshold_monotone(self, emb):
        from fourstore_spark.operators.dedup import semdedup
        from fourstore_spark.operators.similarity import train_centroids

        cents = train_centroids(emb, k=4, iters=1)
        hi = {r["vec_id"] for r in semdedup(emb, cents, threshold=0.9).collect()}
        lo = {r["vec_id"] for r in semdedup(emb, cents, threshold=0.3).collect()}
        assert lo <= hi  # lower threshold drops at least as much


class TestSpansQuantize:
    def test_duplicate_spans_merge(self, spark):
        from fourstore_spark.operators.dedup import window_hash_spans

        # doc 1 and 2 share tokens 0..5; doc 3 repeats its own prefix
        mk = lambda *w: " ".join(w)
        shared = [f"s{i}" for i in range(6)]
        df = spark.createDataFrame(
            [
                (1, mk(*shared, "a1", "a2", "a3")),
                (2, mk("b0", *shared, "b1", "b2")),
                (3, mk("c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7")),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
            for r in window_hash_spans(df, window=3, min_count=2).collect()
        }
        # doc1: windows at 0..3 are shared 3-grams (s0..s5 -> 4 windows)
        assert out[1] == (0, 6, 4)
        # doc2: same grams shifted one right
        assert out[2] == (1, 7, 4)
        assert 3 not in out  # unique text: no spans

    def test_duplicate_spans_within_doc(self, spark):
        from fourstore_spark.operators.dedup import window_hash_spans

        df = spark.createDataFrame(
            [(1, "x y z q r x y z")], ["doc_id", "text"]
        )
        rows = window_hash_spans(df, window=3, min_count=2).collect()
        # "x y z" occurs twice WITHIN the doc -> two merged spans
        got = sorted((r["span_start"], r["span_end"]) for r in rows)
        assert got == [(0, 3), (5, 8)]


    def test_remove_duplicate_spans(self, spark):
        from fourstore_spark.operators.dedup import remove_duplicate_spans

        mk = lambda *w: " ".join(w)
        shared = [f"s{i}" for i in range(6)]
        df = spark.createDataFrame(
            [
                (1, mk(*shared, "a1", "a2", "a3")),
                (2, mk("b0", *shared, "b1", "b2")),
                (3, mk("c0", "c1", "c2", "c3")),
                (4, "   "),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: (r["text"], r["n_spans"], r["n_tokens_removed"])
            for r in remove_duplicate_spans(df, window=3).collect()
        }
        # the shared 6-token run is cut from BOTH docs (drop-all)
        assert out[1] == ("a1 a2 a3", 1, 6)
        assert out[2] == ("b0 b1 b2", 1, 6)
        # untouched docs pass through (whitespace-normalized)
        assert out[3] == ("c0 c1 c2 c3", 0, 0)
        assert out[4] == ("", 0, 0)

    def test_remove_duplicate_spans_whole_doc(self, spark):
        from fourstore_spark.operators.dedup import remove_duplicate_spans

        df = spark.createDataFrame(
            [(1, "x y z"), (2, "x y z")], ["doc_id", "text"]
        )
        out = {
            r["doc_id"]: (r["text"], r["n_tokens_removed"])
            for r in remove_duplicate_spans(df, window=3).collect()
        }
        # fully-duplicated docs empty out on both sides
        assert out[1] == ("", 3) and out[2] == ("", 3)

    def test_quantize_roundtrip_bound(self, spark, sf_dir):
        from fourstore_spark.operators.similarity import (
            dequantize_embeddings,
            quantize_embeddings,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
        q = quantize_embeddings(emb)
        rows = q.collect()
        assert all(
            -127 <= x <= 127 for r in rows for x in r["qvec"]
        )
        rt = dequantize_embeddings(q).alias("r").join(emb.alias("o"), "vec_id")
        err = rt.select(
            F.expr(
                "max(aggregate(zip_with(r.embedding, o.embedding,"
                " (a,b) -> abs(cast(a as double) - cast(b as double))),"
                " cast(0.0 as double), (acc,x) -> greatest(acc,x)))"
            ).alias("e")
        ).collect()[0]["e"]
        max_scale = max(r["scale"] for r in rows)
        assert err <= max_scale / 2 + 1e-12

    def test_quantize_zero_vector(self, spark):
        from pyspark.sql.types import (
            ArrayType,
            FloatType,
            LongType,
            StructField,
            StructType,
        )

        from fourstore_spark.operators.similarity import quantize_embeddings

        schema = StructType(
            [
                StructField("vec_id", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        )
        df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], schema)
        r = quantize_embeddings(df).collect()[0]
        assert r["scale"] == 0.0 and list(r["qvec"]) == [0, 0, 0]


class TestShardCorpus:
    def test_assignment_stable_and_dense(self, spark, sf_dir):
        from fourstore_spark.operators.packing import shard_corpus

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id"
        )
        a = shard_corpus(docs, "doc_id", 5).collect()
        b = shard_corpus(docs.repartition(13), "doc_id", 5).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        by_shard = {}
        for r in a:
            assert 0 <= r["shard"] < 5
            by_shard.setdefault(r["shard"], []).append(r)
        for rows in by_shard.values():
            rows.sort(key=lambda r: r["doc_id"])
            assert [r["shard_pos"] for r in rows] == list(range(len(rows)))

    def test_bad_shards_rejected(self, spark):
        from pyspark.sql import Row

        from fourstore_spark.operators.packing import shard_corpus

        df = spark.createDataFrame([Row(doc_id=1)])
        with pytest.raises(ValueError):
            shard_corpus(df, "doc_id", 0)
