"""Randomized differentials for the r6 temporal/span operators.

- asof_join vs pandas.merge_asof(direction="backward"): an INDEPENDENT
  reference implementation of the same semantics (most-recent right row
  with right_ts <= left_ts per key, inclusive). Hypothesis generates
  keys/timestamps with deliberate collisions (small key space, coarse
  time grid) so equal-ts ties and empty-key cases are exercised.
- window_hash_spans vs a brute-force Python span computation: every
  window-token slice is hashed by literal text equality, duplicated
  positions merged by interval union — no hashing shortcuts shared with
  the implementation.
"""

from __future__ import annotations

import datetime as dt

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F  # noqa: F401  (parity with peers)

_SETTINGS = dict(
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "25")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = dt.datetime(2024, 1, 1)


def _ts(step):
    return _BASE + dt.timedelta(seconds=int(step) * 10)


# small key space + coarse grid => plenty of collisions
left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)),
    min_size=1,
    max_size=15,
)
right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 99)),
    min_size=0,
    max_size=15,
)


class TestAsofFuzz:
    @settings(**_SETTINGS)
    @given(left=left_rows, right=right_rows)
    def test_matches_pandas_merge_asof(self, spark, left, right):
        import pandas as pd

        from fourstore_spark.operators.temporal import asof_join

        lpdf = pd.DataFrame(
            {
                "lid": range(len(left)),
                "k": [k for k, _ in left],
                "ts": [_ts(s) for _, s in left],
            }
        )
        # pandas merge_asof resolves duplicate (key, ts) right rows to
        # the LAST row in sort order; asof_join picks the greatest
        # payload struct (ts, px) — pre-reduce to max px per (k, ts) so
        # both references see one canonical row, keeping the comparison
        # about the JOIN semantics
        rpdf = (
            pd.DataFrame(
                {
                    "k": [k for k, _, _ in right],
                    "ts": [_ts(s) for _, s, _ in right],
                    "px": [float(p) for _, _, p in right],
                }
            )
            .groupby(["k", "ts"], as_index=False)["px"]
            .max()
        )
        # an empty groupby result degrades dtypes (k -> float64), which
        # merge_asof rejects against the int64 left keys
        rpdf = rpdf.astype({"k": "int64", "px": "float64"})
        rpdf["ts"] = pd.to_datetime(rpdf["ts"])
        want = pd.merge_asof(
            lpdf.sort_values(["ts", "lid"]),
            rpdf.sort_values("ts"),
            on="ts",
            by="k",
            direction="backward",
            suffixes=("", "_r"),
        )
        ldf = spark.createDataFrame(lpdf)
        if len(rpdf):
            rdf = spark.createDataFrame(rpdf)
        else:
            rdf = spark.createDataFrame([], "k bigint, ts timestamp, px double")
        got = {
            r["lid"]: (r["ts_r"], r["px_r"])
            for r in asof_join(ldf, rdf, ["k"]).collect()
        }
        for _, row in want.iterrows():
            px = None if pd.isna(row["px"]) else row["px"]
            got_ts, got_px = got[row["lid"]]
            assert got_px == px, (row["lid"], got[row["lid"]], px)
            if px is not None:
                # the matched right ts must be the row carrying that px
                assert got_ts is not None and got_ts <= row["ts"]


docs = st.lists(
    st.lists(st.sampled_from("abcd"), min_size=0, max_size=14),
    min_size=1,
    max_size=6,
)


class TestSpanFuzz:
    @settings(**_SETTINGS)
    @given(docs=docs, window=st.integers(2, 4))
    def test_matches_bruteforce(self, spark, docs, window):
        from fourstore_spark.operators.dedup import window_hash_spans

        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        # brute force: count every window slice by its literal text
        from collections import Counter

        counts = Counter()
        for _, text in rows:
            t = text.split()
            for i in range(len(t) - window + 1):
                counts[" ".join(t[i : i + window])] += 1
        want = set()
        for did, text in rows:
            t = text.split()
            hits = [
                i
                for i in range(len(t) - window + 1)
                if counts[" ".join(t[i : i + window])] >= 2
            ]
            # merge while next start <= prev merged start + window
            spans = []
            for i in hits:
                if spans and i <= spans[-1][1] + window:
                    spans[-1][1] = i
                else:
                    spans.append([i, i])
            for s, e in spans:
                want.add((did, s, e + window))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in window_hash_spans(df, window=window).collect()
        }
        assert got == want


# equivalence of the salted two-phase variants with the single-window
# operators: same hypothesis input space, tiny chunk_seconds so the
# chunking actually splits (timestamps span ~200s; 30s chunks give up
# to 7 chunks per key) and boundary reconciliation is exercised hard
class TestSaltedEquivalence:
    @pytest.mark.slow  # ~31s salted-asof fuzz; test_skew_temporal keeps the 10^6-row deterministic pin
    @settings(**_SETTINGS)
    @given(left=left_rows, right=right_rows)
    def test_asof_salted_matches_plain(self, spark, left, right):
        from fourstore_spark.operators.temporal import (
            asof_join,
            asof_join_salted,
        )

        ldf = spark.createDataFrame(
            [(i, k, _ts(s)) for i, (k, s) in enumerate(left)],
            "lid long, k long, ts timestamp",
        )
        if right:
            rdf = spark.createDataFrame(
                [(k, _ts(s), float(p)) for k, s, p in right],
                "k long, ts timestamp, px double",
            )
        else:
            rdf = spark.createDataFrame(
                [], "k bigint, ts timestamp, px double"
            )
        plain = {
            r["lid"]: (r["ts_r"], r["px_r"])
            for r in asof_join(ldf, rdf, ["k"]).collect()
        }
        salted = {
            r["lid"]: (r["ts_r"], r["px_r"])
            for r in asof_join_salted(
                ldf, rdf, ["k"], chunk_seconds=30
            ).collect()
        }
        assert salted == plain

    @settings(**_SETTINGS)
    @given(rows=left_rows, gap=st.integers(5, 60))
    def test_sessionize_salted_matches_plain(self, spark, rows, gap):
        from fourstore_spark.operators.temporal import (
            sessionize,
            sessionize_salted,
        )

        ev = spark.createDataFrame(
            [(i, k, _ts(s)) for i, (k, s) in enumerate(rows)],
            "event_id long, user_id long, ts timestamp",
        )
        plain = {
            r["event_id"]: r["session_no"]
            for r in sessionize(ev, gap_seconds=gap).collect()
        }
        salted = {
            r["event_id"]: r["session_no"]
            for r in sessionize_salted(
                ev, gap_seconds=gap, chunk_seconds=30
            ).collect()
        }
        assert salted == plain
