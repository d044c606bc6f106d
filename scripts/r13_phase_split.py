"""r13 phase split for the SPARQL bench queries (VERDICT r12 #8).

For q1-q5, split each trial's wall into:
  build   - eng.query(text).flat(...): translator + py4j DataFrame
            construction (driver Python)
  plan    - forcing queryExecution().executedPlan(): analysis,
            optimization, physical planning (driver JVM)
  execute - .collect()/.count() on the planned Dataset

Usage: python scripts/r13_phase_split.py [n_trials]
Prints per-query best-of-N for each phase plus the share of
build+plan in the best total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("r13-phase-split")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    .config("spark.sql.files.minPartitionNum", cpus)
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from fourstore_spark.sources.relational import quads_from_sf_dir
from fourstore_spark.sparql.engine import SparqlEngine
from fourstore_spark.store import read_manifest, write_store

import __spark_entry__ as entry_mod

sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
store_path = f"/tmp/fourstore_store_{sf_tag}"
if not read_manifest(store_path):
    write_store(quads_from_sf_dir(spark, sf_dir), store_path)
eng = SparqlEngine.from_store(spark, store_path)

P = "urn:col:"
QUERIES = {
    "q1_agg": (entry_mod._FLAGSHIP, entry_mod._FLAGSHIP_TYPES, "collect"),
    "q2_join": (
        f"""SELECT ?cname ?nname ?rname WHERE {{
              ?c <{P}customer#c_name> ?cname ;
                 <{P}customer#c_nationkey> ?nat .
              ?nat <{P}nation#n_name> ?nname ;
                   <{P}nation#n_regionkey> ?reg .
              ?reg <{P}region#r_name> ?rname }}""",
        {},
        "count",
    ),
    "q3_optional": (
        f"""SELECT ?o ?pk WHERE {{
              ?o <{P}orders#o_orderstatus> ?st .
              OPTIONAL {{ ?li <{P}lineitem#l_orderkey> ?o ;
                              <{P}lineitem#l_partkey> ?pk }} }}""",
        {},
        "count",
    ),
    "q4_topk": (
        f"SELECT ?c ?bal WHERE {{ ?c <{P}customer#c_acctbal> ?bal }} "
        f"ORDER BY DESC(?bal) ?c LIMIT 100",
        {"bal": "num"},
        "collect",
    ),
    "q5_groupjoin": (
        f"""SELECT ?nname (SUM(?tp) AS ?total) (COUNT(?o) AS ?n)
            WHERE {{ ?o <{P}orders#o_custkey> ?c ;
                        <{P}orders#o_totalprice> ?tp .
                     ?c <{P}customer#c_nationkey> ?nat .
                     ?nat <{P}nation#n_name> ?nname }}
            GROUP BY ?nname""",
        {"total": "num", "n": "int"},
        "collect",
    ),
}

# warm-up (JIT, store footers)
eng.query(QUERIES["q1_agg"][0]).flat(**QUERIES["q1_agg"][1]).collect()

out = {}
for name, (text, types, action) in QUERIES.items():
    phases = {"build": [], "plan": [], "execute": [], "total": []}
    for _ in range(N):
        t0 = time.perf_counter()
        df = eng.query(text).flat(**types)
        t1 = time.perf_counter()
        # force full physical planning without executing
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        if action == "collect":
            df.collect()
        else:
            df.count()
        t3 = time.perf_counter()
        phases["build"].append(t1 - t0)
        phases["plan"].append(t2 - t1)
        phases["execute"].append(t3 - t2)
        phases["total"].append(t3 - t0)
    best_i = min(range(N), key=lambda i: phases["total"][i])
    row = {k: round(v[best_i], 3) for k, v in phases.items()}
    row["build_plan_share"] = round(
        (row["build"] + row["plan"]) / max(row["total"], 1e-9), 3
    )
    out[name] = row
    print(name, json.dumps(row), flush=True)

print("PHASE_SPLIT " + json.dumps(out))
spark.stop()
