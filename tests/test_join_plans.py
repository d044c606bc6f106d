"""Compatible-mapping join plan tests: maybe-unbound shared variables must
NOT plan a BroadcastNestedLoopJoin (the scale-killer); results must match
the NULL-is-wildcard semantics (binding_row_compare,
reference query-datatypes.c:476)."""

import pytest

from fourstore_spark.sparql.engine import SparqlEngine


@pytest.fixture(scope="module")
def eng(spark):
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    # tiger-mixed-optional shape: an OPTIONAL var joined again downstream
    nt = """
<urn:r1> <urn:type> "road" .
<urn:r2> <urn:type> "road" .
<urn:r3> <urn:type> "road" .
<urn:r1> <urn:name> "Main St" .
<urn:r2> <urn:name> "Oak Ave" .
<urn:n1> <urn:label> "Main St" .
<urn:n2> <urn:label> "Elm Rd" .
"""
    return SparqlEngine(spark, quads_from_nt_text(spark, nt))


OPTIONAL_REUSE = """
SELECT ?r ?nm ?other WHERE {
  ?r <urn:type> "road" .
  OPTIONAL { ?r <urn:name> ?nm }
  OPTIONAL { ?other <urn:label> ?nm }
}
"""


def test_optional_reuse_no_bnlj(eng):
    plan = eng.query(OPTIONAL_REUSE).explain("simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_optional_reuse_semantics(eng):
    rows = {tuple(r) for r in eng.select(OPTIONAL_REUSE).collect()}
    # r1 has name "Main St" which matches n1's label;
    # r2 has name "Oak Ave", no label match -> unbound ?other;
    # r3 has no name -> ?nm unbound -> second OPTIONAL's ?nm is a free
    # wildcard: every label row is compatible
    assert ("urn:r1", "Main St", "urn:n1") in rows
    assert ("urn:r2", "Oak Ave", None) in rows
    assert ("urn:r3", "Main St", "urn:n1") in rows
    assert ("urn:r3", "Elm Rd", "urn:n2") in rows


def test_minus_maybe_unbound(eng):
    # MINUS whose right side shares a maybe-unbound var
    q = """
    SELECT ?r WHERE {
      ?r <urn:type> "road" .
      OPTIONAL { ?r <urn:name> ?nm }
      MINUS { ?x <urn:label> ?nm }
    }
    """
    plan = eng.query(q).explain("simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    rows = {r[0] for r in eng.select(q).collect()}
    # r1's nm matches a label -> removed; r2's doesn't -> kept;
    # r3's nm is unbound -> no overlapping bound var -> kept
    assert rows == {"urn:r2", "urn:r3"}


def test_exists_maybe_unbound(eng):
    q = """
    SELECT ?r WHERE {
      ?r <urn:type> "road" .
      OPTIONAL { ?r <urn:name> ?nm }
      FILTER EXISTS { ?x <urn:label> ?nm }
    }
    """
    plan = eng.query(q).explain("simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    rows = {r[0] for r in eng.select(q).collect()}
    # r1: label exists; r2: no; r3: nm wildcard -> any label row compatible
    assert rows == {"urn:r1", "urn:r3"}


def test_manifest_broadcast_hint_at_default_threshold(spark, tmp_path):
    """A small dimension side must plan as BroadcastHashJoin at Spark's
    DEFAULT autoBroadcastJoinThreshold, driven by the store manifest's
    per-predicate statistics (F.broadcast hints), not by Spark's
    post-filter size guesses — which at scale exceed any threshold and
    silently degrade every dimension join to a shuffle."""
    from fourstore_spark.sources.rdfio import quads_from_nt_text
    from fourstore_spark.sparql.engine import SparqlEngine
    from fourstore_spark.store import write_store

    nt = "\n".join(
        f'<urn:item:{i}> <urn:dim> <urn:d{i % 3}> .\n'
        f'<urn:item:{i}> <urn:val> "{i}" .'
        for i in range(50)
    ) + "\n" + "\n".join(f'<urn:d{j}> <urn:dname> "dim{j}" .' for j in range(3))
    path = str(tmp_path / "store")
    manifest = write_store(quads_from_nt_text(spark, nt), path, partitions=2)
    assert manifest["pred_stats"]["urn:dname"][0] == 3
    eng = SparqlEngine.from_store(spark, path)
    q = """SELECT ?v ?dn WHERE {
             ?i <urn:dim> ?d ; <urn:val> ?v . ?d <urn:dname> ?dn }"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # default threshold, AQE off: the STATIC plan must already broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = eng.query(q).explain("simple")
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert eng.select(q).count() == 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_rid_join_keys_in_plan(spark):
    """Equi-joins key on the 8-byte term RID (xxhash64), not the term
    struct: the exchange/sort operates on longs (fs_rid parity,
    4s-hash.h:52)."""
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    nt = """
<urn:a> <urn:p> <urn:b> .
<urn:b> <urn:q> "x" .
"""
    eng = SparqlEngine(spark, quads_from_nt_text(spark, nt))
    plan = eng.query(
        "SELECT ?x WHERE { ?a <urn:p> ?b . ?b <urn:q> ?x }"
    ).explain("simple")
    assert "xxhash64" in plan, plan
    rows = eng.select("SELECT ?x WHERE { ?a <urn:p> ?b . ?b <urn:q> ?x }").collect()
    assert [r[0] for r in rows] == ["x"]


def test_single_valued_star_stats(spark, tmp_path):
    """Store stats (functional predicates) switch star scans to first()
    aggregation without changing results; multi-valued predicates keep
    the exact explode path."""
    from fourstore_spark.sources.rdfio import quads_from_nt_text
    from fourstore_spark.sparql.engine import SparqlEngine
    from fourstore_spark.store import write_store

    nt = """
<urn:a> <urn:one> "a1" .
<urn:a> <urn:many> "m1" .
<urn:a> <urn:many> "m2" .
<urn:b> <urn:one> "b1" .
<urn:b> <urn:many> "m3" .
<urn:c> <urn:one> "c1" .
"""
    path = str(tmp_path / "store")
    manifest = write_store(quads_from_nt_text(spark, nt), path, partitions=2)
    assert manifest["single_valued_preds"] == ["urn:one"]
    q = """SELECT ?s ?o ?m WHERE {
             ?s <urn:one> ?o ; <urn:many> ?m }"""
    plain = SparqlEngine(spark, quads_from_nt_text(spark, nt))
    stats = SparqlEngine.from_store(spark, path)
    expected = {
        ("urn:a", "a1", "m1"), ("urn:a", "a1", "m2"), ("urn:b", "b1", "m3"),
    }
    assert {tuple(r) for r in plain.select(q).collect()} == expected
    assert {tuple(r) for r in stats.select(q).collect()} == expected
    # the stats plan has no Generate (explode) for the functional predicate
    plan = stats.query("SELECT ?s ?o WHERE { ?s <urn:one> ?o ; <urn:one> ?o2 }").explain("simple")
    assert "Generate" not in plan


def test_star_scan_nested_schema_pruning(spark, tmp_path):
    """Property-table star scans must null-check the kind LEAF, not the
    whole struct: a struct-level isNotNull defeats Catalyst's nested
    pruning and the parquet scan decodes every leaf (incl. the graph
    string) of every predicate. Guard: the scan's ReadSchema carries no
    g leaf when no graph scoping applies."""
    import re

    from fourstore_spark.sources.rdfio import quads_from_nt_text
    from fourstore_spark.sparql.engine import SparqlEngine
    from fourstore_spark.store import write_store

    nt = """
<urn:a> <urn:one> "a1" .
<urn:a> <urn:two> "a2" .
<urn:b> <urn:one> "b1" .
<urn:b> <urn:two> "b2" .
"""
    path = str(tmp_path / "store_np")
    write_store(quads_from_nt_text(spark, nt), path, partitions=2)
    eng = SparqlEngine.from_store(spark, path)
    res = eng.query("SELECT ?s WHERE { ?s <urn:one> ?o ; <urn:two> ?m }")
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    subject_scans = [s for s in schemas if "struct<" in s and "kind" in s]
    assert subject_scans, plan
    for s in subject_scans:
        assert "g:string" not in s, s     # graph leaf pruned
        assert "lang:string" not in s, s  # unused leaves pruned


def test_slim_aggregate_path_matches_general(spark, tmp_path):
    """Store-proven uniform numeric datatypes switch SUM/AVG to the slim
    fixed-datatype path — results must be bit-identical to the general
    promotion-ladder path, across decimal/double/integer inputs,
    DISTINCT, and empty groups."""
    from fourstore_spark.sources.rdfio import quads_from_nt_text
    from fourstore_spark.sparql.engine import SparqlEngine
    from fourstore_spark.store import write_store

    XSD = "http://www.w3.org/2001/XMLSchema#"
    nt = "\n".join(
        [f'<urn:d{i}> <urn:dec> "{i}.25"^^<{XSD}decimal> .' for i in range(8)]
        + [f'<urn:d{i}> <urn:dbl> "{i}.5"^^<{XSD}double> .' for i in range(8)]
        + [f'<urn:d{i}> <urn:int> "{i * 7}"^^<{XSD}integer> .' for i in range(8)]
        + [f'<urn:d{i}> <urn:grp> "g{i % 3}" .' for i in range(8)]
        + [f"<urn:m{i}> <urn:of> <urn:d{i}> ." for i in range(8)]
    )
    path = str(tmp_path / "slim_store")
    manifest = write_store(quads_from_nt_text(spark, nt), path, partitions=2)
    assert set(manifest["pred_numeric_dt"]) == {
        "urn:dec", "urn:dbl", "urn:int"
    }
    stats = SparqlEngine.from_store(spark, path)
    plain = SparqlEngine(spark, quads_from_nt_text(spark, nt))
    queries = [
        """SELECT ?g (SUM(?a) AS ?sa) (AVG(?b) AS ?ab) (SUM(?c) AS ?sc)
           (SUM(DISTINCT ?a) AS ?sda)
           WHERE { ?d <urn:dec> ?a ; <urn:dbl> ?b ; <urn:int> ?c ;
                      <urn:grp> ?g } GROUP BY ?g ORDER BY ?g""",
        "SELECT (SUM(?v) AS ?s) (AVG(?v) AS ?a) WHERE "
        "{ ?d <urn:nosuch> ?v }",
        "SELECT (AVG(?c) AS ?a) WHERE { ?d <urn:int> ?c }",
        # provenance must survive the join (the q5 shape)
        "SELECT (SUM(?a) AS ?s) WHERE { ?m <urn:of> ?d . "
        "?d <urn:dec> ?a }",
    ]
    for q in queries:
        assert stats.query(q).serialize("json") == plain.query(q).serialize(
            "json"
        ), q


def test_unknown_predicate_short_circuits_to_broadcast(spark, tmp_path):
    """VERDICT r4 #6: a predicate absent from the manifest's pred_stats
    can only produce an empty scan — its leaf estimate is 0, so the
    branch broadcasts trivially and never anchors a SortMergeJoin."""
    from fourstore_spark.sources.rdfio import quads_from_nt_text
    from fourstore_spark.sparql.engine import SparqlEngine
    from fourstore_spark.store import write_store

    nt = "\n".join(
        f'<urn:item:{i}> <urn:dim> <urn:d{i % 3}> .' for i in range(50)
    )
    path = str(tmp_path / "store")
    write_store(quads_from_nt_text(spark, nt), path, partitions=2)
    eng = SparqlEngine.from_store(spark, path)
    # chain (not a shared-subject star, which would fold into one
    # grouped scan): the absent-predicate leaf must broadcast
    q = """SELECT ?i ?x WHERE {
             ?i <urn:dim> ?d . ?d <urn:no_such_predicate> ?x }"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # AQE off and a tiny threshold: only the est=0 manifest hint can
        # produce the broadcast in the static plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = eng.query(q).explain("simple")
        assert "SortMergeJoin" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        assert eng.select(q).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_big_side_never_auto_broadcast(spark, tmp_path):
    """The inverse guard: a side whose MANIFEST estimate is big must not
    be broadcast even when its physical file size slips under
    autoBroadcastJoinThreshold (a few-column property-table scan of
    millions of struct rows compresses far below its hashed-relation
    size; measured q3 at sf1: 4.3s SMJ -> 31s when Spark picked BHJ)."""
    from fourstore_spark.sources.rdfio import quads_from_nt_text
    from fourstore_spark.sparql.engine import SparqlEngine
    from fourstore_spark.store import write_store

    nt = "\n".join(
        f'<urn:o:{i}> <urn:st> "s" .\n'
        f'<urn:li:{i}> <urn:lok> <urn:o:{i}> .\n'
        f'<urn:li:{i}> <urn:lpk> "{i}" .'
        for i in range(40)
    )
    path = str(tmp_path / "store")
    write_store(quads_from_nt_text(spark, nt), path, partitions=2)
    eng = SparqlEngine.from_store(spark, path)
    # simulate the sf1+ regime: stats say both sides exceed the
    # broadcastable-row bound while the files stay tiny
    for p in ("urn:st", "urn:lok", "urn:lpk"):
        eng.pred_stats[p] = [10_000_000, 10_000_000]
    q = """SELECT ?o ?pk WHERE {
             ?o <urn:st> ?st .
             OPTIONAL { ?li <urn:lok> ?o ; <urn:lpk> ?pk } }"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1g")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = eng.query(q).explain("simple")
        assert "SortMergeJoin" in plan, plan
        assert "BroadcastHashJoin" not in plan, plan
        assert eng.select(q).count() == 40
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_resident_operators_have_no_exchange(spark):
    """The zero-shuffle claims are structural, not aspirational: the
    scan-projection operators (gopher_rules, canonicalize_url,
    quality/text expressions) must plan WITHOUT any Exchange — a
    regression that introduces a shuffle into these is a 100 TB
    scale bug even when results stay correct."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.scrubbing import canonicalize_url
    from fourstore_spark.operators.textstats import gopher_rules

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert "Exchange" not in _plan(gopher_rules(docs))
    assert "Exchange" not in _plan(
        docs.select(canonicalize_url(F.col("source")).alias("c"))
    )


def test_dsir_ratio_table_broadcasts(spark):
    """dsir_weights' whole scale argument is that the bucket-ratio
    table is bounded (<= buckets rows) and BROADCASTS onto the doc
    grams — the plan must carry a BroadcastHashJoin, never a
    corpus-side SortMergeJoin against the ratio table."""
    from fourstore_spark.operators.sampling import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dsir_weights(
        docs.where("doc_id % 7 != 0"), docs.where("doc_id % 7 = 0")
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_classifier_weight_table_broadcasts(spark):
    """classifier_logits' scale argument mirrors dsir's: the weight
    table is n_features-bounded by the hashing trick and BROADCASTS
    onto the exploded doc features — BroadcastHashJoin required, and
    the corpus side must never SortMergeJoin against the weights."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.classifier import classifier_logits

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    weights = spark.range(2048).select(
        F.col("id").alias("b"),
        ((F.col("id") * 7919) % 2_000_001 - 1_000_000).alias("w_micro"),
    )
    plan = _plan(classifier_logits(docs, weights, n_features=2048))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_cms_hll_single_shuffle(spark):
    """Sketch builds are one explode + one map-side-combined groupBy:
    exactly ONE Exchange in the plan (the cell/register aggregation),
    nothing corpus-shaped after it."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.lm import lm_tokens
    from fourstore_spark.operators.sketch import cms_build, hll_build

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(F.explode(lm_tokens(F.col("text"))).alias("tok"))
    for sk in (
        cms_build(toks, "tok", width=256, depth=4),
        hll_build(toks, "tok", m=256),
    ):
        plan = _plan(sk)
        assert plan.count("Exchange") == 1, plan[:3000]


def test_qsketch_single_shuffle(spark):
    """The quantile histogram is the same shape: one scan projection
    (the integer bucket expression) + one map-side-combined groupBy —
    exactly ONE Exchange, grouped or not."""
    from fourstore_spark.operators.sketch import qsketch_build

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for sk in (
        qsketch_build(docs, "n_chars"),
        qsketch_build(docs, "n_chars", group_cols=["lang"]),
    ):
        plan = _plan(sk)
        assert plan.count("Exchange") == 1, plan[:3000]


def test_cap_per_group_under_cap_groups_skip_window(spark):
    """cap_per_group's pre-pass claim: when EVERY group is under cap,
    the output equals the input (no rows ranked away) and the hot
    two-phase branch contributes nothing."""
    from fourstore_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, f"g{i % 5}") for i in range(50)], ["doc_id", "source"]
    )
    out = cap_per_group(df, "source", 100)
    assert out.count() == 50


def test_langid_weights_broadcast_and_edit_distance_no_cartesian(spark):
    """langid_scores' K x n_features weight stack must BROADCAST onto
    the gram stream (the classifier_logits pin, multi-class form), and
    edit_distance_pairs must never plan a cartesian product — its
    candidate join is a block-key equi-join by construction."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.classifier import langid_scores
    from fourstore_spark.operators.dedup import edit_distance_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lab = spark.createDataFrame(
        [("en", 0), ("fr", 1)], "lang string, li long"
    )
    weights = spark.range(512).crossJoin(lab).select(
        "lang", F.col("id").alias("b"),
        ((F.col("id") * 7919 + F.col("li")) % 1001 - 500).alias("w_micro"),
    )
    biases = lab.select("lang", (F.col("li") * 100).alias("bias_micro"))
    plan = _plan(langid_scores(docs, weights, biases, n_features=512))
    assert "BroadcastHashJoin" in plan, plan[:3000]

    pairs = edit_distance_pairs(
        docs.select("doc_id", "text"), max_dist=1
    )
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
