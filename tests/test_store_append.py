"""Incremental store append (the reference's live 4s-import path:
import into a running KB without a rebuild, import.c:333-423) — set
semantics, pruned anti-join, property-table staleness protocol."""

from pyspark.sql import functions as F

from fourstore_spark import SparqlEngine
from fourstore_spark.sources.rdfio import quads_from_nt_text
from fourstore_spark.store import append_quads, read_manifest, write_store


def _build(spark, tmp_path):
    nt = "\n".join(
        [
            '<urn:a> <urn:p> "v1" .',
            "<urn:a> <urn:q> <urn:b> .",
            '<urn:b> <urn:p> "v2" .',
        ]
    )
    path = str(tmp_path / "store")
    write_store(quads_from_nt_text(spark, nt), path, partitions=2)
    return path


def test_append_new_quads_visible(spark, tmp_path):
    path = _build(spark, tmp_path)
    delta = quads_from_nt_text(spark, '<urn:c> <urn:p> "v3" .')
    man = append_quads(delta, path)
    assert man["rows"] == 4 and man["subjects_stale"] is True
    eng = SparqlEngine.from_store(spark, path)
    # stale property table -> engine falls back to quad scans
    assert eng.subjects is None
    got = sorted(
        r["o"] for r in eng.select(
            "SELECT ?o WHERE { ?s <urn:p> ?o }"
        ).collect()
    )
    assert got == ["v1", "v2", "v3"]


def test_append_dedups_existing(spark, tmp_path):
    path = _build(spark, tmp_path)
    delta = quads_from_nt_text(
        spark, '<urn:a> <urn:p> "v1" .\n<urn:c> <urn:p> "v3" .'
    )
    man = append_quads(delta, path)
    assert man["rows"] == 4  # the duplicate quad was dropped
    eng = SparqlEngine.from_store(spark, path)
    assert eng.select("SELECT ?s ?o WHERE { ?s <urn:p> ?o }").count() == 3


def test_append_rebuild_restores_property_table(spark, tmp_path):
    path = _build(spark, tmp_path)
    delta = quads_from_nt_text(spark, '<urn:c> <urn:p> "v3" .')
    man = append_quads(delta, path, rebuild_subjects=True)
    assert man["subjects_stale"] is False
    eng = SparqlEngine.from_store(spark, path)
    assert eng.subjects is not None
    got = sorted(
        r["o"] for r in eng.select(
            "SELECT ?o WHERE { ?s <urn:p> ?o }"
        ).collect()
    )
    assert got == ["v1", "v2", "v3"]


def test_append_downgrades_single_valued(spark, tmp_path):
    path = _build(spark, tmp_path)
    assert "urn:p" in read_manifest(path)["single_valued_preds"]
    # second value for an existing (p, s): fan-out is now 2
    delta = quads_from_nt_text(spark, '<urn:a> <urn:p> "v1b" .')
    man = append_quads(delta, path)
    assert "urn:p" not in man["single_valued_preds"]
    eng = SparqlEngine.from_store(spark, path)
    got = sorted(
        r["o"] for r in eng.select(
            "SELECT ?o WHERE { <urn:a> <urn:p> ?o }"
        ).collect()
    )
    assert got == ["v1", "v1b"]
    # rebuild keeps it multi-valued (array column) and correct
    man = append_quads(
        quads_from_nt_text(spark, "<urn:z> <urn:q> <urn:a> ."),
        path,
        rebuild_subjects=True,
    )
    assert "urn:p" not in man["single_valued_preds"]
    eng2 = SparqlEngine.from_store(spark, path)
    assert eng2.subjects is not None
    star = eng2.select(
        "SELECT ?s ?o ?b WHERE { ?s <urn:p> ?o ; <urn:q> ?b }"
    )
    assert sorted((r["s"], r["o"]) for r in star.collect()) == [
        ("urn:a", "v1"),
        ("urn:a", "v1b"),
    ]


def test_append_bnode_subject_not_deduped_against_uri(spark, tmp_path):
    # quad identity includes s_kind: a BNODE subject whose label equals an
    # existing URI subject's lexical form is a DIFFERENT quad and must
    # survive the set-semantics anti-join
    from fourstore_spark.model import (
        DEFAULT_GRAPH,
        KIND_BNODE,
        KIND_LITERAL,
        QUADS_SCHEMA,
    )

    path = _build(spark, tmp_path)
    delta = spark.createDataFrame(
        [
            (
                DEFAULT_GRAPH, "urn:a", KIND_BNODE, "urn:p",
                KIND_LITERAL, "v1", None, None, None,
            )
        ],
        QUADS_SCHEMA,
    )
    man = append_quads(delta, path)
    assert man["rows"] == 4  # appended, not dropped as a duplicate
    # and re-appending the same bnode quad IS dropped (idempotent)
    man2 = append_quads(delta, path)
    assert man2["rows"] == 4


def test_compact_store_defragments_and_rebuilds(spark, tmp_path):
    from fourstore_spark.store import (
        compact_store,
        pred_dir_map,
        _parquet_file_count,
    )

    path = _build(spark, tmp_path)
    # three appends fragment <urn:p>'s directory (>=1 new file each)
    for i in range(3):
        append_quads(
            quads_from_nt_text(spark, f'<urn:c{i}> <urn:p> "w{i}" .'), path
        )
    before = _parquet_file_count(pred_dir_map(path)["urn:p"])
    man = compact_store(spark, path)
    after = _parquet_file_count(pred_dir_map(path)["urn:p"])
    assert after < before
    assert "urn:p" in man["last_compaction"]
    assert man["last_compaction"]["urn:p"] == [before, after]
    # compaction rebuilt the stale property table by default
    assert man["subjects_stale"] is False
    eng = SparqlEngine.from_store(spark, path)
    assert eng.subjects is not None
    got = sorted(
        r["o"]
        for r in eng.select("SELECT ?o WHERE { ?s <urn:p> ?o }").collect()
    )
    assert got == ["v1", "v2", "w0", "w1", "w2"]
    # stats refreshed: fan-out is still 1 for urn:p, eligibility restored
    assert "urn:p" in man["single_valued_preds"]
    # idempotent: a second compaction finds nothing fragmented
    man2 = compact_store(spark, path)
    assert man2["last_compaction"] == {}


def test_compact_store_untouched_predicates_keep_files(spark, tmp_path):
    import os as _os

    from fourstore_spark.store import compact_store, pred_dir_map

    path = _build(spark, tmp_path)
    q_dir = pred_dir_map(path)["urn:q"]
    q_files = sorted(_os.listdir(q_dir))
    for i in range(3):
        append_quads(
            quads_from_nt_text(spark, f'<urn:c{i}> <urn:p> "w{i}" .'), path
        )
    compact_store(spark, path)
    # <urn:q> was never fragmented: its directory moved zero bytes
    assert sorted(_os.listdir(q_dir)) == q_files


def test_compact_store_recovers_from_crashed_swap(spark, tmp_path):
    # ADVICE r4: the per-directory swap renames the live dir aside
    # BEFORE deleting anything; a stale "_old_p=..." leftover from a
    # crashed prior swap must be ignored by readers (Spark skips
    # "_"-prefixed dirs) and cleaned up by the next compaction
    import os as _os
    import shutil as _shutil

    from fourstore_spark.store import compact_store, pred_dir_map

    path = _build(spark, tmp_path)
    for i in range(3):
        append_quads(
            quads_from_nt_text(spark, f'<urn:c{i}> <urn:p> "w{i}" .'), path
        )
    # plant a crash leftover: a full aside copy of the live dir
    live = pred_dir_map(path)["urn:p"]
    aside = _os.path.join(
        path, "_old_" + _os.path.basename(live).replace("=", "~")
    )
    _shutil.copytree(live, aside)
    # readers ignore it (no duplicated rows)
    eng = SparqlEngine.from_store(spark, path)
    got = sorted(
        r["o"]
        for r in eng.select("SELECT ?o WHERE { ?s <urn:p> ?o }").collect()
    )
    assert got == ["v1", "v2", "w0", "w1", "w2"]
    compact_store(spark, path)
    assert not _os.path.exists(aside)
    eng2 = SparqlEngine.from_store(spark, path)
    got2 = sorted(
        r["o"]
        for r in eng2.select("SELECT ?o WHERE { ?s <urn:p> ?o }").collect()
    )
    assert got2 == got
