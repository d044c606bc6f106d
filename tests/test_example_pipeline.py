"""The examples/curate_corpus.py composition must keep running as the
operator APIs evolve — it is the 'a user could switch to this repo'
demonstration, so an API break that strands it is a regression."""

from __future__ import annotations

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "curate_corpus",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "curate_corpus.py",
    ),
)
curate_corpus = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(curate_corpus)


@pytest.mark.slow  # ~108s full curation e2e; per-operator suites cover each stage
def test_curation_pipeline_end_to_end(spark):
    stats = curate_corpus.curate(spark, "/root/testdata/sf0.001")
    assert stats["input_docs"] == 500
    # each stage only removes rows, never invents them
    assert (
        stats["input_docs"]
        >= stats["after_rules"]
        >= stats["after_classifier"]
        >= stats["after_dedup"]
        >= stats["after_decontam"]
        >= stats["selected"]
        > 0
    )
    assert 0 < stats["packs"] <= stats["selected"]
    assert stats["shards"] == 8
    # sketch report: the selection has SOME vocabulary, and the HLL
    # estimate is a sane positive count (exactness is pinned in
    # tests/test_sketch.py; this is the composition check)
    assert stats["heavy_tokens_ge50"] >= 0
    assert stats["distinct_tokens_est"] > 0
    # langid step classified every doc into the labeled language set
    assert 1 <= stats["langid_langs"] <= 5
    # doc-length quantile sketch: ordered positive readouts
    assert 0 < stats["len_p50"] <= stats["len_p99"]


def test_retrieval_indexes_example(spark, tmp_path):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "build_retrieval_indexes",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "build_retrieval_indexes.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stats = mod.build_and_query(
        spark, "/root/testdata/sf0.001", str(tmp_path / "idx")
    )
    assert stats["bm25_matches"] > 0
    assert len(stats["top_text_ids"]) == 5
    assert stats["ann_queries"] == 3
    assert stats["ann_rows"] == 15  # 3 queries x k=5
