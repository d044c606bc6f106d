"""CLI drivers: info / compact / rid subcommands (4s-info, 4s-rid
parity: src/frontend/4s-info.c, src/utilities/4s-rid.c)."""

import json

from pyspark.sql import functions as F

from fourstore_spark.cli import main
from fourstore_spark.sources.rdfio import quads_from_nt_text
from fourstore_spark.store import append_quads, write_store


def _build(spark, tmp_path):
    nt = '<urn:a> <urn:p> "v1" .\n<urn:b> <urn:p> "v2" .'
    path = str(tmp_path / "store")
    write_store(quads_from_nt_text(spark, nt), path, partitions=2)
    return path


def test_cli_info(spark, tmp_path, capsys):
    path = _build(spark, tmp_path)
    assert main(["info", path]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["rows"] == 2
    assert out["predicates"] == 1
    assert out["property_table"] is True


def test_cli_info_missing_store(tmp_path, capsys):
    assert main(["info", str(tmp_path / "nope")]) == 1


def test_cli_compact(spark, tmp_path, capsys):
    path = _build(spark, tmp_path)
    for i in range(3):
        append_quads(
            quads_from_nt_text(spark, f'<urn:c{i}> <urn:p> "w{i}" .'), path
        )
    assert main(["compact", path]) == 0
    out = json.loads(capsys.readouterr().out)
    assert "urn:p" in out and out["urn:p"][1] < out["urn:p"][0]


def test_cli_rid_matches_engine_term_rid(spark, capsys):
    from fourstore_spark.model import KIND_LITERAL, KIND_URI, term_struct
    from fourstore_spark.sparql.translator import term_rid

    cases = [
        ("<urn:a>", KIND_URI, "urn:a", None, None),
        ('"hi"@en-GB', KIND_LITERAL, "hi", None, "en-gb"),
        (
            '"5"^^<http://www.w3.org/2001/XMLSchema#integer>',
            KIND_LITERAL,
            "5",
            "http://www.w3.org/2001/XMLSchema#integer",
            None,
        ),
    ]
    for nt, kind, lex, dt, lang in cases:
        assert main(["rid", nt]) == 0
        got = int(capsys.readouterr().out.strip())
        expect = spark.range(1).select(
            term_rid(
                term_struct(
                    F.lit(kind).cast("tinyint"),
                    F.lit(lex),
                    F.lit(dt),
                    F.lit(lang),
                    F.lit(None).cast("double"),
                )
            ).alias("r")
        ).head()["r"]
        assert got == expect, nt


def test_cli_rid_bad_term(capsys):
    assert main(["rid", "not a term"]) == 1


def test_cli_rid_resolve_roundtrip(spark, tmp_path, capsys):
    path = _build(spark, tmp_path)
    for nt in ["<urn:a>", '"v1"']:
        assert main(["rid", nt]) == 0
        rid = capsys.readouterr().out.strip()
        assert main(["resolve", path, rid]) == 0
        out = capsys.readouterr().out.strip()
        assert out == f"{rid}\t{nt}", nt


def test_cli_resolve_unknown_rid(spark, tmp_path, capsys):
    path = _build(spark, tmp_path)
    assert main(["resolve", path, "12345"]) == 1
    assert "#unknown#" in capsys.readouterr().out
