"""Differential test: every Snowball port vs the reference's libstemmer.

tests/data/stem_golden_<lang>.tsv holds (word, stem) pairs produced by
the reference's own bundled libstemmer (compiled from
/root/reference/src/libs/stemmer and driven over a vocabulary seeded
from each language's suffix inventory — scripts/gen_stem_golden.py).
Every port must match byte-for-byte on every pair: these are exactly
the stems the reference's buffer_stems (import.c:658-700) writes as
fs:stem quads.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from fourstore_spark.operators import stemmers as S
from fourstore_spark.operators.fulltext import _porter_stem
from fourstore_spark.operators.turkish import turkish_stem

DATA = Path(__file__).parent / "data"

PORTS = {
    "en": S.english_stem,
    "de": S.german_stem,
    "it": S.italian_stem,
    "ru": S.russian_stem,
    "es": S.spanish_stem,
    "pt": S.portuguese_stem,
    "fr": S.french_stem,
    "da": S.danish_stem,
    "no": S.norwegian_stem,
    "sv": S.swedish_stem,
    "nl": S.dutch_stem,
    "ro": S.romanian_stem,
    "fi": S.finnish_stem,
    "hu": S.hungarian_stem,
    "tr": turkish_stem,
}


@pytest.mark.parametrize("code", sorted(PORTS))
def test_port_matches_reference_exactly(code):
    fn = PORTS[code]
    pairs = [
        line.rstrip("\n").split("\t")
        for line in (DATA / f"stem_golden_{code}.tsv").open(encoding="utf-8")
    ]
    assert len(pairs) > 1000
    bad = [(w, fn(w), s) for w, s in pairs if fn(w) != s]
    assert not bad, f"{code}: {len(bad)}/{len(pairs)} mismatches, e.g. {bad[:5]}"


def test_classic_porter_module_exact():
    """The 'porter' module (classic Porter) port is byte-exact too —
    all 16 libstemmer modules plus porter match the oracle."""
    pairs = [
        line.rstrip("\n").split("\t")
        for line in (DATA / "stem_golden_porter.tsv").open(encoding="utf-8")
    ]
    bad = [(w, _porter_stem(w), s) for w, s in pairs if _porter_stem(w) != s]
    assert not bad, bad[:10]


def test_dispatch_aliases():
    assert S.stemmer_for("en-GB") is S.english_stem
    assert S.stemmer_for(None) is S.english_stem
    assert S.stemmer_for("FR") is S.french_stem
    assert S.stemmer_for("pt-BR") is S.portuguese_stem
    assert S.stemmer_for("ron") is S.romanian_stem
    assert S.stemmer_for("porter") is _porter_stem
    assert S.stemmer_for("fi") is S.finnish_stem
    assert S.stemmer_for("hun") is S.hungarian_stem
    assert S.stemmer_for("tr")("kitaplarımız") == turkish_stem(
        "kitaplarımız"
    )
    # unknown tags -> no stemmer, the literal gets no stem quads
    assert S.stemmer_for("xx") is None
