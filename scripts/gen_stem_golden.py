"""Generate golden (word TAB stem) fixtures for the Snowball stemmers.

Authoring-time tool: compiles the reference's bundled libstemmer
(/root/reference/src/libs/stemmer — the exact code 4store links in
buffer_stems, import.c:676) into /tmp and runs a synthetic vocabulary
through it, writing tests/data/stem_golden_<lang>.tsv. The vocabulary
is seeded from each language's own suffix inventory (parsed out of the
generated among tables in stem_UTF_8_<lang>.c) appended to roots of
varied lengths, so region-boundary (R1/R2/RV) conditions get dense
coverage. Tests only READ the TSVs; regeneration needs gcc + the
reference checkout (same oracle pattern as testing/golden_httpd.py).

Usage: python scripts/gen_stem_golden.py [lang ...]
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REF = Path("/root/reference/src/libs/stemmer")
OUT = Path(__file__).resolve().parent.parent / "tests" / "data"
BIN = Path("/tmp/stemref/stemwords")

LANGS = {
    "danish": "da", "dutch": "nl", "english": "en", "finnish": "fi",
    "french": "fr", "german": "de", "hungarian": "hu", "italian": "it",
    "norwegian": "no", "porter": "porter", "portuguese": "pt",
    "romanian": "ro", "russian": "ru", "spanish": "es", "swedish": "sv",
    "turkish": "tr",
}

# per-language root alphabets: plain roots plus accent-bearing ones so
# vowel-marking preludes (u/i/y upper-casing, umlauts) are exercised
ROOTS = {
    "default": [
        "b", "ab", "abc", "abab", "tr", "str", "best", "absol",
        "katal", "plen", "kontr", "aberr", "belebe", "obstin",
        "a", "e", "ea", "aui", "xyx", "onon", "q", "qu",
    ],
    "da": ["hund", "aabenbar", "sprog", "følelse", "kærlig", "indtag"],
    "no": ["hund", "vakker", "følelse", "nærling", "barnsleg", "hetsl"],
    "sv": ["hund", "vacker", "känsla", "klokast", "jämlik", "full", "lös"],
    "nl": ["lop", "licham", "gemeen", "vrij", "huiz", "koei", "baard",
           "held", "kapp", "bomen", "politie"],
    "fr": ["chant", "continu", "propos", "tap", "col", "par", "vend",
           "copi", "plai", "essai", "croy", "main", "éternell"],
    "es": ["cant", "torn", "compr", "practic", "logic", "cariñ",
           "yendo", "tenu", "averigu"],
    "pt": ["cant", "propag", "veloc", "amorosament", "vaç", "logic",
           "fossilizaç", "seguiç"],
    "de": ["aufricht", "keit", "lieb", "beweg", "gross", "mäßig",
           "gläubig", "aberglaub"],
    "it": ["cant", "logic", "pronunc", "vergogn", "usufrutt", "poch",
           "propagand", "fin"],
    "ru": ["вод", "книг", "стол", "важн", "перепечат", "насекомоядн"],
    "fi": ["kala", "taka", "edellyt", "voi", "kirjoit", "epäjärjest"],
    "hu": ["babá", "kert", "fiók", "asztal", "csap", "borzalm"],
    "ro": ["cânt", "copil", "floar", "frumuse", "bucuri", "limb"],
    "tr": ["kitap", "soba", "çilek", "araba", "görmek", "kalem"],
    "en": ["connect", "relat", "controll", "hopp", "feed", "happi",
           "generous", "motor", "cry"],
    "porter": ["connect", "relat", "controll", "hopp", "feed", "happi",
               "generous", "motor", "cry"],
}


def suffixes(lang_module: str) -> list[str]:
    """Parse `static const symbol s_i_j[] = {...}` among tables out of
    the generated stem_UTF_8_<lang>.c: every literal is a byte sequence
    (chars and 0xNN escapes) that decodes as UTF-8."""
    src = (REF / "src_c" / f"stem_UTF_8_{lang_module}.c").read_text(
        encoding="utf-8", errors="replace"
    )
    out: set[str] = set()
    for m in re.finditer(
        r"static const symbol s(?:_\d+)+\[\w*\] = \{([^}]*)\}", src
    ):
        body, data = m.group(1), bytearray()
        for tok in body.split(","):
            tok = tok.strip()
            if not tok:
                continue
            if tok.startswith("'"):
                data.append(ord(tok[1:-1].replace("\\'", "'")))
            else:
                data.append(int(tok, 0))
        try:
            out.add(data.decode("utf-8"))
        except UnicodeDecodeError:
            pass
    return sorted(out)


def build_oracle() -> None:
    if BIN.exists():
        return
    BIN.parent.mkdir(parents=True, exist_ok=True)
    srcs = (
        sorted(str(p) for p in (REF / "src_c").glob("stem_UTF_8_*.c"))
        + sorted(str(p) for p in (REF / "runtime").glob("*.c"))
        + [str(REF / "libstemmer" / "libstemmer_utf8.c"),
           str(REF / "examples" / "stemwords.c")]
    )
    subprocess.run(
        ["gcc", "-O2", f"-I{REF}/include", f"-I{REF}", *srcs,
         "-o", str(BIN)],
        check=True,
    )


def vocabulary(module: str, code: str) -> list[str]:
    # lowercase everything: the among tables contain INTERNAL marker
    # capitals (French I/U/Y, Italian U) that real input never has —
    # the prelude synthesizes them — and the stemwords oracle ASCII-
    # lowercases its input anyway
    sufs = [s.lower() for s in suffixes(module)]
    roots = ROOTS["default"] + ROOTS.get(code, [])
    words: set[str] = set(roots) | set(sufs)
    for s in sufs:
        for r in roots:
            words.add(r + s)
        # double-suffix combos catch the "then if preceded by" chains
        for s2 in sufs[:: max(1, len(sufs) // 12)]:
            words.add(roots[6] + s2 + s)
    return sorted(w for w in words if w)


def main(only: list[str]) -> None:
    build_oracle()
    OUT.mkdir(parents=True, exist_ok=True)
    for module, code in sorted(LANGS.items()):
        if only and code not in only and module not in only:
            continue
        vocab = vocabulary(module, code)
        proc = subprocess.run(
            [str(BIN), "-l", module],
            input="\n".join(vocab) + "\n",
            capture_output=True, text=True, check=True,
        )
        stems = proc.stdout.splitlines()
        assert len(stems) == len(vocab), (module, len(stems), len(vocab))
        path = OUT / f"stem_golden_{code}.tsv"
        with path.open("w", encoding="utf-8") as f:
            for w, s in zip(vocab, stems):
                f.write(f"{w}\t{s}\n")
        print(f"{module}: {len(vocab)} words -> {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
