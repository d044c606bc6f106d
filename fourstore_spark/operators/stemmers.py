"""Snowball stemmers: German, Italian, Russian (pure Python).

The reference links libstemmer and picks the stemmer from the literal's
language tag at import time (buffer_stems, import.c:658-700). These are
independent ports of the published Snowball algorithm descriptions
(snowballstem.org) for the three non-English languages exercised by the
reference's own fulltext test data; English stays on the Porter port in
operators/fulltext.py. Driver/executor-side pure functions — they run
inside Arrow-batched pandas UDFs, never per-row over the wire.
"""

from __future__ import annotations

# --------------------------------------------------------------- German
_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


def _r_regions(word: str, vowels: str) -> tuple[int, int]:
    """Standard Snowball R1/R2 start offsets."""

    def _after_vc(start: int) -> int:
        i = start
        n = len(word)
        while i < n and word[i] not in vowels:
            i += 1
        while i < n and word[i] in vowels:
            i += 1
        # i now at first non-vowel after a vowel... need vowel-then-
        # non-vowel: walk again properly
        return i

    n = len(word)
    r1 = n
    for i in range(n - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            r2 = i + 2
            break
    return r1, r2


def german_stem(word: str) -> str:
    word = word.lower().replace("ß", "ss")
    # protect u/y between vowels as consonants
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "uy"
            and chars[i - 1] in _DE_VOWELS
            and chars[i + 1] in _DE_VOWELS
        ):
            chars[i] = chars[i].upper()
    word = "".join(chars)
    vowels = _DE_VOWELS
    r1, r2 = _r_regions(word, vowels)
    r1 = max(r1, 3)  # region before R1 must hold >= 3 letters

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1
    for suf in ("ern", "em", "er"):
        if word.endswith(suf) and in_r1(len(word) - len(suf)):
            word = word[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if word.endswith(suf) and in_r1(len(word) - len(suf)):
                word = word[: -len(suf)]
                if word.endswith("niss"):
                    word = word[:-1]
                break
        else:
            if (
                word.endswith("s")
                and in_r1(len(word) - 1)
                and len(word) >= 2
                and word[-2] in _DE_S_END
            ):
                word = word[:-1]

    # step 2
    for suf in ("est", "en", "er"):
        if word.endswith(suf) and in_r1(len(word) - len(suf)):
            word = word[: -len(suf)]
            break
    else:
        if (
            word.endswith("st")
            and in_r1(len(word) - 2)
            and len(word) >= 6
            and word[-3] in _DE_ST_END
        ):
            word = word[:-2]

    # step 3: d-suffixes
    if word.endswith(("end", "ung")) and in_r2(len(word) - 3):
        word = word[:-3]
        if (
            word.endswith("ig")
            and in_r2(len(word) - 2)
            and not word.endswith("eig")
        ):
            word = word[:-2]
    elif word.endswith(("isch",)) and in_r2(len(word) - 4):
        if not word.endswith("eisch"):
            word = word[:-4]
    elif word.endswith(("ig", "ik")) and in_r2(len(word) - 2):
        if word[-3: -2] != "e":
            word = word[:-2]
    elif word.endswith(("lich", "heit")) and in_r2(len(word) - 4):
        word = word[:-4]
        if word.endswith(("er", "en")) and in_r1(len(word) - 2):
            word = word[:-2]
    elif word.endswith("keit") and in_r2(len(word) - 4):
        word = word[:-4]
        if word.endswith("lich") and in_r2(len(word) - 4):
            word = word[:-4]
        elif word.endswith("ig") and in_r2(len(word) - 2):
            word = word[:-2]

    word = word.lower()
    return (
        word.replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


# -------------------------------------------------------------- Italian
_IT_VOWELS = "aeiouàèìòù"

_IT_PRONOUNS = sorted(
    [
        "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
        "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
        "mela", "mele", "meli", "melo", "mene",
        "tela", "tele", "teli", "telo", "tene",
        "cela", "cele", "celi", "celo", "cene",
        "vela", "vele", "veli", "velo", "vene",
    ],
    key=len,
    reverse=True,
)

_IT_STEP1_DEL_R2 = sorted(
    [
        "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
        "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
        "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
        "ose", "mente", "atrice", "atrici", "ante", "anti",
    ],
    key=len,
    reverse=True,
)

_IT_STEP2 = sorted(
    [
        "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
        "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
        "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
        "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
        "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
        "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
        "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
        "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
        "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
        "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
        "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
        "uti", "uto", "ar", "ir",
    ],
    key=len,
    reverse=True,
)


def _it_rv(word: str) -> int:
    n = len(word)
    if n < 2:
        return n
    if word[1] not in _IT_VOWELS:  # X C ...
        for i in range(2, n):
            if word[i] in _IT_VOWELS:
                return i + 1
        return n
    if word[0] in _IT_VOWELS and word[1] in _IT_VOWELS:  # V V ...
        for i in range(2, n):
            if word[i] not in _IT_VOWELS:
                return i + 1
        return n
    return 3  # C V ...


def italian_stem(word: str) -> str:
    word = word.lower()
    # replace acute accents with grave
    word = (
        word.replace("á", "à").replace("é", "è").replace("í", "ì")
        .replace("ó", "ò").replace("ú", "ù")
    )
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
        elif (
            0 < i < len(chars) - 1
            and chars[i] in "ui"
            and chars[i - 1] in _IT_VOWELS
            and chars[i + 1] in _IT_VOWELS
        ):
            chars[i] = chars[i].upper()
    word = "".join(chars)
    rv = _it_rv(word)
    r1, r2 = _r_regions(word, _IT_VOWELS)

    def _in(pos: int, region: int) -> bool:
        return pos >= region

    # step 0: attached pronouns
    for pron in _IT_PRONOUNS:
        if word.endswith(pron):
            base = word[: -len(pron)]
            p = len(base)
            if _in(p - 4, rv) and base.endswith(("ando", "endo")):
                word = base
            elif _in(p - 2, rv) and base.endswith(("ar", "er", "ir")):
                word = base + "e"
            break

    removed = False
    # step 1: standard suffixes (longest match first across ALL groups)
    n = len(word)
    candidates: list[tuple[str, str]] = []
    for suf in _IT_STEP1_DEL_R2:
        candidates.append((suf, "del_r2"))
    for suf in ("azione", "azioni", "atore", "atori"):
        candidates.append((suf, "azione"))
    for suf in ("logia", "logie"):
        candidates.append((suf, "logia"))
    for suf in ("uzione", "uzioni", "usione", "usioni"):
        candidates.append((suf, "uzione"))
    for suf in ("enza", "enze"):
        candidates.append((suf, "enza"))
    for suf in ("amento", "amenti", "imento", "imenti"):
        candidates.append((suf, "amento"))
    candidates.append(("amente", "amente"))
    candidates.append(("ità", "ita"))
    for suf in ("ivo", "ivi", "iva", "ive"):
        candidates.append((suf, "ivo"))
    candidates.sort(key=lambda c: len(c[0]), reverse=True)
    for suf, kind in candidates:
        if not word.endswith(suf):
            continue
        pos = n - len(suf)
        if kind == "del_r2" and _in(pos, r2):
            word = word[:pos]
            removed = True
        elif kind == "azione" and _in(pos, r2):
            word = word[:pos]
            if word.endswith("ic") and _in(len(word) - 2, r2):
                word = word[:-2]
            removed = True
        elif kind == "logia" and _in(pos, r2):
            word = word[:pos] + "log"
            removed = True
        elif kind == "uzione" and _in(pos, r2):
            word = word[:pos] + "u"
            removed = True
        elif kind == "enza" and _in(pos, r2):
            word = word[:pos] + "ente"
            removed = True
        elif kind == "amento" and _in(pos, rv):
            word = word[:pos]
            removed = True
        elif kind == "amente" and _in(pos, r1):
            word = word[:pos]
            if word.endswith("iv") and _in(len(word) - 2, r2):
                word = word[:-2]
                if word.endswith("at") and _in(len(word) - 2, r2):
                    word = word[:-2]
            else:
                for s2 in ("os", "ic", "abil"):
                    if word.endswith(s2) and _in(len(word) - len(s2), r2):
                        word = word[: -len(s2)]
                        break
            removed = True
        elif kind == "ita" and _in(pos, r2):
            word = word[:pos]
            for s2 in ("abil", "ic", "iv"):
                if word.endswith(s2) and _in(len(word) - len(s2), r2):
                    word = word[: -len(s2)]
                    break
            removed = True
        elif kind == "ivo" and _in(pos, r2):
            word = word[:pos]
            if word.endswith("at") and _in(len(word) - 2, r2):
                word = word[:-2]
                if word.endswith("ic") and _in(len(word) - 2, r2):
                    word = word[:-2]
            removed = True
        if removed:
            break

    # step 2: verb suffixes (only if step 1 removed nothing)
    if not removed:
        for suf in _IT_STEP2:
            if word.endswith(suf) and _in(len(word) - len(suf), rv):
                word = word[: -len(suf)]
                break

    # step 3a: final vowel (and preceding i) in RV
    if word and word[-1] in "aeioàèìò" and _in(len(word) - 1, rv):
        word = word[:-1]
        if word and word[-1] == "i" and _in(len(word) - 1, rv):
            word = word[:-1]
    # step 3b
    if word.endswith(("ch", "gh")) and _in(len(word) - 1, rv):
        word = word[:-1]

    return word.lower()


# -------------------------------------------------------------- Russian
_RU_VOWELS = "аеиоуыэюя"

_RU_PERF_GERUND_A = ("в", "вши", "вшись")  # after а/я
_RU_PERF_GERUND_B = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJECTIVE = (
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
    "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую", "юю",
    "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_A = ("ем", "нн", "вш", "ющ", "щ")  # after а/я
_RU_PARTICIPLE_B = ("ивш", "ывш", "ующ")
_RU_VERB_A = (
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
    "ет", "ют", "ны", "ть", "ешь", "нно",
)  # after а/я
_RU_VERB_B = (
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
    "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
)
_RU_NOUN = (
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
    "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
    "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия",
    "ья", "я",
)


def _ru_longest(word: str, sufs, rv: int) -> str | None:
    best = None
    for suf in sufs:
        if (
            word.endswith(suf)
            and len(word) - len(suf) >= rv
            and (best is None or len(suf) > len(best))
        ):
            best = suf
    return best


def _ru_longest_after_aya(word: str, sufs, rv: int) -> str | None:
    """Group (a) suffixes must be preceded by а or я (which stays)."""
    best = None
    for suf in sufs:
        if not word.endswith(suf):
            continue
        p = len(word) - len(suf)
        if p - 1 < rv or p < 1 or word[p - 1] not in "ая":
            continue
        if best is None or len(suf) > len(best):
            best = suf
    return best


def russian_stem(word: str) -> str:
    word = word.lower().replace("ё", "е")
    n = len(word)
    rv = n
    for i, ch in enumerate(word):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _r_regions(word, _RU_VOWELS)

    # step 1: perfective gerund, else [reflexive] + adjectival|verb|noun
    suf = _ru_longest(word, _RU_PERF_GERUND_B, rv)
    suf_a = _ru_longest_after_aya(word, _RU_PERF_GERUND_A, rv)
    if suf_a and (not suf or len(suf_a) > len(suf)):
        word = word[: -len(suf_a)]
    elif suf:
        word = word[: -len(suf)]
    else:
        for refl in ("ся", "сь"):
            if word.endswith(refl) and len(word) - 2 >= rv:
                word = word[:-2]
                break
        adj = _ru_longest(word, _RU_ADJECTIVE, rv)
        if adj:
            word = word[: -len(adj)]
            part = _ru_longest(word, _RU_PARTICIPLE_B, rv)
            part_a = _ru_longest_after_aya(word, _RU_PARTICIPLE_A, rv)
            if part_a and (not part or len(part_a) > len(part)):
                word = word[: -len(part_a)]
            elif part:
                word = word[: -len(part)]
        else:
            vb = _ru_longest(word, _RU_VERB_B, rv)
            vb_a = _ru_longest_after_aya(word, _RU_VERB_A, rv)
            if vb_a and (not vb or len(vb_a) > len(vb)):
                word = word[: -len(vb_a)]
            elif vb:
                word = word[: -len(vb)]
            else:
                noun = _ru_longest(word, _RU_NOUN, rv)
                if noun:
                    word = word[: -len(noun)]

    # step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # step 3: derivational ост/ость in R2
    for suf in ("ость", "ост"):
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            word = word[: -len(suf)]
            break

    # step 4
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        sup = _ru_longest(word, ("ейше", "ейш"), rv)
        if sup:
            word = word[: -len(sup)]
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word


# ------------------------------------------------------------- dispatch
def stemmer_for(lang: str | None):
    """Language tag -> stem function, the reference's buffer_stems way:
    lowercase, truncate at the first non-letter ("it-GB" -> "it"), None
    -> "en"; an unknown language yields NO stemmer (import.c:676-679
    sb_stemmer_new returns NULL and the literal gets no stem quads)."""
    from fourstore_spark.operators.fulltext import _porter_stem

    if not lang:
        code = "en"
    else:
        code = ""
        for ch in lang.lower():
            if "a" <= ch <= "z":
                code += ch
            else:
                break
    return {
        "en": _porter_stem,
        "de": german_stem,
        "it": italian_stem,
        "ru": russian_stem,
    }.get(code)
