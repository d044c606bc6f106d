"""Snowball Turkish stemmer (pure Python).

Independent port of the published snowballstem.org Turkish algorithm
(Evren Kapusuz Cilden), the last of the 16 libstemmer modules the
reference links for fs:stem quads (buffer_stems, import.c:658-700).
Oracle-exact against the reference's compiled libstemmer
(tests/data/stem_golden_tr.tsv).

Unlike the suffix-table languages, Turkish is a cursor machine: every
morpheme marker checks vowel harmony and optional buffer letters
(y/n/s consonants, U vowels), and the noun-suffix chains recurse
through 'ki'. ``_Env`` mirrors Snowball's backward-mode primitives
(cursor from the right, ``[``/``]`` slice brackets, save/restore by
distance-from-end so deletions at the cursor don't invalidate marks).
"""

from __future__ import annotations

VOWELS = "aeıioöuü"
U_VOWELS = "ıiuü"

# harmony: last suffix vowel -> the grouping the PREVIOUS vowel must
# belong to (turkish.sbl check_vowel_harmony) — vowel groupings:
_V1 = "aıou"   # vowel1
_V2 = "eiöü"   # vowel2
_V3 = "aı"     # vowel3
_V4 = "ei"     # vowel4
_V5 = "ou"     # vowel5
_V6 = "öü"     # vowel6
_HARMONY = {
    "a": _V1, "e": _V2, "ı": _V3, "i": _V4,
    "o": _V5, "ö": _V6, "u": _V5, "ü": _V6,
}


class _Env:
    __slots__ = ("w", "c", "ket", "bra")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)
        self.ket = len(w)
        self.bra = 0

    # marks survive slice_del at the cursor: store distance from END
    def mark(self) -> int:
        return len(self.w) - self.c

    def reset(self, m: int) -> None:
        self.c = len(self.w) - m

    def eq(self, s: str) -> bool:
        n = len(s)
        if self.c >= n and self.w[self.c - n: self.c] == s:
            self.c -= n
            return True
        return False

    def peek(self, s: str) -> bool:
        n = len(s)
        return self.c >= n and self.w[self.c - n: self.c] == s

    def among(self, sufs) -> bool:
        """Longest suffix ending at the cursor (pre-sorted desc)."""
        for s in sufs:
            if self.eq(s):
                return True
        return False

    def grouping(self, g: str) -> bool:
        if self.c >= 1 and self.w[self.c - 1] in g:
            self.c -= 1
            return True
        return False

    def goto_grouping(self, g: str) -> bool:
        """Backward goto: leave the cursor just AFTER the first char
        (scanning right-to-left) that belongs to g."""
        c = self.c
        while c >= 1 and self.w[c - 1] not in g:
            c -= 1
        if c < 1:
            return False
        self.c = c
        return True

    def set_ket(self) -> None:
        self.ket = self.c

    def slice_del(self) -> None:
        self.bra = self.c
        self.w = self.w[: self.bra] + self.w[self.ket:]
        # cursor stays at bra; ket collapses onto it
        self.ket = self.bra


def _alt(e: _Env, *fns) -> bool:
    m = e.mark()
    for f in fns:
        if f(e):
            return True
        e.reset(m)
    return False


# ------------------------------------------------------------ harmony
def _check_vowel_harmony(e: _Env) -> bool:
    m = e.mark()
    ok = False
    if e.goto_grouping(VOWELS):
        v = e.w[e.c - 1]
        grp = _HARMONY.get(v)
        if grp is not None:
            e.c -= 1  # consume the suffix vowel
            ok = e.goto_grouping(grp)
    e.reset(m)
    return ok


# --------------------------------------------------- optional letters
def _opt_consonant(e: _Env, ch: str) -> bool:
    if e.peek(ch):
        # consume iff preceded by a vowel; present-but-unharmonized
        # fails the whole marker
        if e.c >= 2 and e.w[e.c - 2] in VOWELS:
            e.c -= 1
            return True
        return False
    # absent: the char one left of the cursor must follow a vowel
    return e.c >= 2 and e.w[e.c - 2] in VOWELS


def _opt_U_vowel(e: _Env) -> bool:
    if e.c >= 1 and e.w[e.c - 1] in U_VOWELS:
        if e.c >= 2 and e.w[e.c - 2] not in VOWELS:
            e.c -= 1
            return True
        return False
    return e.c >= 2 and e.w[e.c - 2] not in VOWELS


def _desc(*sufs: str):
    return tuple(sorted(sufs, key=len, reverse=True))


_A_POSS = _desc("m", "n", "miz", "niz", "muz", "nuz", "mız", "nız",
                "müz", "nüz")
_A_LARI = _desc("leri", "ları")
_A_NU = _desc("ni", "nu", "nı", "nü")
_A_NUN = _desc("in", "un", "ın", "ün")
_A_YA = _desc("a", "e")
_A_NA = _desc("na", "ne")
_A_DA = _desc("da", "ta", "de", "te")
_A_NDA = _desc("nda", "nde")
_A_DAN = _desc("dan", "tan", "den", "ten")
_A_NDAN = _desc("ndan", "nden")
_A_YLA = _desc("la", "le")
_A_NCA = _desc("ca", "ce")
_A_YUM = _desc("im", "um", "ım", "üm")
_A_SUN = _desc("sin", "sun", "sın", "sün")
_A_YUZ = _desc("iz", "uz", "ız", "üz")
_A_SUNUZ = _desc("siniz", "sunuz", "sınız", "sünüz")
_A_LAR = _desc("lar", "ler")
_A_NUZ = _desc("niz", "nuz", "nız", "nüz")
_A_DUR = _desc("dir", "tir", "dur", "tur", "dır", "tır", "dür", "tür")
_A_CASINA = _desc("casına", "cesine")
_A_YDU = _desc(
    "di", "ti", "dik", "tik", "duk", "tuk", "dık", "tık", "dük",
    "tük", "dim", "tim", "dum", "tum", "dım", "tım", "düm", "tüm",
    "din", "tin", "dun", "tun", "dın", "tın", "dün", "tün", "du",
    "tu", "dı", "tı", "dü", "tü",
)
_A_YSA = _desc("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
_A_YMUS = _desc("miş", "muş", "mış", "müş")


# ------------------------------------------------------------ markers
def _m_possessives(e):
    return e.among(_A_POSS) and _opt_U_vowel(e)


def _m_sU(e):
    return (
        _check_vowel_harmony(e)
        and e.grouping(U_VOWELS)
        and _opt_consonant(e, "s")
    )


def _m_lArI(e):
    return e.among(_A_LARI)


def _m_yU(e):
    return (
        _check_vowel_harmony(e)
        and e.grouping(U_VOWELS)
        and _opt_consonant(e, "y")
    )


def _m_nU(e):
    return _check_vowel_harmony(e) and e.among(_A_NU)


def _m_nUn(e):
    return (
        _check_vowel_harmony(e)
        and e.among(_A_NUN)
        and _opt_consonant(e, "n")
    )


def _m_yA(e):
    return (
        _check_vowel_harmony(e)
        and e.among(_A_YA)
        and _opt_consonant(e, "y")
    )


def _m_nA(e):
    return _check_vowel_harmony(e) and e.among(_A_NA)


def _m_DA(e):
    return _check_vowel_harmony(e) and e.among(_A_DA)


def _m_ndA(e):
    return _check_vowel_harmony(e) and e.among(_A_NDA)


def _m_DAn(e):
    return _check_vowel_harmony(e) and e.among(_A_DAN)


def _m_ndAn(e):
    return _check_vowel_harmony(e) and e.among(_A_NDAN)


def _m_ylA(e):
    return (
        _check_vowel_harmony(e)
        and e.among(_A_YLA)
        and _opt_consonant(e, "y")
    )


def _m_ki(e):
    return e.eq("ki")


def _m_ncA(e):
    return (
        _check_vowel_harmony(e)
        and e.among(_A_NCA)
        and _opt_consonant(e, "n")
    )


def _m_yUm(e):
    return (
        _check_vowel_harmony(e)
        and e.among(_A_YUM)
        and _opt_consonant(e, "y")
    )


def _m_sUn(e):
    return _check_vowel_harmony(e) and e.among(_A_SUN)


def _m_yUz(e):
    return (
        _check_vowel_harmony(e)
        and e.among(_A_YUZ)
        and _opt_consonant(e, "y")
    )


def _m_sUnUz(e):
    return e.among(_A_SUNUZ)


def _m_lAr(e):
    return _check_vowel_harmony(e) and e.among(_A_LAR)


def _m_nUz(e):
    return _check_vowel_harmony(e) and e.among(_A_NUZ)


def _m_DUr(e):
    return _check_vowel_harmony(e) and e.among(_A_DUR)


def _m_cAsInA(e):
    return e.among(_A_CASINA)


def _m_yDU(e):
    return (
        _check_vowel_harmony(e)
        and e.among(_A_YDU)
        and _opt_consonant(e, "y")
    )


def _m_ysA(e):
    return e.among(_A_YSA) and _opt_consonant(e, "y")


def _m_ymUs(e):
    return (
        _check_vowel_harmony(e)
        and e.among(_A_YMUS)
        and _opt_consonant(e, "y")
    )


def _m_yken(e):
    return e.eq("ken") and _opt_consonant(e, "y")


# ------------------------------------------------ nominal verb chain
def _stem_nominal_verb_suffixes(e: _Env, flag: list) -> bool:
    e.set_ket()
    flag[0] = True

    def br_a(e):
        return _alt(e, _m_ymUs, _m_yDU, _m_ysA, _m_yken)

    def br_b(e):
        if not _m_cAsInA(e):
            return False
        _alt(e, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)  # optional
        return _m_ymUs(e)

    def br_c(e):
        if not _m_lAr(e):
            return False
        e.slice_del()
        m = e.mark()
        e.set_ket()
        if not _alt(e, _m_DUr, _m_yDU, _m_ysA, _m_ymUs):
            e.reset(m)
        flag[0] = False
        return True

    def br_d(e):
        return _m_nUz(e) and _alt(e, _m_yDU, _m_ysA)

    def br_e(e):
        if not _alt(e, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm):
            return False
        e.slice_del()
        m = e.mark()
        e.set_ket()
        if not _m_ymUs(e):
            e.reset(m)
        return True

    def br_f(e):
        if not _m_DUr(e):
            return False
        e.slice_del()
        m = e.mark()
        e.set_ket()
        _alt(e, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)  # optional
        if not _m_ymUs(e):
            e.reset(m)
        return True

    if not _alt(e, br_a, br_b, br_c, br_d, br_e, br_f):
        return False
    e.slice_del()
    return True


# --------------------------------------------------- ki suffix chain
def _try_lar_then_chain(e: _Env) -> None:
    """try([ mark_lAr ] delete stem_suffix_chain_before_ki) — the
    recurring coda of many branches."""
    m = e.mark()
    e.set_ket()
    if not _m_lAr(e):
        e.reset(m)
        return
    e.slice_del()
    if not _chain_ki(e):
        e.reset(m)


def _chain_ki(e: _Env) -> bool:
    e.set_ket()
    if not _m_ki(e):
        return False
    m1 = e.mark()

    if _m_DA(e):
        e.slice_del()
        m = e.mark()
        e.set_ket()
        if _m_lAr(e):
            e.slice_del()
            m2 = e.mark()
            if not _chain_ki(e):
                e.reset(m2)
        else:
            e.reset(m)
            if _m_possessives(e):
                e.slice_del()
                _try_lar_then_chain(e)
            else:
                e.reset(m)
        return True
    e.reset(m1)

    if _m_nUn(e):
        e.slice_del()
        m = e.mark()
        e.set_ket()
        if _m_lArI(e):
            e.slice_del()
        else:
            e.reset(m)
            e.set_ket()
            if _alt(e, _m_possessives, _m_sU):
                e.slice_del()
                _try_lar_then_chain(e)
            else:
                e.reset(m)
                if not _chain_ki(e):
                    e.reset(m)
        return True
    e.reset(m1)

    if _m_ndA(e):
        if _m_lArI(e):
            e.slice_del()
            return True
        e.reset(m1)
        if _m_ndA(e) and _m_sU(e):
            e.slice_del()
            _try_lar_then_chain(e)
            return True
        e.reset(m1)
        if _m_ndA(e) and _chain_ki(e):
            return True
        return False
    return False


# -------------------------------------------------- noun suffix chain
def _stem_noun_suffixes(e: _Env) -> bool:
    def br1(e):
        e.set_ket()
        if not _m_lAr(e):
            return False
        e.slice_del()
        m = e.mark()
        if not _chain_ki(e):
            e.reset(m)
        return True

    def br2(e):
        e.set_ket()
        if not _m_ncA(e):
            return False
        e.slice_del()
        m = e.mark()
        # try(...)
        e.set_ket()
        if _m_lArI(e):
            e.slice_del()
            return True
        e.reset(m)
        e.set_ket()
        if _alt(e, _m_possessives, _m_sU):
            e.slice_del()
            _try_lar_then_chain(e)
            return True
        e.reset(m)
        e.set_ket()
        if _m_lAr(e):
            e.slice_del()
            if not _chain_ki(e):
                e.reset(m)
        else:
            e.reset(m)
        return True

    def br3(e):
        e.set_ket()
        if not _alt(e, _m_ndA, _m_nA):
            return False
        m = e.mark()
        if _m_lArI(e):
            e.slice_del()
            return True
        e.reset(m)
        if _m_sU(e):
            e.slice_del()
            _try_lar_then_chain(e)
            return True
        e.reset(m)
        return _chain_ki(e)

    def br4(e):
        e.set_ket()
        if not _alt(e, _m_ndAn, _m_nU):
            return False
        m = e.mark()
        if _m_sU(e):
            e.slice_del()
            _try_lar_then_chain(e)
            return True
        e.reset(m)
        return _m_lArI(e)

    def br5(e):
        e.set_ket()
        if not _m_DAn(e):
            return False
        e.slice_del()
        m = e.mark()
        # try(...)
        e.set_ket()
        if _m_possessives(e):
            e.slice_del()
            _try_lar_then_chain(e)
            return True
        e.reset(m)
        e.set_ket()
        if _m_lAr(e):
            e.slice_del()
            m2 = e.mark()
            if not _chain_ki(e):
                e.reset(m2)
            return True
        e.reset(m)
        if not _chain_ki(e):
            e.reset(m)
        return True

    def br6(e):
        e.set_ket()
        if not _alt(e, _m_nUn, _m_ylA):
            return False
        e.slice_del()
        m = e.mark()
        # try(...)
        e.set_ket()
        if _m_lAr(e):
            e.slice_del()
            if _chain_ki(e):
                return True
            e.reset(m)
        else:
            e.reset(m)
        e.set_ket()
        if _alt(e, _m_possessives, _m_sU):
            e.slice_del()
            _try_lar_then_chain(e)
            return True
        e.reset(m)
        if not _chain_ki(e):
            e.reset(m)
        return True

    def br7(e):
        e.set_ket()
        if not _m_lArI(e):
            return False
        e.slice_del()
        return True

    def br8(e):
        return _chain_ki(e)

    def br9(e):
        e.set_ket()
        if not _alt(e, _m_DA, _m_yU, _m_yA):
            return False
        e.slice_del()
        m = e.mark()
        e.set_ket()
        if _m_possessives(e):
            e.slice_del()
            m2 = e.mark()
            e.set_ket()
            if not _m_lAr(e):
                e.reset(m2)
        else:
            e.reset(m)
            if not _m_lAr(e):
                e.reset(m)
                return True
        e.slice_del()
        e.set_ket()
        if not _chain_ki(e):
            e.reset(m)
        return True

    def br10(e):
        e.set_ket()
        if not _alt(e, _m_possessives, _m_sU):
            return False
        e.slice_del()
        _try_lar_then_chain(e)
        return True

    return _alt(e, br1, br2, br3, br4, br5, br6, br7, br8, br9, br10)


# ------------------------------------------------------------ postlude
def _post_process(e: _Env) -> None:
    # last consonant devoicing: b->p, c->ç, d->t, ğ->k
    if e.w:
        last = e.w[-1]
        rep = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}.get(last)
        if rep:
            e.w = e.w[:-1] + rep


def _append_U(e: _Env) -> None:
    if not e.w.endswith(("d", "g")):
        return
    # find the last vowel; append its harmonizing U
    for ch in reversed(e.w):
        if ch in VOWELS:
            if ch in "aı":
                e.w += "ı"
            elif ch in "ei":
                e.w += "i"
            elif ch in "ou":
                e.w += "u"
            else:
                e.w += "ü"
            return


def turkish_stem(word: str) -> str:
    word = word.lower()
    if sum(1 for ch in word if ch in VOWELS) < 2:
        return word
    e = _Env(word)
    flag = [True]
    m = e.mark()
    if not _stem_nominal_verb_suffixes(e, flag):
        e.reset(m)
    if not flag[0]:
        # continue_stemming_noun_suffixes unset: stemming STOPS here,
        # postlude included (stem() returns 0 in the reference)
        return e.w
    m = e.mark()
    if not _stem_noun_suffixes(e):
        e.reset(m)
    # postlude: reserved stems skip it entirely
    if e.w in ("ad", "soyad"):
        return e.w
    _append_U(e)
    _post_process(e)
    return e.w
