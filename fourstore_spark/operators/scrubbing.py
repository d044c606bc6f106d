"""Content scrubbing for training corpora: PII redaction and HTML
boilerplate stripping.

Standard pre-training hygiene (the C4/Gopher/Dolma-style public
pipelines all run variants of these before tokenization). Everything is
pure JVM column expressions — regexp_replace / regexp_count chains that
whole-stage codegen compiles — so the operators are zero-shuffle scan
projections that survive any corpus size: no Python in the row path, no
state, trivially partition-parallel.

Design notes for 100 TB:
- one pass computes the scrubbed text AND the per-kind hit counts (the
  counts are what a pipeline dashboard monitors for drift);
- the regexes are deliberately conservative, anchored on delimiters, and
  documented; a production deployment swaps patterns per policy without
  touching the plan shape;
- the same expressions are expressible in ANSI SQL, so every operator
  here has an exact DuckDB oracle in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# conservative, delimiter-anchored patterns (Java regex: the driver
# contract's oracle asserts constructed OUTPUT strings instead of
# re-running these, so RE2's missing lookarounds never matter there)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# international-ish phone: optional +CC, 3-4 digit groups with -. or
# space separators, 7+ digits total; word-bounded to spare plain numbers
PHONE_RE = (
    r"(?<![0-9A-Za-z])\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,6}"
    r"(?:[-. ][0-9]{2,6})?(?![0-9A-Za-z])"
)
IPV4_RE = (
    r"(?<![0-9])(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])(?![0-9])"
)

EMAIL_TOKEN = "<|EMAIL|>"
PHONE_TOKEN = "<|PHONE|>"
IP_TOKEN = "<|IP|>"


def scrub_pii_text(text: Column) -> Column:
    """Text with emails, phone numbers and IPv4 addresses replaced by
    placeholder tokens (emails first: an address would otherwise leave
    its digits behind for the phone pattern)."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return out


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Add the scrubbed text plus per-kind hit counts.

    Output columns: <out_col> (default: text_col scrubbed in place),
    n_emails, n_ips, n_phones. One scan, zero shuffle."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(t, F.lit(EMAIL_RE)).cast("long"),
            "n_ips": F.regexp_count(t, F.lit(IPV4_RE)).cast("long"),
            # count phones on the email-scrubbed text, mirroring the
            # replace order (an email's digits must not double-count)
            "n_phones": F.regexp_count(
                F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN), F.lit(PHONE_RE)
            ).cast("long"),
            (out_col or text_col): scrub_pii_text(t),
        }
    )


# -------------------------------------------------------------- HTML
_SCRIPT_RE = r"(?is)<(script|style)[^>]*>.*?</\1>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]+>"
_WS_RE = r"\s+"

# &amp; must unescape LAST: the literal text "&amp;lt;" means "&lt;" and
# an early &amp; pass would double-unescape it all the way to "<"
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def strip_html_text(text: Column) -> Column:
    """Visible text of an HTML fragment: drops script/style bodies,
    comments and tags, unescapes the common entities, collapses
    whitespace. Heuristic by design (a full HTML5 parser is not a column
    expression); good enough for boilerplate removal at corpus scale."""
    out = F.regexp_replace(text, _SCRIPT_RE, " ")
    out = F.regexp_replace(out, _COMMENT_RE, " ")
    out = F.regexp_replace(out, _TAG_RE, " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, _WS_RE, " "))


def strip_html(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace (or add) the visible-text projection of an HTML column,
    plus an ``is_htmlish`` signal (did the row look like markup at all)
    so pipelines can route plain-text rows around the scrub."""
    t = F.col(text_col)
    return df.withColumn(
        "is_htmlish", F.regexp_count(t, F.lit(_TAG_RE)) > 0
    ).withColumn(out_col or text_col, strip_html_text(t))


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
) -> DataFrame:
    """Unicode normalization (default NFC) ahead of fingerprinting/
    dedup — the standard C4/Dolma hygiene step that makes byte-level
    equality mean codepoint-level equality (é as U+00E9 vs e+U+0301
    collide after NFC, so exact dedup stops missing visually identical
    duplicates).

    Arrow-batched stdlib unicodedata (Python is unavoidable: Spark SQL
    exposes no ICU normalizer) — stateless projection, zero shuffle.
    Output: (id, text, changed). The NFC form is bit-identical to
    utf8proc's (DuckDB nfc_normalize), so the oracle is exact."""
    import unicodedata

    import pandas as pd

    def norm(batches):
        for pdf in batches:
            texts = [
                unicodedata.normalize(form, t) if t is not None else None
                for t in pdf["__text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": texts,
                    "changed": [
                        t is not None and t != o
                        for t, o in zip(texts, pdf["__text"])
                    ],
                }
            )

    did_t = df.select(F.col(id_col).alias("doc_id")).schema[
        "doc_id"
    ].dataType.simpleString()
    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).mapInPandas(norm, f"doc_id {did_t}, text string, changed boolean")


def url_host(url: Column) -> Column:
    """Lowercased host (no port) of an absolute URL; '' when the input
    has no scheme://host part. The grouping key for per-domain caps
    (sampling.cap_per_group) and URL-level dedup."""
    rest = F.regexp_extract(
        F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1
    )
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    return F.regexp_extract(hostport, r"^([^:]*)", 1)


def canonicalize_url(url: Column) -> Column:
    """Canonical URL form (the Dolma/CCNet URL-dedup key), as a pure
    column expression — zero shuffle, engine-portable (the DuckDB
    oracle performs the identical string algebra):

    - scheme and host lowercase (path/query case preserved);
    - fragment dropped;
    - default port stripped (:80 for http, :443 for https);
    - tracking params removed (utm_*, fbclid, gclid, ref);
    - remaining query params sorted byte-wise;
    - empty path becomes '/';
    - inputs without a scheme pass through trimmed/unchanged.
    """
    u = F.trim(url)
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    pq = F.regexp_extract(rest, r"^[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(pq, r"^([^?]*)", 1)
    query = F.regexp_extract(pq, r"^[^?]*\?([^#]*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (F.length(p) > 0)
                & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(F.length(kept) > 0, F.concat(F.lit("?"), kept)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme == "", u).otherwise(canon)
