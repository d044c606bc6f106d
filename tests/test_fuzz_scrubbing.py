"""Property-based checks for the r6 scrubbing/vocabulary operators.

- top_ngrams must agree with an independent pure-Python n-gram counter
  on random corpora (window arithmetic, doc frequency, tie order);
- scrub_pii output never contains an email match and is idempotent
  (scrubbing twice changes nothing);
- strip_html output never contains a tag and is idempotent.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)


_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]

texts = st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=8
).map(" ".join)

corpora = st.lists(texts, min_size=1, max_size=8)

_SETTINGS = dict(
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "12")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_top_ngrams(rows, n, k):
    occ: Counter = Counter()
    dfq: Counter = Counter()
    for _id, text in rows:
        toks = text.lower().strip().split()
        grams = [
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        ]
        occ.update(grams)
        dfq.update(set(grams))
    ranked = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(g, dfq[g], c) for g, c in ranked]


@given(corpus=corpora, n=st.integers(1, 3), k=st.integers(1, 10))
@settings(**_SETTINGS)
def test_top_ngrams_matches_python_model(spark, corpus, n, k):
    from fourstore_spark.operators.textstats import top_ngrams

    rows = list(enumerate(corpus))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["ngram"], r["n_docs"], r["n_occurrences"])
        for r in top_ngrams(docs, n=n, k=k).collect()
    ]
    assert got == _py_top_ngrams(rows, n, k), (rows, n, k)


pii_texts = st.lists(
    st.sampled_from(
        [
            "plain words",
            "a@b.io",
            "reach alice.smith+x@example.co.uk now",
            "+1 555 123-4567",
            "47-123-4567",
            "10.0.42.7",
            "256.1.1.1",
            "v1.2.3.4.5",
            "x",
            "12345",
        ]
    ),
    min_size=1,
    max_size=5,
).map(" ".join)

html_texts = st.lists(
    st.sampled_from(
        [
            "plain words",
            "<p>hi</p>",
            "<b>bold</b> tail",
            "<script>var a = 1;</script>done",
            "<!-- note -->",
            "<div class='x'>deep <i>nest</i></div>",
            "x",
        ]
    ),
    min_size=1,
    max_size=5,
).map(" ".join)


@given(text=pii_texts)
@settings(**_SETTINGS)
def test_scrub_pii_idempotent_and_complete(spark, text):
    from fourstore_spark.operators.scrubbing import EMAIL_RE, scrub_pii

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    once = scrub_pii(docs).collect()[0]["text"]
    twice = scrub_pii(
        spark.createDataFrame([(1, once)], "doc_id long, text string")
    ).collect()[0]["text"]
    # complete: no email pattern survives; idempotent: stable under rescrub
    assert not re.search(EMAIL_RE, once), (text, once)
    assert twice == once, (text, once, twice)


entity_texts = st.lists(
    st.sampled_from(
        [
            "plain",
            "&amp;",
            "&amp;amp;",
            "&amp;lt;b&amp;gt;",  # literal text "&lt;b&gt;" — one level only
            "&lt;x&gt;",
            "&quot;q&quot;",
            "&apos;a&apos;",
            "&#39;b&#39;",
            "&nbsp;",
            "a&amp;b",
        ]
    ),
    min_size=1,
    max_size=6,
).map(" ".join)


@given(text=entity_texts)
@settings(**_SETTINGS)
def test_strip_html_entities_single_level(spark, text):
    """Entity unescaping is exactly ONE level and matches html.unescape
    (the stdlib parses entities in a single pass, so '&amp;lt;' becomes
    '&lt;' — an &amp;-first sequential replace would double-unescape to
    '<'; r6 verdict What's wrong #2)."""
    import html

    from fourstore_spark.operators.scrubbing import strip_html

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    stripped = strip_html(docs).collect()[0]["text"]
    expect = re.sub(r"\s+", " ", html.unescape(text)).strip()
    assert stripped == expect, (text, stripped, expect)


@given(text=html_texts)
@settings(**_SETTINGS)
def test_strip_html_no_tags_and_idempotent(spark, text):
    # entity escapes excluded by construction: unescaping &lt;x&gt; can
    # legitimately reintroduce '<' (documented lossy behavior)
    from fourstore_spark.operators.scrubbing import strip_html

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    stripped = strip_html(docs).collect()[0]["text"]
    restripped = strip_html(
        spark.createDataFrame([(1, stripped)], "doc_id long, text string")
    ).collect()[0]["text"]
    assert "<" not in stripped, (text, stripped)
    assert restripped == stripped, (text, stripped, restripped)


def test_canonicalize_url_rules(spark):
    """Each canonicalization rule pinned: case, default/explicit port,
    tracking-param removal, param sort, fragment drop, empty path,
    schemeless passthrough."""
    from pyspark.sql import functions as F

    from fourstore_spark.operators.scrubbing import (
        canonicalize_url,
        url_host,
    )

    cases = [
        ("HTTP://WWW.Example.COM:80/Path/To?b=2&utm_source=x&a=1#frag",
         "http://www.example.com/Path/To?a=1&b=2", "www.example.com"),
        ("https://Example.org:443", "https://example.org/", "example.org"),
        ("https://example.org:8443/x?a=1",
         "https://example.org:8443/x?a=1", "example.org"),
        ("http://a.b/p?utm_campaign=z&ref=home&z=9&utm=keep",
         "http://a.b/p?utm=keep&z=9", "a.b"),
        ("  ftp://Host.Net/File  ", "ftp://host.net/File", "host.net"),
        ("not a url", "not a url", ""),
        ("relative/path?x=1", "relative/path?x=1", ""),
        ("http://h/?", "http://h/", "h"),
        ("HTTPS://H.io/#only-frag", "https://h.io/", "h.io"),
        ("http://x.com:8080/", "http://x.com:8080/", "x.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(cases)], ["i", "u"]
    )
    got = {
        r["i"]: (r["c"], r["h"])
        for r in df.select(
            "i",
            canonicalize_url(F.col("u")).alias("c"),
            url_host(F.col("u")).alias("h"),
        ).collect()
    }
    for i, (u, canon, host) in enumerate(cases):
        assert got[i] == (canon, host), (u, got[i], (canon, host))


def test_canonicalize_url_idempotent_property(spark):
    """Property: canonical URLs are fixed points — canonicalize twice
    == canonicalize once, over a structured random URL space (schemes,
    ports, params incl. tracking, fragments, case noise)."""
    import random

    from pyspark.sql import functions as F

    from fourstore_spark.operators.scrubbing import canonicalize_url

    rng = random.Random(23)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp", ""]
    hosts = ["Example.COM", "a.b.c", "X9.io", "h"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/P/q", "/x%20y"]
    params = ["a=1", "B=2", "utm_source=t", "ref", "z", "fbclid=9", ""]
    frags = ["", "#f", "#a b"]
    urls = []
    for _ in range(300):
        s = rng.choice(schemes)
        base = (s + "://" if s else "") + rng.choice(hosts) + rng.choice(ports)
        qs = "&".join(
            rng.sample(params, rng.randint(0, 4))
        )
        urls.append(
            base + rng.choice(paths) + ("?" + qs if qs else "")
            + rng.choice(frags)
        )
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["i", "u"])
    once = df.select("i", canonicalize_url(F.col("u")).alias("c1"))
    twice = once.select(
        "i", "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    bad = [(r["c1"], r["c2"]) for r in twice if r["c1"] != r["c2"]]
    assert not bad, bad[:5]
