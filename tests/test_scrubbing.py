"""PII scrubbing, HTML stripping, and corpus vocabulary operators."""

from pyspark.sql import functions as F


def test_scrub_pii_replaces_and_counts(spark):
    from fourstore_spark.operators.scrubbing import (
        EMAIL_TOKEN,
        IP_TOKEN,
        PHONE_TOKEN,
        scrub_pii,
    )

    docs = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.co.uk or call "
                "+1 555 867-5309 today"),
            (2, "server at 10.0.42.7 and 256.1.1.1 is not an ip"),
            (3, "clean text with the number 12345 left alone"),
            (4, "two mails a@b.io c@d.org one phone 47-123-4567"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert EMAIL_TOKEN in got[1]["text"] and PHONE_TOKEN in got[1]["text"]
    assert "alice" not in got[1]["text"] and "5309" not in got[1]["text"]
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert IP_TOKEN in got[2]["text"] and got[2]["n_ips"] == 1
    # 256.x fails the octet grammar -> untouched
    assert "256.1.1.1" in got[2]["text"]
    assert got[3]["text"] == "clean text with the number 12345 left alone"
    assert got[3]["n_emails"] == got[3]["n_phones"] == got[3]["n_ips"] == 0
    assert got[4]["n_emails"] == 2 and got[4]["n_phones"] == 1


def test_strip_html_visible_text(spark):
    from fourstore_spark.operators.scrubbing import strip_html

    docs = spark.createDataFrame(
        [
            (1, "<html><head><style>p {color: red}</style></head>"
                "<body><!-- note --><p>Hello &amp; <b>world</b></p>"
                "<script>var x = '<p>no</p>';</script></body></html>"),
            (2, "plain text, no markup"),
            (3, "a &lt;tag&gt; literal &quot;quoted&quot;"),
            # "&amp;lt;" is the literal text "&lt;": exactly ONE level of
            # unescaping — &amp; must be the LAST entity pass (r6 verdict)
            (4, "escaped markup: &amp;lt;b&amp;gt; stays &amp;amp; text"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in strip_html(docs).collect()}
    assert got[1]["text"] == "Hello & world"
    assert got[1]["is_htmlish"] is True
    assert got[2]["text"] == "plain text, no markup"
    assert got[2]["is_htmlish"] is False
    assert got[3]["text"] == 'a <tag> literal "quoted"'
    assert got[4]["text"] == "escaped markup: &lt;b&gt; stays &amp; text"


def test_top_ngrams_unigram_and_bigram(spark):
    from fourstore_spark.operators.textstats import top_ngrams

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "THE cat"),
        ],
        "doc_id long, text string",
    )
    uni = {
        r["ngram"]: (r["n_docs"], r["n_occurrences"])
        for r in top_ngrams(docs, n=1, k=100).collect()
    }
    assert uni["the"] == (3, 4)
    assert uni["cat"] == (2, 2)
    assert uni["dog"] == (1, 1)
    # ordering: occurrences desc, then ngram asc; k truncates
    top2 = [r["ngram"] for r in top_ngrams(docs, n=1, k=2).collect()]
    assert top2 == ["the", "cat"]  # cat/sat tie at 2 -> ngram asc
    bi = {
        r["ngram"]: (r["n_docs"], r["n_occurrences"])
        for r in top_ngrams(docs, n=2, k=100).collect()
    }
    assert bi["the cat"] == (2, 2)
    assert bi["sat on"] == (1, 1)
    # a 1-token doc contributes no bigrams; "the cat" doc 3 has exactly 1
    assert sum(v[1] for v in bi.values()) == 5 + 2 + 1


def test_scrub_zero_shuffle_plan(spark):
    """The scrub/strip operators must stay scan-shaped: no Exchange in
    the optimized plan (the 100 TB contract is a pure projection)."""
    from fourstore_spark.operators.scrubbing import scrub_pii, strip_html

    docs = spark.createDataFrame(
        [(1, "a <b>x</b> at a@b.co")], "doc_id long, text string"
    )
    for op in (scrub_pii, strip_html):
        plan = op(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_scrub_pii_streams_stateless(spark, tmp_path):
    """scrub_pii is pure projection, so it composes into Structured
    Streaming pipelines unchanged (append mode, no state)."""
    from fourstore_spark.operators.scrubbing import EMAIL_TOKEN, scrub_pii

    src = tmp_path / "scrubsrc"
    docs = spark.createDataFrame(
        [(1, "reach me: x@y.io"), (2, "no pii here")],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.parquet(str(src / "p"))
    stream = spark.readStream.schema(docs.schema).parquet(str(src / "p"))
    q = (
        scrub_pii(stream).writeStream.format("memory")
        .queryName("scrub_stream").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r
        for r in spark.sql("SELECT * FROM scrub_stream").collect()
    }
    assert EMAIL_TOKEN in got[1]["text"] and got[1]["n_emails"] == 1
    assert got[2]["text"] == "no pii here" and got[2]["n_emails"] == 0
