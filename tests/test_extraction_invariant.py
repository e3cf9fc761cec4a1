"""The per-row invariant (BASELINE.json input_hint): the Spark extraction
UDF and the pure-Python oracle produce byte-identical text per url —
adversarial fixtures (FIXTURES.md §4) plus the whole micro corpus."""

import pytest
from pyspark.sql import functions as F

from deduplication_challenge_spark.functions.textnorm import extract_text
from deduplication_challenge_spark.operators.ingest import extract_pages

ADVERSARIAL = [
    b"<html><body><p>plain</p></body></html>",
    b"<p>crlf\r\nlines\rhere</p>",
    "<p>nbsp and​zero-width</p>".encode("utf-8"),
    b"<p>broken \xff\xfe bytes</p>",
    b"<P><B>NESTED<I>tags</I></B></P>",
    b"<body></body>",
    b"",
    b"<script>only script</script>",
    b"<p>entities &amp; &lt; &gt; &quot; &#65; &eacute;</p>",
    "<p>café āč unicode</p>".encode("utf-8"),
    b"<div>a<div>b<div>c</div></div></div>",
    b"<!-- comment --><p>after comment</p>",
    b"<p>unclosed paragraph",
    b"<td>table</td><td>cells</td>",
]


def test_spark_udf_matches_oracle_bytes(spark):
    rows = [(f"https://t.example/{i}", html) for i, html in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "url string, html binary")
    pages = df.selectExpr(
        "url", "cast('2025-01-01' as timestamp) as warc_ts", "html",
        "'' as text", "'en' as lang",
    )
    got = {r["url"]: r["text"] for r in extract_pages(pages).collect()}
    for i, html in enumerate(ADVERSARIAL):
        url = f"https://t.example/{i}"
        expected = extract_text(html)
        assert got[url].encode("utf-8") == expected.encode("utf-8"), url


def test_invariant_on_micro_corpus(spark, micro_corpus):
    from deduplication_challenge_spark.sources.synth import corpus_to_spark

    pages, _ = corpus_to_spark(spark, micro_corpus)
    got = {r["url"]: r["text"] for r in extract_pages(pages).collect()}
    for p in micro_corpus.rows:
        assert got[p["url"]] == p["text"], p["url"]  # text was defined as extract_text(html)


def test_driver_documents_derivation(spark):
    """Pages derived from the driver's documents table keep the invariant."""
    from deduplication_challenge_spark.sources.pages import (
        expected_text_oracle,
        pages_from_documents,
    )

    # align on doc_id, not on scan order: the adaptive input spread
    # round-robins the pages scan, so two independent limit(50)s no longer
    # draw the same rows
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where("doc_id < 50")
    )
    pages = pages_from_documents(spark, "/root/testdata/sf0.001").where(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long") < 50
    )
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    extracted = {r["url"]: r["text"] for r in extract_pages(pages).collect()}
    assert len(raw) > 0
    for doc_id, raw_text in raw.items():
        url = next(u for u in extracted if u.endswith(f"/doc/{doc_id}"))
        assert extracted[url] == expected_text_oracle(raw_text)
