"""WARC source: record-level roundtrips, malformed-tail tolerance, and an
end-to-end equivalence — the pipeline over a .warc.gz produces exactly the
clusters it produces over the same pages as parquet rows."""

from __future__ import annotations

import datetime as dt

import pytest

from deduplication_challenge_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_bytes_to_pages,
    write_warc,
)

ROWS = [
    {"url": "https://w/1", "warc_ts": dt.datetime(2025, 1, 1, 0, 0, 0),
     "html": b"<html><body><p>alpha beta</p></body></html>"},
    {"url": "https://w/2", "warc_ts": dt.datetime(2025, 1, 1, 0, 1, 0),
     "html": b"<html><body><p>gamma delta</p></body></html>"},
]


class TestWarcCodec:
    @pytest.mark.parametrize("gz", [True, False])
    def test_roundtrip(self, gz):
        data = write_warc(ROWS, gzip_members=gz)
        pages = warc_bytes_to_pages(data)
        assert [p["url"] for p in pages] == ["https://w/1", "https://w/2"]
        assert pages[0]["html"] == ROWS[0]["html"]  # HTTP headers stripped
        assert pages[0]["warc_ts"] == ROWS[0]["warc_ts"]

    def test_non_response_records_skipped(self):
        req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
               b"WARC-Target-URI: https://w/9\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
        data = req + write_warc(ROWS[:1], gzip_members=False)
        assert [p["url"] for p in warc_bytes_to_pages(data)] == ["https://w/1"]

    def test_truncated_tail_yields_complete_prefix(self):
        data = write_warc(ROWS, gzip_members=False)
        cut = data[: len(data) - 20]  # tear the second record's body
        assert [h.get("warc-target-uri") for h, _ in iter_warc_records(cut)] == [
            "https://w/1"
        ]

    def test_garbage_is_empty_not_raising(self):
        assert warc_bytes_to_pages(b"not a warc at all") == []
        assert warc_bytes_to_pages(b"") == []


class TestWarcPipelineEquivalence:
    def test_warc_and_parquet_paths_agree(self, spark, micro_corpus, tmp_path_factory):
        """Flagship: DedupPipeline over read_warc(.warc.gz of the synth
        corpus) == DedupPipeline over the same rows as a DataFrame — same
        canonical count and cluster membership."""
        from deduplication_challenge_spark.config import DedupConfig
        from deduplication_challenge_spark.plans.pipeline import DedupPipeline
        from tests.test_spark_pipeline import corpus_to_spark

        warc_path = tmp_path_factory.mktemp("warc_in")
        rows = [
            {"url": p["url"], "warc_ts": p["warc_ts"], "html": p["html"]}
            for p in micro_corpus.rows
        ]
        # shard across two archives to exercise per-file parallelism
        (warc_path / "part-0.warc.gz").write_bytes(write_warc(rows[::2]))
        (warc_path / "part-1.warc.gz").write_bytes(write_warc(rows[1::2]))

        pages_warc = read_warc(spark, str(warc_path))
        assert pages_warc.count() == len(rows)

        wd1 = str(tmp_path_factory.mktemp("wd_warc"))
        can_warc, _ = DedupPipeline(
            spark, DedupConfig(), wd1, include_substring=True, substring_partitions=1
        ).run(pages_warc, input_desc="warc")

        pages_df, _ = corpus_to_spark(spark, micro_corpus)
        wd2 = str(tmp_path_factory.mktemp("wd_df"))
        can_df, _ = DedupPipeline(
            spark, DedupConfig(), wd2, include_substring=True, substring_partitions=1
        ).run(pages_df, input_desc="df")

        got = {tuple(sorted(r["member_urls"])) for r in can_warc.collect()}
        want = {tuple(sorted(r["member_urls"])) for r in can_df.collect()}
        assert got == want


class TestCharsetRoundtrip:
    def test_http_charset_reaches_extraction(self, spark, tmp_path_factory):
        """Fixture WARC with latin-1 (HTTP-header-declared), windows-1252
        (meta-declared), and utf-16 (BOM) bodies round-trips to CORRECT
        text through read_warc -> extract_pages — the transport charset
        rides the pages' charset column into the extraction precedence."""
        from deduplication_challenge_spark.operators.ingest import extract_pages

        rows = [
            {"url": "https://cs/latin1",
             "html": "<p>café exposé</p>".encode("latin-1"),
             "charset": "ISO-8859-1"},
            {"url": "https://cs/w1252",
             "html": "<meta charset=windows-1252><p>“smart” – quotes</p>".encode("cp1252")},
            {"url": "https://cs/utf16",
             "html": "<p>日本語のページ</p>".encode("utf-16")},
            {"url": "https://cs/plain",
             "html": "<p>plain utf-8 é</p>".encode()},
        ]
        path = tmp_path_factory.mktemp("warc_cs")
        (path / "cs.warc.gz").write_bytes(write_warc(rows))
        pages = read_warc(spark, str(path))
        assert "charset" in pages.columns
        got = {r["url"]: r["text"] for r in extract_pages(pages).collect()}
        assert got["https://cs/latin1"] == "café exposé"
        assert got["https://cs/w1252"] == "“smart” – quotes"
        assert got["https://cs/utf16"] == "日本語のページ"
        assert got["https://cs/plain"] == "plain utf-8 é"

    def test_quoted_header_charset_parsed(self):
        """Review finding: quoted parameter values are legal HTTP
        (charset="shift_jis") — the regex must not drop them."""
        body = "<p>日本語テスト</p>".encode("shift-jis")
        http = (b"HTTP/1.1 200 OK\r\n"
                b'Content-Type: text/html; charset="shift_jis"\r\n\r\n' + body)
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://cs/q\r\n"
               b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
               + f"Content-Length: {len(http)}\r\n".encode()
               + b"\r\n" + http + b"\r\n\r\n")
        pages = warc_bytes_to_pages(rec)
        assert pages[0]["charset"] == "shift_jis"
        from deduplication_challenge_spark.functions.textnorm import extract_text

        assert extract_text(pages[0]["html"], pages[0]["charset"]) == "日本語テスト"

    def test_write_warc_survives_mojibake_charset(self):
        """Review finding: read_warc can surface U+FFFD in a malformed
        header's charset token; round-tripping such a row must not abort."""
        rows = [{"url": "https://cs/m", "html": b"<p>x</p>", "charset": "ut�8"}]
        out = warc_bytes_to_pages(write_warc(rows))
        assert out[0]["url"] == "https://cs/m"  # wrote + parsed back fine

    def test_extraction_invariant_covers_charset_branch(self):
        """pages-level invariant: text == extract_text(html, charset) for
        every record the reader emits, charset column included."""
        from deduplication_challenge_spark.functions.textnorm import extract_text

        rows = [
            {"url": "https://cs/a", "html": "<p>naïve</p>".encode("latin-1"),
             "charset": "latin-1"},
            {"url": "https://cs/b", "html": b"<p>plain</p>"},
        ]
        for p in warc_bytes_to_pages(write_warc(rows)):
            text = extract_text(p["html"], p["charset"])
            assert text  # non-degenerate
            if p["url"].endswith("/a"):
                assert text == "naïve"


class TestWetAndCorruption:
    def test_wet_conversion_records(self, spark, tmp_path_factory):
        """Common Crawl WET: 'conversion' records carry extracted text; the
        reader ships it in the text column with html null (pruned plan)."""
        text = "already extracted text\n\nsecond paragraph"
        body = text.encode()
        rec = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
               b"WARC-Target-URI: https://w/wet\r\n"
               b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
               + f"Content-Length: {len(body)}\r\n".encode()
               + b"\r\n" + body + b"\r\n\r\n")
        path = tmp_path_factory.mktemp("wet")
        (path / "f.warc.gz").write_bytes(__import__("gzip").compress(rec))
        out = read_warc(spark, str(path), record_type="conversion").collect()
        assert len(out) == 1
        assert out[0]["text"] == text and out[0]["html"] is None
        # response-mode read of the same file yields nothing (type filter)
        assert read_warc(spark, str(path)).count() == 0
        with pytest.raises(ValueError, match="record_type"):
            read_warc(spark, str(path), record_type="metadata")

    def test_corrupt_gzip_member_yields_prefix(self):
        """A truncated/corrupt gzip member costs its own records only."""
        import gzip as _gzip

        good = write_warc(ROWS[:1])
        bad = _gzip.compress(b"x" * 50)[:20]  # torn member
        pages = warc_bytes_to_pages(good + bad)
        assert [p["url"] for p in pages] == ["https://w/1"]
