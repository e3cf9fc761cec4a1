"""JSONL/CSV pages adapters: binary-safe roundtrips and pipeline-input
compatibility (the adapter output feeds extract_pages unchanged)."""

from __future__ import annotations

import datetime as dt

import pytest

from deduplication_challenge_spark.operators.ingest import extract_pages
from deduplication_challenge_spark.sources.formats import (
    read_pages_csv,
    read_pages_jsonl,
    write_pages_csv,
    write_pages_jsonl,
)

ROWS = [
    ("https://f/1", dt.datetime(2025, 1, 1), b"<html><body><p>alpha</p></body></html>",
     None, "en"),
    ("https://f/2", dt.datetime(2025, 1, 2), None, "pre-extracted text", "de"),
]
DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_roundtrip_and_pipeline_compat(spark, tmp_path_factory, fmt):
    src = spark.createDataFrame(ROWS, DDL)
    path = str(tmp_path_factory.mktemp(f"fmt_{fmt}"))
    writer = write_pages_jsonl if fmt == "jsonl" else write_pages_csv
    reader = read_pages_jsonl if fmt == "jsonl" else read_pages_csv
    writer(src, path)
    back = reader(spark, path)
    got = {r["url"]: r for r in back.collect()}
    assert bytes(got["https://f/1"]["html"]) == ROWS[0][2]  # binary survives b64
    assert got["https://f/2"]["html"] is None
    assert got["https://f/2"]["text"] == "pre-extracted text"
    assert got["https://f/1"]["warc_ts"] == ROWS[0][1]
    # straight into the ingest stage: extraction runs where html exists,
    # shipped text is trusted where it doesn't
    docs = {r["url"]: r for r in extract_pages(back).collect()}
    assert docs["https://f/1"]["text"] == "alpha"
    assert docs["https://f/2"]["text"] == "pre-extracted text"


def test_missing_columns_fail_loudly(spark, tmp_path_factory):
    import os
    path = str(tmp_path_factory.mktemp("fmt_bad"))
    with open(os.path.join(path, "x.json"), "w") as f:
        f.write('{"url": "https://f/9"}\n')
    # schema-enforced read still yields the declared columns (nulls), so the
    # guard targets structurally different frames; simulate one directly
    from deduplication_challenge_spark.sources.formats import _finish

    with pytest.raises(ValueError, match="missing columns"):
        _finish(spark.createDataFrame([("u",)], "url string"))


def test_csv_embedded_newlines_roundtrip(spark, tmp_path_factory):
    """Review finding: extracted text contains newlines (the engine's own
    paragraph separator); the CSV path must not shear quoted records."""
    rows = [("https://f/nl", dt.datetime(2025, 1, 3), None,
             "para one\n\npara two\nline", "en")]
    src = spark.createDataFrame(rows, DDL)
    path = str(tmp_path_factory.mktemp("fmt_nl"))
    write_pages_csv(src, path)
    back = read_pages_csv(spark, path).collect()
    assert len(back) == 1
    assert back[0]["text"] == "para one\n\npara two\nline"


def test_csv_reordered_columns_match_by_name(spark, tmp_path_factory):
    """Advisor finding: a user schema maps CSV columns POSITIONALLY, so a
    file with the same columns in a different order silently mis-assigned
    (text read as lang).  The reader now matches by header name — any
    column order round-trips correctly."""
    import os

    path = str(tmp_path_factory.mktemp("fmt_reorder"))
    with open(os.path.join(path, "x.csv"), "w") as f:
        # lang before text, url last — a legal header, different order
        f.write("lang,text,warc_ts,html_b64,url\n")
        f.write('en,"the body text",2025-01-01T00:00:00.000Z,,https://f/ro\n')
    back = read_pages_csv(spark, path).collect()
    assert len(back) == 1
    assert back[0]["url"] == "https://f/ro"
    assert back[0]["text"] == "the body text"
    assert back[0]["lang"] == "en"
    assert back[0]["warc_ts"] == dt.datetime(2025, 1, 1)


def test_structurally_wrong_file_fails_loudly(spark, tmp_path_factory):
    """A JSONL file without the url field null-fills under the enforced
    schema; the bounded probe turns that into an error, not a null corpus."""
    import os

    path = str(tmp_path_factory.mktemp("fmt_nourl"))
    with open(os.path.join(path, "x.json"), "w") as f:
        f.write('{"text": "no url field here", "lang": "en"}\n')
    with pytest.raises(ValueError, match="probe"):
        read_pages_jsonl(spark, path)
