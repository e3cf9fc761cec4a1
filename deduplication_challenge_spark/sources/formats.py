"""Text-format pages sources — JSONL and CSV adapters onto the pipeline's
pages schema, for corpora exported by upstream tools that don't speak
parquet (scrapy dumps, labeling exports, quick fixtures).

Both readers ENFORCE the pages schema (explicit schema, never inferSchema
— schema inference reads the data twice and silently drifts between
batches) and normalize the html column: JSON/CSV cannot carry raw bytes,
so html rides as base64 text and is decoded with ``unbase64`` JVM-side.
Missing columns fail loudly at read time, not three stages later.

Scale notes: JSONL is line-splittable (parallel across and within files);
CSV is splittable only without embedded newlines — ``multiLine`` stays
False here for that reason, and quoted-newline exports belong in parquet.
Writers exist for tests and round-tripping small fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
import pyspark.sql.types as T

PAGES_FIELDS = [
    ("url", T.StringType()),
    ("warc_ts", T.TimestampType()),
    ("html_b64", T.StringType()),  # binary rides as base64 in text formats
    ("text", T.StringType()),
    ("lang", T.StringType()),
]
TEXT_SCHEMA = T.StructType([T.StructField(n, t) for n, t in PAGES_FIELDS])


def _finish(raw: DataFrame) -> DataFrame:
    missing = [n for n, _ in PAGES_FIELDS if n not in raw.columns]
    if missing:
        raise ValueError(f"pages source is missing columns: {missing}")
    return raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines pages -> (url, warc_ts, html, text, lang)."""
    return _finish(spark.read.schema(TEXT_SCHEMA).json(path))


def read_pages_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV pages (header row) -> (url, warc_ts, html, text, lang)."""
    return _finish(
        spark.read.schema(TEXT_SCHEMA).option("header", True).csv(path)
    )


def write_pages_jsonl(pages: DataFrame, path: str) -> None:
    pages.select(
        "url", "warc_ts", F.base64("html").alias("html_b64"), "text", "lang"
    ).write.mode("overwrite").json(path)


def write_pages_csv(pages: DataFrame, path: str) -> None:
    pages.select(
        "url", "warc_ts", F.base64("html").alias("html_b64"), "text", "lang"
    ).write.mode("overwrite").option("header", True).csv(path)
