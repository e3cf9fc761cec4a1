"""Text-format pages sources — JSONL and CSV adapters onto the pipeline's
pages schema, for corpora exported by upstream tools that don't speak
parquet (scrapy dumps, labeling exports, quick fixtures).

Both readers ENFORCE the pages schema (explicit schema, never inferSchema
— schema inference reads the data twice and silently drifts between
batches) and normalize the html column: JSON/CSV cannot carry raw bytes,
so html rides as base64 text and is decoded with ``unbase64`` JVM-side.
Schema-enforced reads null-fill fields that are absent from the file, so
"missing column" cannot fail at plan time — instead a bounded driver-side
probe inspects the first rows and raises when ``url`` never materializes
(the signature of a structurally wrong file), before any pipeline stage
runs on garbage.

Scale notes: JSONL is line-splittable (parallel across and within files).
CSV reads with ``multiLine=True`` because extracted text legitimately
contains newlines (linededup's own paragraph separator) and a
multiLine=False read would shear quoted records apart — the cost is that
CSV files are NOT input-splittable; prefer JSONL or parquet at scale.
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
    # bounded structural probe: a schema-enforced read of a file that lacks
    # the url field yields ALL-null urls — catch that here, loudly, instead
    # of deduping a corpus of nulls three stages later
    head = raw.select("url").limit(20).collect()
    if head and all(r["url"] is None for r in head):
        raise ValueError(
            "pages source probe: 'url' is null in every sampled row — wrong "
            "schema, wrong format, or a producer that dropped the column"
        )
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
    """CSV pages (header row) -> (url, warc_ts, html, text, lang).
    multiLine=True: extracted text contains newlines; correctness over
    splittability (see module docstring).

    CSV columns are matched BY HEADER NAME, not position: a user schema
    makes Spark assign columns positionally (enforceSchema), so a file with
    the same columns in a different order would silently land text in lang.
    Reading header-named string columns and selecting by name makes column
    order irrelevant; a genuinely missing column fails loudly in _finish."""
    raw = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    present = [n for n, _ in PAGES_FIELDS if n in raw.columns]
    typed = raw.select(
        *[F.col(n).cast(t).alias(n) for n, t in PAGES_FIELDS if n in present]
    )
    # null-fill absent columns (matching schema-enforced read semantics) so
    # _finish's structural probe — not a KeyError — reports what's wrong
    for n, t in PAGES_FIELDS:
        if n not in present:
            typed = typed.withColumn(n, F.lit(None).cast(t))
    return _finish(typed)


def write_pages_jsonl(pages: DataFrame, path: str) -> None:
    pages.select(
        "url", "warc_ts", F.base64("html").alias("html_b64"), "text", "lang"
    ).write.mode("overwrite").json(path)


def write_pages_csv(pages: DataFrame, path: str) -> None:
    pages.select(
        "url", "warc_ts", F.base64("html").alias("html_b64"), "text", "lang"
    ).write.mode("overwrite").option("header", True).csv(path)
