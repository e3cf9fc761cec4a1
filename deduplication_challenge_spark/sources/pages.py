"""Adapters from the driver-provided tables to the north-rule pages schema.

The driver ships read-only parquet at /root/testdata/sf*/ (TESTDATA.md);
its ``documents`` table is ``(doc_id, text, lang, source, n_chars)``. For
bench/e2e runs over driver data we derive the exact input_hint shape
``(url, warc_ts, html, text, lang)`` deterministically and Spark-side
(no driver-side materialization):

  * ``url``     = https://{source}.example/doc/{doc_id}   (unique per row)
  * ``warc_ts`` = fixed epoch + doc_id seconds            (deterministic)
  * ``html``    = deterministic wrapper of ``text``       (Arrow pandas UDF)
  * ``text``    = re-extracted from html downstream (ingest stage), so the
                  byte-identical invariant is exercised on driver data too.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from deduplication_challenge_spark.functions.textnorm import extract_text


@F.pandas_udf(BinaryType())
def _wrap_html(text: pd.Series) -> pd.Series:
    """Deterministic text -> html wrapper (vectorized, Arrow-batched)."""

    def wrap(t: str) -> bytes:
        t = t or ""
        paras = "".join(f"<p>{p}</p>" for p in t.split("\n"))
        return (
            f"<html><head><title></title><script>var _=1;</script></head>"
            f"<body>{paras}</body></html>"
        ).encode("utf-8")

    return text.map(wrap)


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages_from_documents(
    spark: SparkSession, sf_dir: str, with_html: bool = True
) -> DataFrame:
    """Driver documents table -> north-rule pages table (all Spark-side).

    ``with_html=False`` ships a null html column instead of synthesizing
    html bytes — paired with ``extract_pages(recompute_text=False)`` this is
    the pure-column-pruning ingest plan (the scale-correct path when text is
    already extracted upstream; the scan then never touches html at all)."""
    docs = read_documents(spark, sf_dir)
    html_col = (
        _wrap_html(F.col("text")) if with_html else F.lit(None).cast("binary")
    )
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/doc/"), F.col("doc_id"))
        .alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        html_col.alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def expected_text_oracle(raw_text: str) -> str:
    """What the ingest stage will produce for a document wrapped by
    ``_wrap_html`` — pure-Python oracle for the per-row invariant test."""
    t = raw_text or ""
    paras = "".join(f"<p>{p}</p>" for p in t.split("\n"))
    html = (
        f"<html><head><title></title><script>var _=1;</script></head>"
        f"<body>{paras}</body></html>"
    ).encode("utf-8")
    return extract_text(html)
