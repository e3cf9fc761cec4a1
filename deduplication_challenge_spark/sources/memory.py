"""In-memory record source — the reference's in-process dict/list "DB"
surface (reference: src/helper.py builds pandas frames from in-memory
parquet loads and dict extracts; src/tests/constants.py hardcodes record
dicts for tests), re-expressed Spark-first: records become a DISTRIBUTED
DataFrame immediately via ``createDataFrame`` with the ENFORCED pages
schema — no driver-side dict lives past construction, so every downstream
operator runs identically whether the input came from parquet, WARC, JSONL
or a literal list.

Missing keys become NULLs only for nullable columns the pipeline treats as
optional (html, text, lang); a record missing ``url`` fails loudly — url
is the identity column (doc_id = xxhash64(url) downstream).  Unknown keys
fail loudly too: a typo'd column silently dropped is how test fixtures rot.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

# single source of truth for the pages schema — a hand-copied literal here
# could silently drift from what WARC/stream-sourced frames carry
from deduplication_challenge_spark.sources.warc import PAGES_DDL
_COLS = ("url", "warc_ts", "html", "text", "lang")
_OPTIONAL = {"warc_ts", "html", "text", "lang"}


def pages_from_records(
    spark: SparkSession, records: Iterable[Mapping[str, object]]
) -> DataFrame:
    """List/iterable of dicts -> pages DataFrame (enforced schema).

    Accepts ``warc_ts`` as datetime or ISO-8601 string; ``html`` as bytes
    or str (utf-8 encoded).  An EMPTY list still yields a valid empty
    frame with the right schema (so callers can union unconditionally).
    """
    rows = []
    for i, rec in enumerate(records):
        unknown = set(rec) - set(_COLS)
        if unknown:
            raise ValueError(f"record {i} has unknown keys {sorted(unknown)}")
        missing = set(_COLS) - set(rec) - _OPTIONAL
        if missing:
            raise ValueError(f"record {i} is missing required keys {sorted(missing)}")
        if not rec["url"]:
            # url is the identity column (doc_id = xxhash64(url) downstream);
            # a None/empty url would collide every such record into one id
            raise ValueError(f"record {i} has a null/empty url")
        ts = rec.get("warc_ts")
        if isinstance(ts, str):
            ts = _dt.datetime.fromisoformat(ts)
        html = rec.get("html")
        if isinstance(html, str):
            html = html.encode("utf-8")
        rows.append((rec["url"], ts, html, rec.get("text"), rec.get("lang")))
    return spark.createDataFrame(rows, PAGES_DDL)
