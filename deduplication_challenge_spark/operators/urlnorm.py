"""URL canonicalization + URL-level dedup — the cheapest first pass of a
crawl pipeline: the same page crawled as ``http://WWW.Example.com:80/a/`` and
``https://example.com/a`` should collapse BEFORE any content hashing runs.

Canonicalization rules (pinned, conservative — rules that can change which
resource a url names, like query-param sorting or index.html stripping, are
deliberately NOT applied):
  * scheme and host lowercased; ``www.`` prefix dropped from the host;
  * default ports stripped (``:80`` for http, ``:443`` for https);
  * fragment (``#...``) dropped — fragments never reach the server;
  * trailing slash dropped from non-root paths;
  * scheme folded to https (http and https crawls of one host are the
    same resource corpus for dedup purposes).

Scale shape: pure row-local regexp/string expressions — zero shuffles,
whole-stage codegen; the dedup step is one hash aggregate on the canonical
url (first-seen by (warc_ts, url) wins, deterministic).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url_py(u: str) -> str:
    """Pure-Python twin of :func:`canonical_url` (oracle + test mirror);
    rule-for-rule identical, pinned by a parity test."""
    if not u or not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", u):
        return u
    rest = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://", "", u)
    host = re.match(r"^([^/?#]*)", rest).group(1).lower()
    path = re.match(r"^[^/?#]*([^#]*)", rest).group(1)
    host = re.sub(r"^www\.", "", host)
    host = re.sub(r":(80|443)$", "", host)
    path = re.sub(r"(.)/$", r"\1", path)
    return "https://" + host + path


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a url column (see module rules)."""
    u = F.col(col) if isinstance(col, str) else col
    # split scheme://host[:port]/rest once; non-matching strings pass through
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    path = F.regexp_extract(rest, r"^[^/?#]*([^#]*)", 1)  # path+query, no fragment
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_replace(path, r"(.)/$", "$1")  # trailing slash, non-root
    return F.when(
        scheme == "", u  # not a scheme://... url: pass through untouched
    ).otherwise(F.concat(F.lit("https://"), host, path))


#: null warc_ts (e.g. a WARC record with an unparseable date) sorts as the
#: EPOCH in the first-seen election — explicit so the ordering is total and
#: the pure-Python oracle mirror can reproduce it exactly
_NULL_TS = "1970-01-01 00:00:00"


def dedup_by_url(pages: DataFrame) -> DataFrame:
    """First-seen page per canonical url: (all input columns +
    canonical_url), one row per canonical url, earliest (warc_ts, url)
    wins — deterministic at any partitioning; rows tying EXACTLY on
    (warc_ts, url) all survive (the pinned rule the oracle mirrors).  Null
    timestamps sort as the epoch and the winner comparison is null-safe, so
    rows with missing dates (or even null urls) are deduped, never silently
    dropped.

    Plan shape: ONE shuffle — the winner election is a window min over the
    canonical-url partition, so rows move once and there is no groupBy +
    join-back re-scan (the r3 version shuffled three times for the same
    semantics; plan-audit check #19 pins the single exchange)."""
    from pyspark.sql.window import Window

    ts_key = F.coalesce("warc_ts", F.lit(_NULL_TS).cast("timestamp"))
    with_canon = (
        pages.withColumn("canonical_url", canonical_url("url"))
        .withColumn("_tskey", ts_key)
        # partition key coalesced: a null url (hence null canonical) forms
        # its own group instead of vanishing
        .withColumn("_ckey", F.coalesce("canonical_url", F.lit("\x00null-url")))
    )
    w = Window.partitionBy("_ckey")
    winner = F.min(
        F.struct(F.col("_tskey").alias("ts"), F.col("url").alias("url"))
    ).over(w)
    return (
        with_canon.withColumn("_w", winner)
        .where(
            F.col("_tskey").eqNullSafe(F.col("_w.ts"))
            & F.col("url").eqNullSafe(F.col("_w.url"))
        )
        .drop("_tskey", "_ckey", "_w")
    )
