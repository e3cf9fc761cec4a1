"""Exploration probes: Spark-first restatements of the reference's helper
queries (/root/reference/src/helper.py) that are not already covered by the
oracled query inventory.

Each probe is a plain DataFrame transform (one hash aggregate, map-side
partial agg) instead of the reference's driver-side pandas groupby loops —
the same question, asked of a distributed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def same_url_groups(
    df: DataFrame, url_col: str = "page_url", id_col: str = "id"
) -> DataFrame:
    """'Same url contains > 1 product?' (helper.py:105-111): urls that occur
    on more than one row, with their row count and min id.  Null/empty urls
    never group (the reference's pandas groupby drops NaN keys; N missing
    urls are N missing urls, not one N-row 'duplicate')."""
    return (
        df.where(F.col(url_col).isNotNull() & (F.col(url_col) != ""))
        .groupBy(url_col)
        .agg(F.count("*").alias("n_rows"), F.min(id_col).alias("min_id"))
        .where(F.col("n_rows") >= 2)
    )


def identifier_group_sizes(df: DataFrame, id_col: str = "product_identifier") -> DataFrame:
    """'Same product_identifier' group sizes (helper.py:134-160): valid
    identifiers that group >= 2 rows."""
    return (
        df.where(F.col(id_col).isNotNull() & (F.col(id_col) != "")
                 & (F.col(id_col) != "SKU: Not Available"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_rows"))
        .where(F.col("n_rows") >= 2)
    )
