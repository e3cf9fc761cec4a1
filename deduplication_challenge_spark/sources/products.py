"""Products table: the reference's input schema (FIXTURES.md §2) + a
deterministic synthetic generator for merge-policy tests.

Schema mirrors the reference's column enum
(/root/reference/src/settings.py:11-46) and the arrow types of its shipped
sample parquet — re-declared here as a Spark StructType (the reference's
pandas normalization layer, /root/reference/src/controller.py:28-58, is
unnecessary in Spark: nested data stays ArrayType(StructType) end-to-end,
SURVEY.md §1.3).

``products_from_documents`` derives a deterministic products table from the
driver's documents table using arithmetic both Spark AND DuckDB evaluate
identically — that is what puts the full merge-policy engine
(operators/product_merge.py) under the driver's differential-oracle gate
(queries consolidated_products / consolidated_product_intervals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
import pyspark.sql.types as T

# --- policy lists (semantics from /root/reference/src/settings.py:49-86) ---
MERGE_BY_MOST_FREQUENT = ["unspsc", "root_domain", "brand"]
MERGE_BY_LEAST_FREQUENT = ["product_name", "product_title"]
MERGE_BY_MIN_VALUE = ["id"]
MERGE_BY_LENGTHIEST_VALUE = ["description", "product_summary"]
MERGE_BY_COMPLETING_ARRAYS = [
    "intended_industries",
    "applicability",
    "ethical_and_sustainability_practices",
    "materials",
    "ingredients",
    "manufacturing_countries",
    "manufacturing_type",
    "customization",
    "packaging_type",
    "form",
    "quality_standards_and_certifications",
    "miscellaneous_features",
]
MERGE_BY_COMPLETING_SCALARS = ["eco_friendly", "manufacturing_year"]
INTERVAL_FIELDS = {
    # field -> (key columns, numeric value column) — the reference's exact A8
    # aggregation keys (/root/reference/src/controller.py:292-303).  Non-key
    # struct fields (e.g. price 'type') are dropped from merged output, as
    # the reference does.
    "production_capacity": (["time_frame", "unit"], "quantity"),
    "price": (["currency"], "amount"),
    "size": (["dimension", "unit"], "value"),
    "purity": (["qualitative", "unit"], "value"),
    "pressure_rating": (["qualitative", "unit"], "value"),
    "power_rating": (["qualitative", "unit"], "value"),
}
COLOR_FIELD = "color"
ENERGY_FIELD = "energy_efficiency"
IDENTIFIER = "product_identifier"
PAGE_URL = "page_url"
INVALID_IDENTIFIERS = ("", "SKU: Not Available")  # /root/reference/src/main.py:85-89


def _rated(extra: list[T.StructField] | None = None) -> T.ArrayType:
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("qualitative", T.BooleanType()),
                T.StructField("type", T.StringType()),
                T.StructField("unit", T.StringType()),
                T.StructField("value", T.StringType()),
            ]
            + (extra or [])
        )
    )


PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("unspsc", T.StringType()),
        T.StructField("root_domain", T.StringType()),
        T.StructField("page_url", T.StringType()),
        T.StructField("product_title", T.StringType()),
        T.StructField("product_summary", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("product_identifier", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("intended_industries", T.ArrayType(T.StringType())),
        T.StructField("applicability", T.ArrayType(T.StringType())),
        T.StructField("ethical_and_sustainability_practices", T.ArrayType(T.StringType())),
        T.StructField("materials", T.ArrayType(T.StringType())),
        T.StructField("ingredients", T.ArrayType(T.StringType())),
        T.StructField("manufacturing_countries", T.ArrayType(T.StringType())),
        T.StructField("manufacturing_type", T.ArrayType(T.StringType())),
        T.StructField("customization", T.ArrayType(T.StringType())),
        T.StructField("packaging_type", T.ArrayType(T.StringType())),
        T.StructField("form", T.ArrayType(T.StringType())),
        T.StructField("quality_standards_and_certifications", T.ArrayType(T.StringType())),
        T.StructField("miscellaneous_features", T.ArrayType(T.StringType())),
        T.StructField("eco_friendly", T.BooleanType()),
        T.StructField("manufacturing_year", T.IntegerType()),
        T.StructField(
            "production_capacity",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("quantity", T.LongType()),
                        T.StructField("time_frame", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("unit", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "price",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("amount", T.DoubleType()),
                        T.StructField("currency", T.StringType()),
                        T.StructField("type", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "size",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("dimension", T.StringType()),
                        T.StructField("qualitative", T.BooleanType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("unit", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("purity", _rated()),
        T.StructField("pressure_rating", _rated()),
        T.StructField("power_rating", _rated()),
        T.StructField(
            "color",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("original", T.StringType()),
                        T.StructField("simple", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "energy_efficiency",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("exact_percentage", T.DoubleType()),
                        T.StructField("max_percentage", T.DoubleType()),
                        T.StructField("min_percentage", T.DoubleType()),
                        T.StructField("qualitative", T.StringType()),
                        T.StructField("standard_label", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def products_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a full-schema products table from a documents table
    (doc_id, text, lang, source, n_chars) with arithmetic DuckDB replays
    verbatim (see entry_queries.ORACLE_SQL['consolidated_products']):

      * identifier: doc_id%10 in 0..3 -> 'CAS-(doc_id%40)' (multi-member
        groups), 4 -> '' and 5 -> 'SKU: Not Available' (the reference's
        invalid keys, /root/reference/src/main.py:85-89), else unique;
      * election fields keyed off lang/source/n_chars with planted nulls;
      * page_url contains root_domain (J3 substring-match join);
      * price: one numeric entry + one null-amount entry (skipped by A8);
      * size: numeric-string values with a planted 'tall' literal wherever
        doc_id%4=0 (A8 literal fallback);
      * unused schema fields ride along as typed NULLs.
    """
    derived = docs.select(
        F.col("doc_id").alias("id"),
        F.expr(
            "CASE WHEN doc_id % 10 <= 3 THEN concat('CAS-', cast(doc_id % 40 AS string)) "
            "WHEN doc_id % 10 = 4 THEN '' "
            "WHEN doc_id % 10 = 5 THEN 'SKU: Not Available' "
            "ELSE concat('UNIQ-', cast(doc_id AS string)) END"
        ).alias(IDENTIFIER),
        F.expr(
            "CASE WHEN doc_id % 11 = 0 THEN NULL "
            "ELSE concat(lang, '-', cast(n_chars % 4 AS string)) END"
        ).alias("brand"),
        F.expr(
            "CASE WHEN doc_id % 13 = 0 THEN NULL "
            "ELSE concat('U', cast(n_chars % 7 AS string)) END"
        ).alias("unspsc"),
        F.col("source").alias("root_domain"),
        F.expr("concat('N', cast(n_chars % 13 AS string))").alias("product_name"),
        F.expr("concat('T', cast(n_chars % 11 AS string))").alias("product_title"),
        F.col("text").alias("description"),
        F.expr("substring(text, 1, cast(1 + doc_id % 40 AS int))").alias("product_summary"),
        F.expr(
            "concat('https://', source, '.example/p/', cast(doc_id AS string))"
        ).alias(PAGE_URL),
        F.array("lang", "source").alias("intended_industries"),
        F.expr(
            "CASE WHEN n_chars % 3 = 0 THEN array(lang) "
            "WHEN n_chars % 3 = 1 THEN array() ELSE NULL END"
        ).cast("array<string>").alias("materials"),
        F.expr("CASE WHEN doc_id % 5 = 0 THEN NULL ELSE doc_id % 3 = 0 END").alias("eco_friendly"),
        F.expr(
            "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE cast(2015 + doc_id % 8 AS int) END"
        ).alias("manufacturing_year"),
        F.expr(
            "array(named_struct("
            "  'amount', cast((n_chars % 97) + 0.5 AS double),"
            "  'currency', element_at(array('USD','EUR','GBP'), cast(doc_id % 3 AS int) + 1),"
            "  'type', 'exact'),"
            "named_struct("
            "  'amount', cast(NULL AS double), 'currency', 'USD', 'type', 'list'))"
        ).alias("price"),
        F.expr(
            "array(named_struct("
            "  'dimension', element_at(array('h','w'), cast(n_chars % 2 AS int) + 1),"
            "  'qualitative', false, 'type', 'exact', 'unit', 'cm',"
            "  'value', CASE WHEN doc_id % 4 = 0 THEN 'tall' ELSE cast(n_chars % 50 AS string) END))"
        ).alias("size"),
    )
    have = set(derived.columns)
    cols = [
        (F.col(f.name) if f.name in have else F.lit(None).cast(f.dataType).alias(f.name))
        for f in PRODUCTS_SCHEMA.fields
    ]
    out = derived.select(*cols)
    # pin nested types exactly to the canonical schema (struct field types)
    for f in PRODUCTS_SCHEMA.fields:
        if f.name in ("price", "size"):
            out = out.withColumn(f.name, F.col(f.name).cast(f.dataType))
    return out
