"""Products table: the reference's input schema (FIXTURES.md §2) + a
deterministic synthetic generator for merge-policy tests.

Schema mirrors the reference's column enum
(/root/reference/src/settings.py:11-46) and the arrow types of its shipped
sample parquet — re-declared here as a Spark StructType (the reference's
pandas normalization layer, /root/reference/src/controller.py:28-58, is
unnecessary in Spark: nested data stays ArrayType(StructType) end-to-end,
SURVEY.md §1.3).
"""

from __future__ import annotations

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
