"""Product-path e2e runner: the Spark analog of the reference's
``python main.py -p`` (/root/reference/src/main.py:100-146) — read a products
parquet in the reference's schema, merge duplicate groups by
product_identifier (all policies: elections, completing, intervals, color,
energy, details provenance), and write the standardized parquet, including
``details='{}'`` on passthrough rows.

    python tools/run_product_pipeline.py --input products.parquet --output out_dir

Also importable: ``run(spark, input_path, output_path)`` (used by the e2e
golden test, which replays the reference's 4-product sample corpus,
/root/reference/src/tests/constants.py:10-197).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(spark, input_path: str, output_path: str) -> dict:
    from deduplication_challenge_spark.operators.product_merge import consolidate_products

    products = spark.read.parquet(input_path)
    out = consolidate_products(products)
    out.write.mode("overwrite").parquet(output_path)
    n_in = products.count()
    n_out = spark.read.parquet(output_path).count()
    return {"input_rows": n_in, "output_rows": n_out, "output": output_path}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="products parquet (reference schema)")
    ap.add_argument("--output", required=True, help="output parquet directory")
    args = ap.parse_args()

    from deduplication_challenge_spark.session import build_session

    spark = build_session("product-merge")
    try:
        stats = run(spark, args.input, args.output)
        print(stats)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
