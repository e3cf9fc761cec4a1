"""spark-submit entrypoint for the dedup pipeline.

    spark-submit --py-files dist/dedup_engine.zip tools/submit_job.py \
        --input <pages parquet/table> --workdir <checkpoint dir> \
        [--no-substring] [--substring-partitions N] [--output <path>]

On a cluster the master/executor topology comes from spark-submit; this
script only declares the job. The SparkSession is fetched with
getOrCreate() so submit-provided conf wins.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet path")
    ap.add_argument("--workdir", required=True, help="stage checkpoint dir")
    ap.add_argument("--output", default=None, help="optional extra canonical copy")
    ap.add_argument("--no-substring", action="store_true")
    ap.add_argument("--substring-partitions", type=int, default=None)
    args = ap.parse_args()

    from deduplication_challenge_spark.config import DedupConfig
    from deduplication_challenge_spark.plans.pipeline import DedupPipeline

    spark = SparkSession.builder.appName("dedup-pipeline").getOrCreate()
    pages = spark.read.parquet(args.input)
    pipe = DedupPipeline(
        spark,
        DedupConfig(),
        args.workdir,
        include_substring=not args.no_substring,
        substring_partitions=args.substring_partitions,
    )
    canonical, report = pipe.run(pages, input_desc=args.input)
    if args.output:
        canonical.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"stages": report.to_dict(), "counters": report.counters}))
    spark.stop()


if __name__ == "__main__":
    main()
