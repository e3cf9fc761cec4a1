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
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages parquet path")
    src.add_argument(
        "--table",
        help="catalog table name (e.g. an Iceberg table 'catalog.db.pages'); "
        "read via spark.read.table — partition pruning / snapshot isolation "
        "come from the catalog's DataSourceV2 implementation",
    )
    ap.add_argument("--workdir", required=True, help="stage checkpoint dir")
    ap.add_argument("--output", default=None, help="optional extra canonical copy")
    ap.add_argument("--no-substring", action="store_true")
    ap.add_argument("--substring-partitions", type=int, default=None)
    ap.add_argument(
        "--no-recompute-text", action="store_true",
        help="trust the shipped text column (the scan never reads html)",
    )
    ap.add_argument(
        "--line-dedup-min-docs", type=int, default=None,
        help="enable the sub-document pre-stage: remove lines appearing in "
        ">= N distinct docs before signatures (CCNet boilerplate removal)",
    )
    ap.add_argument(
        "--url-dedup", action="store_true",
        help="enable the urldedup pre-stage: first-seen page per canonical "
        "url, before extraction",
    )
    ap.add_argument(
        "--incremental-index", default=None, metavar="WORKDIR",
        help="attach this batch to an EXISTING index (a completed pipeline "
        "workdir) instead of running the full pipeline; prints the delta "
        "report and writes canonical updates to --output",
    )
    args = ap.parse_args()

    from dataclasses import replace

    from deduplication_challenge_spark.config import DedupConfig
    from deduplication_challenge_spark.plans.pipeline import DedupPipeline

    spark = SparkSession.builder.appName("dedup-pipeline").getOrCreate()
    pages = (
        spark.read.table(args.table) if args.table else spark.read.parquet(args.input)
    )
    if args.incremental_index:
        from deduplication_challenge_spark.plans.incremental import IncrementalDedup

        inc = IncrementalDedup(
            spark,
            replace(DedupConfig(), line_dedup_min_docs=args.line_dedup_min_docs,
                    url_dedup=args.url_dedup),
            args.incremental_index,
        )
        updates, _assignments, _bridges, rep = inc.run(
            pages, recompute_text=not args.no_recompute_text
        )
        if args.output:
            updates.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"incremental": rep}))
        spark.stop()
        return
    pipe = DedupPipeline(
        spark,
        replace(DedupConfig(), line_dedup_min_docs=args.line_dedup_min_docs,
                url_dedup=args.url_dedup),
        args.workdir,
        include_substring=not args.no_substring,
        substring_partitions=args.substring_partitions,
        recompute_text=not args.no_recompute_text,
    )
    canonical, report = pipe.run(pages, input_desc=args.table or args.input)
    if args.output:
        canonical.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"stages": report.to_dict(), "counters": report.counters}))
    spark.stop()


if __name__ == "__main__":
    main()
