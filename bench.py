"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <e2e secs>, "unit": "sec", "queries": {...}, "sf": ...}

Headline = the full near-dup pipeline (the engine's reason to exist) plus a
representative cut of the operator inventory. Pipeline stages run with a
fresh workdir (no resume hits). Scaling-efficiency evidence (local[8] vs
local[32]) is produced separately by tools/bench_scaling.py and recorded in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from deduplication_challenge_spark import entry_queries as eq
    from deduplication_challenge_spark.config import DedupConfig
    from deduplication_challenge_spark.plans.pipeline import DedupPipeline
    from deduplication_challenge_spark.session import build_session
    from deduplication_challenge_spark.sources.pages import pages_from_documents

    spark = build_session("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    timings: dict[str, float] = {}

    # --- headline: full near-dup pipeline over pages derived from documents
    workdir = tempfile.mkdtemp(prefix="dedup_bench_")
    try:
        pages = pages_from_documents(spark, sf_dir)
        pipe = DedupPipeline(spark, DedupConfig(), workdir, include_substring=True)
        t0 = time.monotonic()
        canonical, report = pipe.run(pages, input_desc=f"bench:{sf_dir}")
        n_canonical = canonical.count()
        e2e = time.monotonic() - t0
        for stage, info in report.stages.items():
            timings[f"pipeline_{stage}"] = round(info.seconds, 3)
        timings["pipeline_e2e"] = round(e2e, 3)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    # --- pruned-ingest variant: trust the shipped text column (scale-correct
    # plan when extraction happened upstream; the scan never reads html)
    workdir2 = tempfile.mkdtemp(prefix="dedup_bench_pruned_")
    try:
        pages_pruned = pages_from_documents(spark, sf_dir, with_html=False)
        pipe2 = DedupPipeline(
            spark, DedupConfig(), workdir2, include_substring=True, recompute_text=False
        )
        t0 = time.monotonic()
        canonical2, report2 = pipe2.run(pages_pruned, input_desc=f"bench-pruned:{sf_dir}")
        n_canonical2 = canonical2.count()
        e2e_pruned = time.monotonic() - t0
        timings["pipeline_ingest_pruned"] = round(report2.stages["ingest"].seconds, 3)
        timings["pipeline_e2e_pruned"] = round(e2e_pruned, 3)
        assert n_canonical2 == n_canonical, (
            f"pruned-ingest path changed output: {n_canonical2} != {n_canonical}"
        )
    finally:
        shutil.rmtree(workdir2, ignore_errors=True)

    # --- representative operator queries
    bench_queries = [
        "prefix40_dup_groups", "ngram_jaccard_pairs", "token_stats",
        "quality_scores", "gopher_quality_flags", "c4_line_filter_stats",
        "lang_id_heuristic", "embedding_norms",
        "embedding_near_dup_pairs_lsh",
        "doc_repetition_signals", "boilerplate_rate_by_source",
        "paragraph_dedup_docs", "contamination_flags", "hash_sample_by_source",
        "pii_redaction", "url_canonicalization",
        "pricing_summary", "top_customers", "region_nation_rollup",
        "events_user_sessions", "supplier_part_topk",
    ]
    for name in bench_queries:
        fn = eq.QUERIES[name]
        t0 = time.monotonic()
        # full materialization (collect, like the correctness driver), NOT
        # count(): count() lets Catalyst prune computed columns, so a
        # projection-only query (pii_redaction, url_canonicalization, ...)
        # would be timed as a scan count instead of its actual work
        n = len(fn(spark, sf_dir).collect())
        timings[name] = round(time.monotonic() - t0, 3)

    # docs/sec throughput for the pipeline (north-star metric)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs_per_sec = round(n_docs / e2e, 1) if e2e > 0 else 0.0

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "dedup_pipeline_e2e_plus_operator_suite",
                "value": round(e2e, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "canonical_records": n_canonical,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
