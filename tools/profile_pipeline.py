"""Fine-grained pipeline stage profiling (guide §1): splits each stage's
wall time into build+write vs counters, and times the heavy sub-steps of
candidates/consolidate individually with noop sinks.
Usage: python tools/profile_pipeline.py [sf_dir]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deduplication_challenge_spark.config import DedupConfig
from deduplication_challenge_spark.plans.pipeline import DedupPipeline
from deduplication_challenge_spark.session import build_session
from deduplication_challenge_spark.sources.pages import pages_from_documents


def noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = build_session("profile-pipeline", shuffle_partitions=32)
    sc = spark.sparkContext
    cfg = DedupConfig()

    # --- full run with per-stage report (same as bench)
    workdir = tempfile.mkdtemp(prefix="prof_pipe_")
    try:
        pages = pages_from_documents(spark, sf_dir)
        pipe = DedupPipeline(spark, cfg, workdir, include_substring=True)
        t0 = time.monotonic()
        canonical, report = pipe.run(pages, input_desc=f"profile:{sf_dir}")
        n = canonical.count()
        e2e = time.monotonic() - t0
        print(f"e2e={e2e:.2f}s canonical={n}")
        for s, info in report.stages.items():
            print(f"  stage {s}: {info.seconds:.2f}s rows={info.rows}")

        # --- sub-steps over the materialized stage tables
        docs = spark.read.parquet(f"{workdir}/ingest")
        sigs = spark.read.parquet(f"{workdir}/signatures")
        cands = spark.read.parquet(f"{workdir}/candidates")
        verified = spark.read.parquet(f"{workdir}/verify")
        assignments = spark.read.parquet(f"{workdir}/cc")

        from deduplication_challenge_spark.operators import lsh, simhash, suffixarray
        from deduplication_challenge_spark.operators.consolidate import (
            attach_clusters, consolidate,
        )
        from deduplication_challenge_spark.operators.ingest import extract_pages
        from deduplication_challenge_spark.operators.signatures import compute_signatures
        from deduplication_challenge_spark.operators.verify import verify_pairs

        sc.setJobDescription("sub: extract only")
        print(f"  sub extract_pages noop: {noop(extract_pages(pages)):.2f}s")
        sc.setJobDescription("sub: signatures only")
        print(f"  sub compute_signatures noop: {noop(compute_signatures(docs, cfg)):.2f}s")
        sc.setJobDescription("sub: lsh pairs")
        edges, _ = lsh.candidate_pairs(lsh.band_table(sigs), cfg)
        print(f"  sub lsh pairs noop: {noop(edges):.2f}s")
        sc.setJobDescription("sub: simhash pairs")
        sedges, _ = simhash.hamming_pairs(sigs, cfg)
        print(f"  sub simhash pairs noop: {noop(sedges):.2f}s")
        sc.setJobDescription("sub: substring anchors")
        anch = suffixarray.anchor_table(docs, cfg)
        print(f"  sub anchor_table noop: {noop(anch):.2f}s")
        sc.setJobDescription("sub: substring pairs global")
        print(
            f"  sub substring_pairs_global noop: "
            f"{noop(suffixarray.substring_pairs_global(docs, cfg)):.2f}s"
        )
        sc.setJobDescription("sub: verify")
        lsh_pairs = cands.where(F.col("origin") == "lsh").select("src", "dst")
        print(f"  sub verify_pairs noop: {noop(verify_pairs(lsh_pairs, sigs, cfg)):.2f}s")
        sc.setJobDescription("sub: consolidate")
        cons = consolidate(attach_clusters(docs, assignments), cfg.min_group_size)
        print(f"  sub consolidate noop: {noop(cons):.2f}s")
        sc.setJobDescription(None)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
