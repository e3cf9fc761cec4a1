"""Dump .explain('formatted') before/after plans for the r06 optimization
round.  'Before' simulates the pre-spread tree by patching spread_input to
identity (the only r06 change affecting these plans).
Usage: python tools/dump_plans_r06.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "doc_repetition_signals",
    "boilerplate_rate_by_source",
    "paragraph_dedup_docs",
    "ngram_jaccard_pairs",
    "pii_redaction",
    "gopher_quality_flags",
    "token_stats",
    "contamination_flags",
    "quality_scores",
    "hash_sample_by_source",
]


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    after_only = "--after-only" in sys.argv  # keep round-start *_before.txt
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from deduplication_challenge_spark import entry_queries as eq
    from deduplication_challenge_spark.session import build_session
    from deduplication_challenge_spark.sources import pages

    spark = build_session("dump-plans", shuffle_partitions=32)
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)

    real_spread = pages.spread_input
    for name in QUERIES:
        if not after_only:
            pages.spread_input = lambda df, min_partitions=None: df  # pre-r06 tree
            with open(f"{outdir}/{name}_before.txt", "w") as f:
                f.write(plan_text(eq.QUERIES[name](spark, sf_dir)))
            pages.spread_input = real_spread
        with open(f"{outdir}/{name}_after.txt", "w") as f:
            f.write(plan_text(eq.QUERIES[name](spark, sf_dir)))
        print("dumped", name)
    spark.stop()


if __name__ == "__main__":
    main()
