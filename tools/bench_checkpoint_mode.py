"""Reliable-vs-local checkpoint overhead at 500k docs (BASELINE.md note for
cfg.checkpoint_mode).

'reliable' switches the CC fixpoint loop and the global-anchor
materialization from localCheckpoint to setCheckpointDir-backed
checkpoint() — the cluster fault-tolerance mode (plans/checkpointing.py).
On local[*] both write to local disk, so the measured delta is the
serialization/IO overhead of the reliable path, the honest lower bound of
what a cluster pays (an HDFS-backed dir adds network replication on top).

Usage: python tools/bench_checkpoint_mode.py   # prints one JSON line
Env: SCALING_REPLICAS (default 100 -> 500k docs from sf0.1), CKPT_RUNS
(default 2 per mode, median; warm-up excluded), CKPT_CPUS (default 8).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("CKPT_RUNS", "2"))
CPUS = int(os.environ.get("CKPT_CPUS", "8"))


def one_run(mode: str) -> dict:
    from dataclasses import replace

    from deduplication_challenge_spark.config import DedupConfig
    from deduplication_challenge_spark.plans.pipeline import DedupPipeline
    from deduplication_challenge_spark.session import build_session
    from tools.bench_scaling import CORPUS_DIR

    spark = build_session(
        f"ckpt-{mode}", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2
    )
    pages = spark.read.parquet(CORPUS_DIR)
    n_docs = pages.count()
    workdir = tempfile.mkdtemp(prefix=f"dedup_ckpt_{mode}_")
    cfg = replace(DedupConfig(), checkpoint_mode=mode)
    pipe = DedupPipeline(spark, cfg, workdir, include_substring=True)
    t0 = time.monotonic()
    canonical, report = pipe.run(pages, input_desc=f"ckpt-bench:{mode}")
    n_out = canonical.count()
    e2e = time.monotonic() - t0
    spark.stop()
    import shutil

    shutil.rmtree(workdir, ignore_errors=True)
    return {
        "mode": mode,
        "seconds": round(e2e, 2),
        "docs": n_docs,
        "canonical": n_out,
        "stages": {k: round(v.seconds, 2) for k, v in report.stages.items()},
    }


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        print("WORKER_RESULT " + json.dumps(one_run(sys.argv[2])))
        return

    from tools.bench_scaling import build_corpus

    build_corpus()
    results: dict[str, list[dict]] = {"local": [], "reliable": []}
    canonical: set[int] = set()
    for mode in ("local", "reliable"):
        for i in range(RUNS + 1):  # +1 warm-up
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", mode],
                capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = next(
                (ln for ln in out.stdout.splitlines() if ln.startswith("WORKER_RESULT ")),
                None,
            )
            if line is None:
                print(out.stderr[-4000:], file=sys.stderr)
                raise RuntimeError(f"worker failed (mode={mode}, run={i})")
            r = json.loads(line[len("WORKER_RESULT "):])
            print(f"[{'warmup' if i == 0 else f'run{i}'}] {mode}: {r['seconds']}s",
                  file=sys.stderr)
            canonical.add(r["canonical"])
            if i > 0:
                results[mode].append(r)

    med_local = statistics.median(r["seconds"] for r in results["local"])
    med_rel = statistics.median(r["seconds"] for r in results["reliable"])
    print(json.dumps({
        "metric": "checkpoint_mode_overhead_500k",
        "docs": results["local"][0]["docs"],
        "cpus": CPUS,
        "runs_per_mode": RUNS,
        "median_seconds_local": med_local,
        "median_seconds_reliable": med_rel,
        "overhead_pct": round(100 * (med_rel - med_local) / med_local, 1),
        "identical_canonical": len(canonical) == 1,
        "canonical": sorted(canonical),
        "all_runs": results,
    }))


if __name__ == "__main__":
    main()
