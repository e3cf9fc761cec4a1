"""Connected components via alternating large-star / small-star joins.

Implements the MapReduce CC algorithm of Kiveris et al. ("Connected
Components in MapReduce and Beyond", SoCC 2014) as a driver loop of
DataFrame joins — O(log n) rounds, each a groupBy(min) + equi-join, no
graphframes dependency (absent from this sandbox, SURVEY.md §7.0).

Per-iteration ``localCheckpoint(eager=True)`` truncates lineage so the plan
doesn't grow unboundedly across the fixpoint loop (Catalyst optimizes single
DAGs, not loops — SURVEY.md §4.3.2). Convergence is detected by comparing a
cheap order-insensitive edge-set signature (count + sum of xxhash64(src,dst))
between iterations instead of a full except/anti-join.

The reference's counterpart is exact-key grouping (one hash shuffle,
/root/reference/src/main.py:85-97); CC generalizes it to the transitive
closure of the near-dup candidate edges.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _contract_edges_numpy(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized union-find over one partition's edge arrays: min-hook +
    full pointer-jumping compression (Shiloach–Vishkin style), no per-edge
    Python loop.  Returns (node, local_min_root) pairs for every non-root
    node.  The component minimum can never be hooked (hooks always point a
    larger root at a smaller one), so the fixpoint root of each component is
    its minimum — same contract as a sequential union-find with min roots."""
    nodes, idx = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = idx[: len(src)], idx[len(src):]
    parent = np.arange(len(nodes), dtype=np.int64)
    while True:
        # full compression: parent <- parent[parent] to fixpoint
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        rs, rd = parent[si], parent[di]
        lo = np.minimum(rs, rd)
        hi = np.maximum(rs, rd)
        mask = lo != hi
        if not mask.any():
            break
        np.minimum.at(parent, hi[mask], lo[mask])
    nonroot = parent != np.arange(len(nodes), dtype=np.int64)
    return nodes[nonroot], nodes[parent[nonroot]]


def _local_contract(edges: DataFrame) -> DataFrame:
    """Partition-local union-find pre-contraction: one Arrow pass replacing
    each partition's edge set with its spanning star (node -> local-min
    root). Output is <= #distinct nodes per partition, duplicate-heavy edge
    sets (stars from several LSH bands / simhash chunks over the same
    cluster) collapse before the first shuffle, and the global fixpoint loop
    then needs fewer iterations over fewer edges. The kernel is pure numpy
    (no per-edge Python loop — the one row-at-a-time hot path flagged in
    round 1)."""

    def contract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            yield pd.DataFrame({"src": [], "dst": []}, dtype="int64")
            return
        src = np.concatenate([c["src"].to_numpy(dtype=np.int64) for c in chunks])
        dst = np.concatenate([c["dst"].to_numpy(dtype=np.int64) for c in chunks])
        out_src, out_dst = _contract_edges_numpy(src, dst)
        yield pd.DataFrame({"src": out_src, "dst": out_dst})

    return edges.mapInPandas(contract, schema="src long, dst long")


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) + {u})."""
    both = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = both.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        both.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; for each node u connect all (smaller)
    neighbors and u itself to the minimum of the neighborhood."""
    oriented = (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    joined = oriented.join(mins, "src")
    e1 = joined.where(F.col("dst") != F.col("m")).select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    e2 = mins.select(F.col("src").alias("src"), F.col("m").alias("dst"))
    return e1.union(e2).where(F.col("src") != F.col("dst")).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    # bit_xor is order-insensitive and can't overflow (edges are distinct,
    # so xor never self-cancels duplicate rows)
    row = edges.agg(
        F.count("*").alias("c"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


# When the pre-contracted edge set fits ONE task, the global fixpoint is
# cheaper as a single union-find pass than as star-join rounds: each
# large/small-star iteration costs ~8 shuffle stages + an eager checkpoint +
# a convergence collect, all stage-floor-bound on a contracted graph that is
# already tiny (<= one row per non-singleton node).  The limit is derived
# from executor MEMORY, not core count: 5M edges = ~80 MB of int64 pairs,
# ~3x that as the kernel's peak working set (concatenate + unique sort) —
# far under any sane executor heap.  Past the limit (the 100 TB case, where
# the contracted graph is ~#non-singleton nodes) the star loop runs exactly
# as before, so nothing is tuned to local mode.
SINGLE_TASK_EDGE_LIMIT = 5_000_000


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpoint_mode: str = "local",
    single_task_edge_limit: int = SINGLE_TASK_EDGE_LIMIT,
) -> DataFrame:
    """edges(src, dst) -> assignments(doc_id, cluster_id).

    cluster_id is the component's minimum doc_id. Only nodes that appear in
    an edge are returned — callers left-join docs and coalesce to doc_id for
    singletons (consolidate.attach_clusters), mirroring the reference's
    untouched singleton groups (/root/reference/src/main.py:94-95).

    ``checkpoint_mode='reliable'`` swaps the per-iteration localCheckpoint
    for a reliable checkpoint (plans/checkpointing.py): the fixpoint loop is
    the longest lineage in the engine, and on a real cluster an executor
    loss mid-loop must recover, not kill the query.  Identical output.

    Reliable-mode storage is GARBAGE-COLLECTED as the loop advances: each
    iteration checkpoints into its own subdirectory and, once the new
    checkpoint is materialized (eager), the superseded iteration's
    directory is deleted through the Hadoop FS API — without this, a
    50-iteration loop would hold ~50 full edge-set materializations on
    HDFS for the life of the application.  Only the FINAL iteration's
    directory survives the call (the returned DataFrame's plan reads it
    lazily); it is bounded at one checkpoint per invocation.
    """
    from deduplication_challenge_spark.plans.checkpointing import (
        ensure_checkpoint_dir,
        fs_delete,
        stage_checkpoint,
    )

    reliable = checkpoint_mode == "reliable"
    spark = edges.sparkSession
    prev_dir = None
    if reliable:
        import os
        import uuid

        base = ensure_checkpoint_dir(spark)
        run_dir = os.path.join(base, f"cc_{uuid.uuid4().hex[:12]}")

        def _set_iter_dir(i: int) -> str:
            d = os.path.join(run_dir, f"iter_{i}")
            spark.sparkContext.setCheckpointDir(d)
            return d

        prev_dir = _set_iter_dir(0)
    # try/finally: the non-convergence RuntimeError (or any mid-loop Spark
    # failure) must still restore the SESSION-level checkpoint dir — without
    # this, later reliable checkpoints in the same session would nest under
    # a stale per-iteration subdir and orphaned iteration dirs would leak
    try:
        cur = stage_checkpoint(
            _local_contract(edges.where(F.col("src") != F.col("dst"))),
            checkpoint_mode,
            eager=True,
        )
        # size-adaptive finish: the eager checkpoint above makes this count
        # a metadata read, not a recompute
        if cur.count() <= single_task_edge_limit:
            # whole contracted graph through the SAME union-find kernel in
            # one partition — exact min-root components in a single pass,
            # identical to the star fixpoint by the kernel's contract
            # (hooks always point larger roots at smaller ones, so every
            # non-root maps to its component minimum)
            if reliable:
                new_dir = _set_iter_dir(1)
            cur = stage_checkpoint(
                _local_contract(cur.repartition(1)), checkpoint_mode, eager=True
            )
            if reliable:
                fs_delete(spark, prev_dir)
                prev_dir = new_dir
        else:
            prev_sig = None
            for it in range(max_iterations):
                if reliable:
                    new_dir = _set_iter_dir(it + 1)
                cur = stage_checkpoint(
                    _small_star(_large_star(cur)), checkpoint_mode, eager=True
                )
                if reliable:
                    fs_delete(spark, prev_dir)  # superseded; cur no longer reads it
                    prev_dir = new_dir
                sig = _signature(cur)
                if sig == prev_sig:
                    break
                prev_sig = sig
            else:
                raise RuntimeError(
                    f"connected_components did not converge in {max_iterations} iterations"
                )
    except BaseException:
        if reliable:
            # the failed run's checkpoints are garbage — delete the whole
            # per-invocation dir so a retried loop never accumulates orphans
            try:
                fs_delete(spark, run_dir)
            except Exception:
                pass  # best-effort GC; the restore below must still happen
        raise
    finally:
        if reliable:
            # restore the session-level dir for later reliable checkpoints
            spark.sparkContext.setCheckpointDir(base)

    # Fixpoint: every edge points node -> component min. Roots map to themselves.
    members = cur.select(F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id"))
    roots = cur.select(F.col("dst").alias("doc_id"), F.col("dst").alias("cluster_id")).distinct()
    return members.union(roots).distinct()
