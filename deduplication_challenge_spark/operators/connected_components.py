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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_contract(edges: DataFrame) -> DataFrame:
    """Partition-local union-find pre-contraction: one Arrow pass replacing
    each partition's edge set with its spanning star (node -> local-min
    root). Output is <= #distinct nodes per partition, duplicate-heavy edge
    sets (stars from several LSH bands / simhash chunks over the same
    cluster) collapse before the first shuffle, and the global fixpoint loop
    then needs fewer iterations over fewer edges."""

    def contract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
                rs, rd = find(int(s)), find(int(d))
                if rs != rd:
                    lo, hi = (rs, rd) if rs < rd else (rd, rs)
                    parent[hi] = lo
        out_src, out_dst = [], []
        for node in parent:
            root = find(node)
            if root != node:
                out_src.append(node)
                out_dst.append(root)
        yield pd.DataFrame({"src": out_src, "dst": out_dst}, dtype="int64")

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


def connected_components(edges: DataFrame, max_iterations: int = 50) -> DataFrame:
    """edges(src, dst) -> assignments(doc_id, cluster_id).

    cluster_id is the component's minimum doc_id. Only nodes that appear in
    an edge are returned — callers left-join docs and coalesce to doc_id for
    singletons (consolidate.attach_clusters), mirroring the reference's
    untouched singleton groups (/root/reference/src/main.py:94-95).
    """
    cur = _local_contract(edges.where(F.col("src") != F.col("dst"))).localCheckpoint(
        eager=True
    )
    prev_sig = None
    for _ in range(max_iterations):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")

    # Fixpoint: every edge points node -> component min. Roots map to themselves.
    members = cur.select(F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id"))
    roots = cur.select(F.col("dst").alias("doc_id"), F.col("dst").alias("cluster_id")).distinct()
    return members.union(roots).distinct()
