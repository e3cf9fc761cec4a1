"""Sequence packing — assign documents to fixed-token-budget packs (the
pre-training batching step: short documents are concatenated into one
context window so padding never dominates).  The assignment must be
DETERMINISTIC — the same doc lands in the same pack on any cluster at any
partitioning — because a training run resumed elsewhere must see the same
batch stream.

Rule (pinned): docs are grouped into ``n_buckets`` by ``doc_id % n_buckets``,
ordered by doc_id inside each bucket, and packed greedy NEXT-FIT: a pack
accumulates docs until the next one would exceed ``budget``, then a new
pack starts.  A doc longer than the budget gets a pack of its own and is
flagged ``oversize`` (the caller decides truncate-vs-split; this operator
never silently drops tokens).  Next-fit guarantees every CLOSED pack is
more than half full when no doc exceeds budget/2, which bounds padding
waste at under 2x optimal — the right trade for a single ordered pass.

Scale shape: one hash shuffle on the bucket key, then applyInPandas packs
each bucket in one ordered Arrow pass (packing is inherently sequential
WITHIN a pack, so the parallel unit is the bucket; n_buckets is the
parallelism knob and pack ids are (bucket, seq) pairs, globally unique
without coordination).  Output is layout-independent by construction:
bucket membership and intra-bucket order depend only on doc_id.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = (
    "doc_id long, n_tokens long, bucket int, pack_id string, "
    "pack_pos int, oversize boolean"
)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """docs(doc_id, <token_col>) -> one row per doc with its pack
    assignment: pack_id ('<bucket>/<seq>'), pack_pos (order inside the
    pack), oversize flag."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    d = docs.select(
        "doc_id",
        F.col(token_col).cast("long").alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int").alias("bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        pack_ids, positions, oversize = [], [], []
        seq, fill, pos = 0, 0, 0
        for tok in pdf["n_tokens"].tolist():
            tok = int(tok)
            if pos > 0 and fill + tok > budget:
                seq, fill, pos = seq + 1, 0, 0
            pack_ids.append(f"{bucket}/{seq}")
            positions.append(pos)
            oversize.append(tok > budget)
            fill += tok
            pos += 1
            if fill >= budget:  # full (or oversize) pack closes immediately
                seq, fill, pos = seq + 1, 0, 0
        return pdf.assign(pack_id=pack_ids, pack_pos=positions, oversize=oversize)

    return d.groupBy("bucket").applyInPandas(pack, schema=PACKED_SCHEMA)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Packing-quality rollup: packs, mean fill ratio, oversize count —
    the no-silent-waste companion (padding waste is 1 - fill_ratio)."""
    per_pack = packed.groupBy("bucket", "pack_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.round(F.avg(F.least(F.col("fill"), F.lit(budget)) / F.lit(budget)), 6).alias(
            "mean_fill_ratio"
        ),
        F.sum("has_oversize").cast("long").alias("n_oversize_packs"),
    )
