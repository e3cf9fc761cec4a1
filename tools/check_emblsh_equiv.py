"""Equivalence check: bucket-GEMM cosine_near_dup_pairs_lsh vs the former
id-pair-join implementation (inlined here as the reference), plus timing.
Usage: python tools/check_emblsh_equiv.py <sf_dir> [--skip-old]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from deduplication_challenge_spark.session import build_session
from deduplication_challenge_spark.operators.similarity import (
    _table_buckets_udf,
    cosine_near_dup_pairs_lsh,
)


def old_impl(emb, threshold, n_planes, n_tables, seed, n_probes):
    buckets_udf = _table_buckets_udf(n_planes, n_tables, seed, n_probes)
    b = emb.select(
        "vec_id", F.posexplode(buckets_udf("embedding")).alias("pos", "bucket")
    ).select(
        "vec_id",
        (F.col("pos") / (1 + n_probes)).cast("int").alias("tbl"),
        (F.col("pos") % (1 + n_probes) == 0).alias("is_base"),
        "bucket",
    ).localCheckpoint(eager=False)
    probe_side = b.select("tbl", "bucket", F.col("vec_id").alias("vec_id_a"))
    base_side = b.where("is_base").select("tbl", "bucket", F.col("vec_id").alias("vec_id_b"))
    cand = (
        probe_side.join(base_side, ["tbl", "bucket"])
        .where(F.col("vec_id_a") != F.col("vec_id_b"))
        .select(
            F.least("vec_id_a", "vec_id_b").alias("vec_id_a"),
            F.greatest("vec_id_a", "vec_id_b").alias("vec_id_b"),
        )
        .dropDuplicates(["vec_id_a", "vec_id_b"])
    )
    a = emb.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("emb_a"))
    b2 = emb.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("emb_b"))

    @F.pandas_udf("double")
    def cos_udf(ea: pd.Series, eb: pd.Series) -> pd.Series:
        if len(ea) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(ea.to_numpy()).astype(np.float64)
        B = np.vstack(eb.to_numpy()).astype(np.float64)
        s = (A * B).sum(axis=1) / (
            np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        )
        return pd.Series(s)

    return (
        cand.join(a, "vec_id_a")
        .join(b2, "vec_id_b")
        .withColumn("cosine", F.round(cos_udf("emb_a", "emb_b"), 6))
        .where((F.col("cosine") >= threshold) & ~F.isnan("cosine"))
        .select("vec_id_a", "vec_id_b", "cosine")
    )


def main() -> None:
    sf_dir = sys.argv[1]
    skip_old = "--skip-old" in sys.argv
    spark = build_session("check-emblsh", shuffle_partitions=32)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cfgs = dict(threshold=0.35, n_planes=5, n_tables=12, seed=42, n_probes=2)

    t0 = time.monotonic()
    new_rows = sorted(
        (r["vec_id_a"], r["vec_id_b"], r["cosine"])
        for r in cosine_near_dup_pairs_lsh(emb, **cfgs).collect()
    )
    t_new = time.monotonic() - t0
    print(f"new: {len(new_rows)} rows in {t_new:.2f}s", flush=True)

    if not skip_old:
        t0 = time.monotonic()
        old_rows = sorted(
            (r["vec_id_a"], r["vec_id_b"], r["cosine"])
            for r in old_impl(emb, **cfgs).collect()
        )
        t_old = time.monotonic() - t0
        print(f"old: {len(old_rows)} rows in {t_old:.2f}s", flush=True)
        assert new_rows == old_rows, (
            f"MISMATCH: {len(new_rows)} vs {len(old_rows)}; "
            f"only_new={set(new_rows) - set(old_rows)}; "
            f"only_old={set(old_rows) - set(new_rows)}"
        )
        print("EQUAL: outputs identical", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
