"""Profile embedding_near_dup_pairs_lsh phases at a given SF (guide §1:
measure first; noop-style isolation of candidate generation vs verification).
Usage: python tools/profile_emblsh.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deduplication_challenge_spark.session import build_session
from deduplication_challenge_spark.operators.similarity import (
    _table_buckets_udf,
    cosine_near_dup_pairs_lsh,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = build_session("profile-emblsh", shuffle_partitions=32)
    sc = spark.sparkContext
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    n = emb.count()
    print(f"n_vectors={n}")

    n_planes, n_tables, seed, n_probes = 5, 12, 42, 2

    # phase 1: bucket + explode + candidate distinct (id-only)
    sc.setJobDescription("emblsh: candidates only")
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
    raw = (
        probe_side.join(base_side, ["tbl", "bucket"])
        .where(F.col("vec_id_a") != F.col("vec_id_b"))
        .select(
            F.least("vec_id_a", "vec_id_b").alias("vec_id_a"),
            F.greatest("vec_id_a", "vec_id_b").alias("vec_id_b"),
        )
    )
    t0 = time.monotonic()
    n_raw = raw.count()
    t_raw = time.monotonic() - t0
    print(f"raw_collision_rows={n_raw} t={t_raw:.2f}s")

    cand = raw.dropDuplicates(["vec_id_a", "vec_id_b"])
    t0 = time.monotonic()
    n_cand = cand.count()
    t_cand = time.monotonic() - t0
    print(f"deduped_candidates={n_cand} t={t_cand:.2f}s fraction={2*n_cand/(n*(n-1)):.4f}")

    # phase 2: the full query as shipped
    sc.setJobDescription("emblsh: full query")
    t0 = time.monotonic()
    res = cosine_near_dup_pairs_lsh(
        emb, threshold=0.35, n_planes=n_planes, n_tables=n_tables, seed=seed,
        n_probes=n_probes,
    )
    res.write.format("noop").mode("overwrite").save()
    t_full = time.monotonic() - t0
    print(f"full_query_noop t={t_full:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
