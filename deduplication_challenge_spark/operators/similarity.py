"""Similarity search over embedding columns (array<float>).

Two paths per the north-rule training-data ops:
  * brute-force cosine top-k — exact baseline, expressed entirely with
    JVM-side higher-order functions (zip_with/aggregate — no UDF, stays in
    whole-stage codegen) against a BROADCAST query set;
  * random-hyperplane LSH (SimHash-for-vectors, Charikar STOC'02) — the
    scale path: bucket vectors by sign-bit keys, search only within the
    query's bucket (plus optional multi-probe), exact re-rank inside.

Determinism: hyperplanes from the seeded PCG64 generator; ties in top-k
break on (rounded -sim, vec_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """(vec_id, embedding) x (query_id, embedding) -> top-k neighbors per
    query by cosine, excluding self-matches on id.

    queries must be small (it is broadcast); embeddings side streams through
    codegen — one pass, no shuffle until the per-query top-k window.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    sim = (_dot(F.col("embedding"), F.col("q_emb"))
           / (_norm(F.col("embedding")) * _norm(F.col("q_emb"))))
    scored = joined.select(
        "query_id", "vec_id", F.round(sim, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def hyperplane_buckets(
    embeddings: DataFrame, n_planes: int = 16, seed: int = 42, dim: int | None = None
) -> DataFrame:
    """Adds an LSH bucket key: sign bits of dot products with seeded random
    hyperplanes, packed into a long. Vectorized numpy inside one Arrow UDF."""
    if dim is None:
        first = embeddings.select(F.size("embedding").alias("d")).first()
        dim = int(first["d"]) if first else 0
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf(LongType())
    def bucket_udf(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (mat @ planes) > 0  # (n, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return embeddings.withColumn("bucket", bucket_udf("embedding"))


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: candidates = same hyperplane bucket, exact cosine re-rank
    inside. Recall < 1 by construction (documented approximation); raise
    recall by lowering n_planes or multi-probing neighboring buckets."""
    emb_b = hyperplane_buckets(embeddings, n_planes, seed)
    q_b = hyperplane_buckets(queries, n_planes, seed).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket"),
    )
    joined = emb_b.join(F.broadcast(q_b), "bucket").where(
        F.col("vec_id") != F.col("query_id")
    )
    sim = (_dot(F.col("embedding"), F.col("q_emb"))
           / (_norm(F.col("embedding")) * _norm(F.col("q_emb"))))
    scored = joined.select("query_id", "vec_id", F.round(sim, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
