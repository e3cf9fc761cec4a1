"""Jaccard verification of LSH candidate pairs.

Pairs are joined back to their MinHash signatures and the estimated Jaccard
(fraction of agreeing signature positions) is computed in one vectorized
numpy pass per Arrow batch, then thresholded (north_star: "candidate pairs
from LSH bands are verified with vectorized Jaccard estimation").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from deduplication_challenge_spark.config import DedupConfig


@F.pandas_udf(DoubleType())
def _estimate_jaccard_udf(sig_a: pd.Series, sig_b: pd.Series) -> pd.Series:
    """Batched MinHash agreement rate. Signatures have fixed length, so the
    batch stacks into one (n, num_perm) matrix — a single vectorized compare."""
    if len(sig_a) == 0:
        return pd.Series([], dtype="float64")
    mat_a = np.vstack(sig_a.to_numpy())
    mat_b = np.vstack(sig_b.to_numpy())
    return pd.Series((mat_a == mat_b).mean(axis=1))


def verify_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """pairs(src, dst) -> verified pairs(src, dst, jaccard_est >= threshold).

    Two hash joins against the signatures table (projected to
    (doc_id, minhash) so only the signature column shuffles).
    """
    sigs = signatures.select("doc_id", "minhash")
    s1 = sigs.withColumnRenamed("doc_id", "src").withColumnRenamed("minhash", "sig_src")
    s2 = sigs.withColumnRenamed("doc_id", "dst").withColumnRenamed("minhash", "sig_dst")
    return (
        pairs.join(s1, "src")
        .join(s2, "dst")
        .withColumn("jaccard_est", _estimate_jaccard_udf("sig_src", "sig_dst"))
        .where(F.col("jaccard_est") >= cfg.jaccard_threshold)
        .select("src", "dst", "jaccard_est")
    )
