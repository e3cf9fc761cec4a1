"""SimHash Hamming-distance refinement (pigeonhole chunk join).

Pairs within Hamming distance <= k share at least one of k+1 aligned bit
chunks (Manku, Jain & Das Sarma, WWW 2007). The chunk extraction is pure
JVM-side bit arithmetic (shiftrightunsigned/AND inside whole-stage codegen —
no UDF), the candidate join is a plain equi-join on (chunk_idx, chunk_val),
and the final check is ``bit_count(s1 XOR s2) <= k``, also codegen'd.

Scale note (documented limitation + mitigation): with 64/(k+1)-bit chunk
keys, key cardinality is 2^16 for k=3 — at 10^12 docs single chunk keys
collect ~10^7 docs and the equi-join degenerates. The production-scale
design is Manku's permute-and-sort (sort by each of k+1 rotations, compare
within a sliding window) which replaces the join with k+1 range-partitioned
sorts. At sandbox scale the equi-join is the right plan; oversized chunk
keys are counted (never silently dropped) via the returned stats frame and
``simhash_chunk_cap`` guards runaway keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplication_challenge_spark.config import DedupConfig


def simhash_chunk_table(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures -> (doc_id, simhash, chunk_idx, chunk_val); empty docs
    (simhash == 0 AND n_shingles == 0) excluded."""
    n_chunks = cfg.hamming_k + 1
    width = cfg.simhash_bits // n_chunks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(n_chunks)
        ]
    )
    return (
        signatures.where(F.col("n_shingles") > 0)
        .select("doc_id", "simhash", F.posexplode(chunks).alias("chunk_idx", "chunk_val"))
    )


def hamming_pairs(signatures: DataFrame, cfg: DedupConfig) -> tuple[DataFrame, DataFrame]:
    """signatures -> (edges(src, dst) with Hamming(simhash) <= k, stats).

    stats: (chunk_keys, capped_chunk_keys) — keys whose candidate set
    exceeded ``simhash_chunk_cap`` are excluded from the join but counted.
    """
    chunks = simhash_chunk_table(signatures, cfg)
    key_sizes = chunks.groupBy("chunk_idx", "chunk_val").agg(
        F.count("*").alias("key_size")
    )
    stats = key_sizes.agg(
        F.count("*").alias("chunk_keys"),
        F.sum((F.col("key_size") > cfg.simhash_chunk_cap).cast("long")).alias(
            "capped_chunk_keys"
        ),
    )
    ok_keys = key_sizes.where(
        (F.col("key_size") >= 2) & (F.col("key_size") <= cfg.simhash_chunk_cap)
    ).select("chunk_idx", "chunk_val")
    c = chunks.join(ok_keys, ["chunk_idx", "chunk_val"])
    left = c.select(
        "chunk_idx", "chunk_val",
        F.col("doc_id").alias("src"), F.col("simhash").alias("sh_src"),
    )
    right = c.select(
        "chunk_idx", "chunk_val",
        F.col("doc_id").alias("dst"), F.col("simhash").alias("sh_dst"),
    )
    edges = (
        left.join(right, ["chunk_idx", "chunk_val"])
        .where(F.col("src") < F.col("dst"))
        .where(
            F.bit_count(F.col("sh_src").bitwiseXOR(F.col("sh_dst"))) <= cfg.hamming_k
        )
        .select("src", "dst")
        .distinct()
    )
    return edges, stats
