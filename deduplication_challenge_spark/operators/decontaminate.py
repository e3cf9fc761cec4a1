"""Benchmark decontamination — flag or drop training documents that share
word n-grams with an evaluation/benchmark set (the GPT-3 appendix-C /
Dolma decontamination pattern): a training corpus leaking eval text
invalidates downstream benchmark numbers, and document-level dedup cannot
catch it because the benchmark is a different, external corpus.

Scale shape:
  * the benchmark gram set is DISTINCT n-grams of the (small) eval corpus,
    hashed to 8-byte keys and broadcast — eval suites are thousands of
    docs, orders of magnitude below the training corpus, so the broadcast
    is the right plan at any training-corpus scale;
  * training docs stream through one tokenize->gram projection and an
    inner broadcast join; the only aggregate is the per-doc matched-gram
    count (map-side combined), so the training corpus never shuffles its
    text — flagged ids join back for removal;
  * gram keys are xxhash64(gram) (~2^-64 false-match odds per pair, the
    same documented trade as every other hash join in this engine).

Real pipelines use n in 8..13 over natural text; n is a parameter here
because the right value depends on corpus entropy (tests and the driver
query use smaller n against the low-entropy synthetic vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_hashes(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, text) -> distinct (doc_id, h) word-n-gram hash rows.

    Within-doc dedup is row-local (array_distinct before the explode) —
    the former explode-then-``.distinct()`` shuffled every gram occurrence
    to drop repeats an array op removes in place; output rows identical."""
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    d = docs.select("doc_id", toks.alias("t")).where(F.size("t") >= n)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - n),
        lambda i: F.xxhash64(
            F.concat_ws(
                "\x1f", *[F.element_at(F.col("t"), i + k + 1) for k in range(n)]
            )
        ),
    )
    return d.select("doc_id", F.explode(F.array_distinct(grams)).alias("h"))


def contamination_flags(docs: DataFrame, benchmark: DataFrame, n: int = 8) -> DataFrame:
    """docs(doc_id, text) x benchmark(text, ...) ->
    (doc_id, n_matched_grams) for every CONTAMINATED doc (>= 1 shared
    n-gram with the benchmark set); clean docs are absent.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    bench = (
        _gram_hashes(benchmark.select(F.lit(-1).alias("doc_id"), "text"), n)
        .select("h")
        .distinct()
    )
    return (
        _gram_hashes(docs, n)
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched_grams"))
    )


def remove_contaminated(docs: DataFrame, benchmark: DataFrame, n: int = 8) -> DataFrame:
    """docs minus every row contamination_flags would flag."""
    flags = contamination_flags(docs, benchmark, n)
    return docs.join(flags.select("doc_id"), "doc_id", "left_anti")
