"""Hot-chunk defusal for the SimHash permute-and-sort pass: a planted
pathological corpus where one (chunk_idx, chunk_val) group holds every doc
must be sub-split across salt ranges (no single-task window), while the edge
rule stays pinned and identical between the Spark operator and a local
replica of the oracle's split logic."""

from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from deduplication_challenge_spark.config import DedupConfig
from deduplication_challenge_spark.operators.simhash import (
    _salted_chunks,
    hamming_pairs,
    simhash_chunk_table,
)


def _planted_signatures(spark, n=64):
    """n docs whose lowest 16-bit chunk (chunk_idx 0) is identical, with the
    remaining bits spread so the hot group spans all salt ranges.  Pairs of
    consecutive docs differ by <= hamming_k bits; distant docs differ by
    more."""
    rows = []
    for i in range(n):
        # spread across the top bits (salt source), same low chunk
        simhash = ((i << 59) | (i << 20) | 0xBEEF) & 0xFFFFFFFFFFFFFFFF
        if simhash >= 1 << 63:  # to signed int64
            simhash -= 1 << 64
        rows.append((i + 1, simhash, 10))
    return spark.createDataFrame(rows, "doc_id long, simhash long, n_shingles int")


@pytest.fixture(scope="module")
def cfg():
    return replace(DedupConfig(), simhash_hot_threshold=8, simhash_split_bits=2)


def test_hot_group_is_split(spark, cfg):
    sigs = _planted_signatures(spark)
    chunks, stats = _salted_chunks(simhash_chunk_table(sigs, cfg), cfg)
    st = stats.collect()[0]
    assert st["hot_keys"] >= 1 and st["hot_rows"] >= 64
    salts = (
        chunks.where((F.col("chunk_idx") == 0))
        .groupBy("_salt").count().collect()
    )
    # the planted corpus spans all 2^2 salt ranges -> 4 window tasks, not 1
    assert len(salts) == 4
    assert max(r["count"] for r in salts) < 64


def test_cold_groups_unsalted(spark, cfg):
    cold_cfg = replace(cfg, simhash_hot_threshold=100_000)
    sigs = _planted_signatures(spark)
    chunks, stats = _salted_chunks(simhash_chunk_table(sigs, cold_cfg), cold_cfg)
    assert stats.collect()[0]["hot_keys"] == 0
    assert chunks.select("_salt").distinct().collect() == [(0,)]


def _oracle_edges(sig_rows, cfg):
    """Local replica of the oracle's pinned rule incl. the hot split."""
    from collections import defaultdict

    n_chunks = cfg.hamming_k + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1
    buckets = defaultdict(list)
    for doc_id, sh, _ in sig_rows:
        for idx in range(n_chunks):
            val = ((sh & 0xFFFFFFFFFFFFFFFF) >> (idx * width)) & mask
            buckets[(idx, val)].append((sh, doc_id))
    split = []
    for members in buckets.values():
        if len(members) > cfg.simhash_hot_threshold:
            by_salt = defaultdict(list)
            for sh, doc_id in members:
                flipped = (sh & 0xFFFFFFFFFFFFFFFF) ^ 0x8000000000000000
                by_salt[flipped >> (64 - cfg.simhash_split_bits)].append((sh, doc_id))
            split.extend(by_salt.values())
        else:
            split.append(members)
    edges = set()
    for members in split:
        members.sort()
        for j in range(1, len(members)):
            for i in range(max(0, j - cfg.simhash_window), j):
                d = bin((members[i][0] ^ members[j][0]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= cfg.hamming_k:
                    a, b = members[i][1], members[j][1]
                    edges.add((min(a, b), max(a, b)))
    return edges


def test_edges_match_pinned_rule_with_split(spark, cfg):
    sigs = _planted_signatures(spark)
    edges_df, _ = hamming_pairs(sigs, cfg)
    got = {(r["src"], r["dst"]) for r in edges_df.collect()}
    want = _oracle_edges(
        [(r["doc_id"], r["simhash"], r["n_shingles"]) for r in sigs.collect()], cfg
    )
    assert got == want
