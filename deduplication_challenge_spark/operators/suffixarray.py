"""Suffix-array pass for exact substring duplicates.

Semantics: emit doc pairs that share a verbatim substring of at least
``substr_min_len`` characters (the north_star's "suffix-array pass for exact
substring duplicates"). A global suffix array over 100 TB is impractical in
pure PySpark, so this is a **partition-local** pass (SURVEY.md §7.4.5): docs
are hash-repartitioned, each partition builds one suffix array over its
concatenated text via ``mapInPandas``, and pairs are found within the
partition. Exact-duplicate and containment pairs planted in one partition
are always found; cross-partition substring pairs are the documented
approximation (they are still caught by the MinHash/SimHash paths when
similarity is high). Tests force co-location via ``num_partitions=1``.

Algorithm per partition (all numpy, no per-char Python):
  1. concat texts with an out-of-alphabet separator, encode utf-32-le ->
     uint32 code array;
  2. suffix array by prefix doubling (O(n log n) lexsorts);
  3. instead of Kasai LCP (a Python-speed per-char loop), note that "shares
     a substring of length >= L" is equivalent to "some suffixes agree on
     their first L codes", and first-L-codes equality is an *equivalence*:
     equal-prefix suffixes are contiguous in SA order. So mark adjacent SA
     entries whose L-length windows are equal (chunked vectorized compare),
     group runs, and emit star edges (min doc_id -> member) per run — linear
     output even for pathological boilerplate, mirroring operators/lsh.py.
  4. suffixes within L of their doc's end are excluded up front, so windows
     never cross doc boundaries and padding can't fabricate matches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from deduplication_challenge_spark.config import DedupConfig

PAIR_SCHEMA = "src long, dst long"
_SEP = "\x00"


def build_suffix_array(codes: np.ndarray, max_prefix: int | None = None) -> np.ndarray:
    """Suffix array of an integer sequence by prefix doubling.

    ``max_prefix``: stop doubling once suffixes are ordered by their first
    ``max_prefix`` codes. The substring pass only needs equal-``min_len``-
    prefix suffixes to be CONTIGUOUS, which any refinement of the
    first-``min_len``-chars order guarantees — so 6 rounds instead of
    ~log2(n), the dominant cost at bench scale.
    """
    n = codes.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    order = np.argsort(rank, kind="stable")
    k = 1
    limit = n if max_prefix is None else min(n, max_prefix)
    while k < limit:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        rk, k2 = rank[order], key2[order]
        change = np.empty(n, dtype=np.int64)
        change[0] = 0
        change[1:] = ((rk[1:] != rk[:-1]) | (k2[1:] != k2[:-1])).astype(np.int64)
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(change)
        rank = new_rank
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    return order


def substring_pairs_partition(
    doc_ids: np.ndarray, texts: list[str], min_len: int
) -> pd.DataFrame:
    """Shared kernel (also the oracle's global pass when given all docs)."""
    if len(texts) < 2:
        return pd.DataFrame({"src": [], "dst": []}, dtype="int64")
    joined = _SEP.join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    n = codes.size
    lengths = np.array([len(t) for t in texts], dtype=np.int64)
    starts = np.zeros(len(texts), dtype=np.int64)
    starts[1:] = np.cumsum(lengths[:-1] + 1)  # +1 for separator
    ends = starts + lengths

    # suffix position -> owning doc index
    sa = build_suffix_array(codes, max_prefix=min_len)
    owner = np.searchsorted(starts, sa, side="right") - 1
    # keep suffixes with >= min_len real chars left in their doc
    keep = (ends[owner] - sa) >= min_len
    sa, owner = sa[keep], owner[keep]
    if sa.size < 2:
        return pd.DataFrame({"src": [], "dst": []}, dtype="int64")

    # adjacent window equality, chunked to bound memory
    m = sa.size
    eq = np.empty(m - 1, dtype=bool)
    chunk = max(1, 4_000_000 // max(min_len, 1))
    offs = np.arange(min_len, dtype=np.int64)
    for lo in range(0, m - 1, chunk):
        hi = min(lo + chunk, m - 1)
        w1 = codes[sa[lo:hi, None] + offs]
        w2 = codes[sa[lo + 1 : hi + 1, None] + offs]
        eq[lo:hi] = (w1 == w2).all(axis=1)

    # run grouping over the equivalence classes
    run_id = np.zeros(m, dtype=np.int64)
    run_id[1:] = np.cumsum(~eq)
    df = pd.DataFrame({"run": run_id, "doc": doc_ids[owner]})
    df = df.drop_duplicates()
    sizes = df.groupby("run")["doc"].transform("size")
    df = df[sizes >= 2]
    if df.empty:
        return pd.DataFrame({"src": [], "dst": []}, dtype="int64")
    mins = df.groupby("run")["doc"].transform("min")
    out = pd.DataFrame({"src": mins[df["doc"] != mins], "dst": df["doc"][df["doc"] != mins]})
    return out.drop_duplicates().astype("int64")


def substring_pairs(docs: DataFrame, cfg: DedupConfig, num_partitions: int | None = None) -> DataFrame:
    """docs(doc_id, text) -> star edges of substring-duplicate runs."""
    min_len = cfg.substr_min_len
    parts = num_partitions or cfg.substr_partitions
    sel = docs.select("doc_id", "text")
    if parts:
        sel = sel.repartition(parts, "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        yield substring_pairs_partition(
            pdf["doc_id"].to_numpy(), pdf["text"].fillna("").tolist(), min_len
        )

    return sel.mapInPandas(gen, schema=PAIR_SCHEMA).distinct()
