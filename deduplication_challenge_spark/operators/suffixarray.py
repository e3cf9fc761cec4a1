"""Suffix-array pass for exact substring duplicates.

Semantics: emit doc pairs that share a verbatim substring of at least
``substr_min_len`` characters (the north_star's "suffix-array pass for exact
substring duplicates"). A global suffix array over 100 TB is impractical in
pure PySpark, so this is a **partition-local** pass (SURVEY.md §7.4.5): docs
are hash-repartitioned, each partition builds one suffix array over its
concatenated text via ``mapInPandas``, and pairs are found within the
partition. Exact-duplicate and containment pairs planted in one partition
are always found by the suffix-array kernel and, for shared runs of at
least ``min_len + winnow_window - 1`` chars (the winnowing detection
floor — 111 at the shipped defaults), by the rolling kernel;
cross-partition substring pairs are the documented approximation (they
are still caught by the MinHash/SimHash paths when similarity is high).
Tests force co-location via ``num_partitions=1``.

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
from pyspark.sql import functions as F

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
    # int32 ranks: partitions are << 2^31 suffixes, and halving the lexsort
    # key width halves the memory bandwidth that dominates this kernel
    rank = codes.astype(np.int32)  # unicode code points < 2^21 fit directly
    order = np.argsort(rank, kind="stable")
    k = 1
    limit = n if max_prefix is None else min(n, max_prefix)
    while k < limit:
        key2 = np.full(n, -1, dtype=np.int32)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        rk, k2 = rank[order], key2[order]
        change = np.empty(n, dtype=np.int32)
        change[0] = 0
        change[1:] = ((rk[1:] != rk[:-1]) | (k2[1:] != k2[:-1])).astype(np.int32)
        new_rank = np.empty(n, dtype=np.int32)
        new_rank[order] = np.cumsum(change, dtype=np.int32)
        rank = new_rank
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    return order


def _window_eq(codes: np.ndarray, pos_sorted: np.ndarray, min_len: int) -> np.ndarray:
    """Exact window-equality of ADJACENT ordered suffixes (chunked compare) —
    also the hash-collision killer for the rolling-hash path."""
    m = pos_sorted.size
    eq = np.empty(max(m - 1, 0), dtype=bool)
    chunk = max(1, 4_000_000 // max(min_len, 1))
    offs = np.arange(min_len, dtype=np.int64)
    for lo in range(0, m - 1, chunk):
        hi = min(lo + chunk, m - 1)
        w1 = codes[pos_sorted[lo:hi, None] + offs]
        w2 = codes[pos_sorted[lo + 1 : hi + 1, None] + offs]
        eq[lo:hi] = (w1 == w2).all(axis=1)
    return eq


def _prepare(doc_ids: np.ndarray, texts: list[str], min_len: int):
    joined = _SEP.join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lengths = np.array([len(t) for t in texts], dtype=np.int64)
    starts = np.zeros(len(texts), dtype=np.int64)
    starts[1:] = np.cumsum(lengths[:-1] + 1)  # +1 for separator
    ends = starts + lengths
    return codes, starts, ends


def substring_pairs_partition(
    doc_ids: np.ndarray, texts: list[str], min_len: int
) -> pd.DataFrame:
    """Suffix-array kernel (reference implementation; the pytest oracle uses
    this, giving an independent differential check of the rolling-hash path)."""
    if len(texts) < 2:
        return pd.DataFrame({"src": [], "dst": []}, dtype="int64")
    codes, starts, ends = _prepare(doc_ids, texts, min_len)

    sa = build_suffix_array(codes, max_prefix=min_len)
    owner_all = np.searchsorted(starts, sa, side="right") - 1
    keep = (ends[owner_all] - sa) >= min_len
    sa, owner = sa[keep], owner_all[keep]
    if sa.size < 2:
        return pd.DataFrame({"src": [], "dst": []}, dtype="int64")
    eq = _window_eq(codes, sa, min_len)
    return _emit_runs_direct(sa, eq, owner, doc_ids)


def _emit_runs_direct(
    pos_sorted: np.ndarray, eq: np.ndarray, owner: np.ndarray, doc_ids: np.ndarray
) -> pd.DataFrame:
    m = pos_sorted.size
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


_ROLL_B = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64


def _uint64_inverse(b: np.uint64) -> np.uint64:
    """Multiplicative inverse of an odd number mod 2^64 (Newton iteration)."""
    x = int(b)
    inv = x
    for _ in range(6):
        inv = (inv * (2 - x * inv)) % (1 << 64)
    return np.uint64(inv)


_ROLL_B_INV = _uint64_inverse(_ROLL_B)


def _winnow_positions(
    pos: np.ndarray, h: np.ndarray, owner: np.ndarray, window: int
) -> np.ndarray:
    """Content-defined anchor selection (winnowing, Schleimer et al. SIGMOD
    2003), PER DOC: in every sliding window of `window` consecutive
    position-hashes keep the rightmost minimum. Selection depends only on
    the doc's own content, so two docs sharing a long run select the same
    anchors inside it. Returns indices into pos/h."""
    keep_idx: list[np.ndarray] = []
    bounds = np.flatnonzero(np.diff(owner)) + 1
    start = 0
    for end in list(bounds) + [owner.size]:
        seg = h[start:end]
        m = seg.size
        if m == 0:
            start = end
            continue
        if m <= window:
            # short doc: single anchor = rightmost min of all its hashes
            rel = m - 1 - int(np.argmin(seg[::-1]))
            keep_idx.append(np.array([start + rel], dtype=np.int64))
        else:
            sw = np.lib.stride_tricks.sliding_window_view(seg, window)
            rel = window - 1 - np.argmin(sw[:, ::-1], axis=1)
            sel = np.unique(rel + np.arange(m - window + 1))
            keep_idx.append(sel + start)
        start = end
    return np.concatenate(keep_idx) if keep_idx else np.empty(0, dtype=np.int64)


def substring_pairs_partition_rolling(
    doc_ids: np.ndarray,
    texts: list[str],
    min_len: int,
    verify: bool = False,
    winnow_window: int = 0,
) -> pd.DataFrame:
    """Rolling-hash kernel — the default scale path.

    Identical semantics to the suffix-array kernel: both group suffixes by
    equality of their first ``min_len`` chars (a window of L chars at offset
    i IS suffix i truncated at L). Since the pass only needs equal-window
    suffixes to be CONTIGUOUS — never true lexicographic order — a 64-bit
    polynomial rolling hash per window plus ONE sort replaces ~7 prefix-
    doubling lexsorts; memory traffic drops ~5x, which matters because the
    kernel is bandwidth-bound under 32 concurrent executor tasks. Hash
    collisions are eliminated exactly by the same adjacent window-equality
    verification the SA path uses.

    Rolling hash in O(n), fully vectorized with uint64 wraparound arithmetic:
    prefix[i] = sum_{j<i} c[j] * B^j;  H(i, L) = (prefix[i+L] - prefix[i]) * B^-i.
    """
    if len(texts) < 2:
        return pd.DataFrame({"src": [], "dst": []}, dtype="int64")
    codes, starts, ends = _prepare(doc_ids, texts, min_len)
    n = codes.size

    # candidate positions: >= min_len real chars remaining in their doc
    owner_all = np.searchsorted(starts, np.arange(n), side="right") - 1
    pos = np.nonzero((ends[owner_all] - np.arange(n)) >= min_len)[0]
    if pos.size < 2:
        return pd.DataFrame({"src": [], "dst": []}, dtype="int64")

    with np.errstate(over="ignore"):
        powers = np.empty(n + 1, dtype=np.uint64)
        powers[0] = 1
        np.cumprod(np.full(n, _ROLL_B, dtype=np.uint64), out=powers[1:])
        inv_powers = np.empty(n, dtype=np.uint64)
        inv_powers[0] = 1
        np.cumprod(np.full(n - 1, _ROLL_B_INV, dtype=np.uint64), out=inv_powers[1:])
        prefix = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum((codes.astype(np.uint64) + np.uint64(1)) * powers[:n], out=prefix[1:])
        h = (prefix[pos + min_len] - prefix[pos]) * inv_powers[pos]

    if winnow_window > 1:
        # anchor sampling: ~2/(W+1) of positions survive; any run shared
        # verbatim for >= min_len + W - 1 chars selects >= 1 common anchor,
        # and every emitted pair still shares the full min_len-char anchor
        owner_pos = np.searchsorted(starts, pos, side="right") - 1
        sel = _winnow_positions(pos, h, owner_pos, winnow_window)
        pos, h = pos[sel], h[sel]
        if pos.size < 2:
            return pd.DataFrame({"src": [], "dst": []}, dtype="int64")

    # hashtable prefilter: a window whose hash occurs once can't be in any
    # run — drop it before the sort (O(n) pandas hashtable, no ordering).
    # In real corpora most positions are unique, so this removes the
    # dominant argsort traffic; equal windows always share a hash, so no
    # run of size >= 2 can lose a member.
    dup_mask = pd.Series(h).duplicated(keep=False).to_numpy()
    pos, h = pos[dup_mask], h[dup_mask]
    if pos.size < 2:
        return pd.DataFrame({"src": [], "dst": []}, dtype="int64")

    order = np.argsort(h, kind="stable")  # equal hashes contiguous; ties in pos order
    pos_sorted = pos[order]
    eq_hash = h[order][1:] == h[order][:-1]
    if not verify:
        # 64-bit polynomial hash equality: collision odds ~2^-64 per adjacent
        # pair. The optional char-level verification below exists for
        # absolute exactness, but its random gathers (min_len*4 bytes per
        # duplicated window) dominate memory traffic on dup-dense corpora —
        # off by default, togglable via DedupConfig.substr_verify.
        eq = eq_hash
    else:
        eq = np.zeros(pos_sorted.size - 1, dtype=bool)
        cand = np.nonzero(eq_hash)[0]
        if cand.size:
            offs = np.arange(min_len, dtype=np.int64)
            chunk = max(1, 4_000_000 // max(min_len, 1))
            for lo in range(0, cand.size, chunk):
                idx = cand[lo : lo + chunk]
                w1 = codes[pos_sorted[idx, None] + offs]
                w2 = codes[pos_sorted[idx + 1, None] + offs]
                eq[idx] = (w1 == w2).all(axis=1)
    owner = np.searchsorted(starts, pos_sorted, side="right") - 1
    return _emit_runs_direct(pos_sorted, eq, owner, doc_ids)


def _doc_anchor_frame(
    doc_ids: np.ndarray,
    texts: list[str],
    min_len: int,
    winnow_window: int,
    with_window: bool = False,
) -> pd.DataFrame:
    """Per-doc winnowed anchor hashes -> (doc_id, anchor) rows, deduped per
    doc.  The rolling hash is position-independent (H = sum (c_j+1)*B^j over
    the window), and winnowing selects by the doc's OWN content only — so a
    verbatim run shared by two docs yields identical anchor values no matter
    which partition or batch either doc sits in.  This is what makes the
    global (cross-partition) substring pass a plain equi-join.

    ``with_window=True`` (cfg.substr_verify) additionally ships the
    min_len-char window text under each anchor, so the join key becomes
    (anchor, win) — exact char-level verification through the shuffle at
    ~min_len bytes extra per anchor."""
    if not texts:
        cols = {"doc_id": pd.Series([], dtype="int64"), "anchor": pd.Series([], dtype="int64")}
        if with_window:
            cols["win"] = pd.Series([], dtype="object")
        return pd.DataFrame(cols)
    codes, starts, ends = _prepare(doc_ids, texts, min_len)
    n = codes.size
    owner_all = np.searchsorted(starts, np.arange(n), side="right") - 1
    pos = np.nonzero((ends[owner_all] - np.arange(n)) >= min_len)[0]
    if pos.size == 0:
        cols = {"doc_id": pd.Series([], dtype="int64"), "anchor": pd.Series([], dtype="int64")}
        if with_window:
            cols["win"] = pd.Series([], dtype="object")
        return pd.DataFrame(cols)
    with np.errstate(over="ignore"):
        powers = np.empty(n + 1, dtype=np.uint64)
        powers[0] = 1
        np.cumprod(np.full(n, _ROLL_B, dtype=np.uint64), out=powers[1:])
        inv_powers = np.empty(n, dtype=np.uint64)
        inv_powers[0] = 1
        np.cumprod(np.full(n - 1, _ROLL_B_INV, dtype=np.uint64), out=inv_powers[1:])
        prefix = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum((codes.astype(np.uint64) + np.uint64(1)) * powers[:n], out=prefix[1:])
        h = (prefix[pos + min_len] - prefix[pos]) * inv_powers[pos]
    owner_pos = np.searchsorted(starts, pos, side="right") - 1
    if winnow_window > 1:
        sel = _winnow_positions(pos, h, owner_pos, winnow_window)
        pos, h, owner_pos = pos[sel], h[sel], owner_pos[sel]
    cols = {"doc_id": doc_ids[owner_pos], "anchor": h.view(np.int64)}
    if with_window:
        cols["win"] = [
            codes[p : p + min_len].tobytes().decode("utf-32-le") for p in pos
        ]
    return pd.DataFrame(cols).drop_duplicates()


def anchor_join_key(cfg: DedupConfig) -> list[str]:
    """The anchor equi-join key: hash only, or (hash, window text) when
    cfg.substr_verify ships char-level verification through the shuffle."""
    return ["anchor", "win"] if cfg.substr_verify else ["anchor"]


def anchor_table(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, anchor[, win]) winnowed anchor rows.

    This is the PERSISTABLE substring index: anchors are position- and
    partition-independent functions of each doc's own content, so a stored
    anchor table equi-joins against any future batch's anchors — the delta
    substring pass (plans/incremental.py) is exactly that join."""
    min_len = cfg.substr_min_len
    winnow = cfg.substr_winnow_window
    with_window = cfg.substr_verify
    sel = docs.select("doc_id", "text").where(F.length("text") >= min_len)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _doc_anchor_frame(
                    pdf["doc_id"].to_numpy(), pdf["text"].fillna("").tolist(),
                    min_len, winnow, with_window,
                )

    schema = "doc_id long, anchor long" + (", win string" if with_window else "")
    return sel.mapInPandas(gen, schema=schema)


def substring_pairs_from_anchors(anchors: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Anchor table -> star edges (min doc per anchor group -> members)."""
    key = anchor_join_key(cfg)
    mins = anchors.groupBy(*key).agg(
        F.min("doc_id").alias("src"), F.count("*").alias("_n")
    )
    return (
        anchors.join(mins.where(F.col("_n") >= 2), key)
        .where(F.col("doc_id") != F.col("src"))
        .select("src", F.col("doc_id").alias("dst"))
        .distinct()
    )


def substring_pairs_global(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """GLOBAL exact-substring pass: per-doc winnowed anchor hashes as rows,
    one equi-join on the anchor value — cross-partition pairs found with no
    co-location requirement, and the output is partition-layout-independent
    by construction (no pinned partition count needed for determinism).

    Guarantee (winnowing, Schleimer SIGMOD'03): two docs sharing a verbatim
    run >= min_len + winnow_window - 1 chars select at least one common
    anchor inside it.  Edges are star edges per anchor group (min doc_id ->
    member), linear in group size — a boilerplate anchor shared by millions
    of docs can never go quadratic (same shape as operators/lsh.py).
    Pairing is by 64-bit hash equality (collision odds ~2^-64 per anchor);
    with cfg.substr_verify=True the min_len-char window text rides along
    and the join key becomes (anchor, win) — exact char-level verification,
    honored in BOTH scopes (the Python oracle honors the same flag), at
    ~min_len extra chars per shuffled anchor.

    Scale note: the anchor shuffle is ~2/(winnow_window+1) x corpus
    positions x 16 bytes (+~min_len chars when substr_verify);
    winnow_window is the shuffle-size vs detection-floor knob (W=16 ->
    ~12% of positions; W=64 -> ~3% with a min_len+63-char floor; W=128 ->
    ~1.5% with a min_len+127-char floor)."""
    # lazy checkpoint: anchors feeds BOTH the mins aggregate and the join
    # probe side — without it the corpus is re-hashed and re-winnowed twice
    # (two MapInPandas nodes in the executed plan), doubling the dominant
    # cost of the default-scope substring pass
    from deduplication_challenge_spark.plans.checkpointing import stage_checkpoint

    anchors = stage_checkpoint(anchor_table(docs, cfg), cfg)
    return substring_pairs_from_anchors(anchors, cfg)


def substring_pairs(
    docs: DataFrame,
    cfg: DedupConfig,
    num_partitions: int | None = None,
    impl: str = "rolling",
) -> DataFrame:
    """docs(doc_id, text) -> star edges of substring-duplicate runs.

    impl='rolling' (default, bandwidth-lean) or 'suffix_array' (reference).
    The kernels produce identical pairs at winnow_window=0, where tests
    assert equivalence; at the shipped window the rolling kernel samples
    anchors (detection floor min_len + W - 1 shared chars) while the
    suffix-array kernel ignores winnowing — same floor caveat as the
    module docstring."""
    min_len = cfg.substr_min_len
    parts = num_partitions or cfg.substr_partitions
    kernel = (
        substring_pairs_partition_rolling if impl == "rolling" else substring_pairs_partition
    )
    # docs shorter than min_len can never participate — filter BEFORE the
    # repartition shuffle so their text never moves
    sel = docs.select("doc_id", "text").where(F.length("text") >= min_len)
    if parts:
        sel = sel.repartition(parts, "doc_id")

    verify, winnow = cfg.substr_verify, cfg.substr_winnow_window

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        args = (pdf["doc_id"].to_numpy(), pdf["text"].fillna("").tolist(), min_len)
        if kernel is substring_pairs_partition_rolling:
            yield kernel(*args, verify, winnow)
        else:
            yield kernel(*args)

    return sel.mapInPandas(gen, schema=PAIR_SCHEMA).distinct()
