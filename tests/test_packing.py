"""Sequence packing: pure-Python differential, budget/oversize contracts,
layout independence, next-fit fill bound."""

from __future__ import annotations

import numpy as np
import pytest

from deduplication_challenge_spark.operators.packing import pack_sequences, pack_stats


def _py_pack(items: dict[int, int], budget: int, n_buckets: int) -> dict[int, tuple]:
    out = {}
    for b in range(n_buckets):
        seq, fill, pos = 0, 0, 0
        for doc_id in sorted(k for k in items if k % n_buckets == b):
            tok = items[doc_id]
            if pos > 0 and fill + tok > budget:
                seq, fill, pos = seq + 1, 0, 0
            out[doc_id] = (f"{b}/{seq}", pos, tok > budget)
            fill += tok
            pos += 1
            if fill >= budget:
                seq, fill, pos = seq + 1, 0, 0
    return out


@pytest.fixture(scope="module")
def items():
    rng = np.random.Generator(np.random.PCG64(13))
    return {int(i): int(rng.integers(10, 900)) for i in range(500)}


class TestPacking:
    def test_differential_vs_python(self, spark, items):
        df = spark.createDataFrame(list(items.items()), "doc_id long, n_tokens long")
        got = {
            r["doc_id"]: (r["pack_id"], r["pack_pos"], r["oversize"])
            for r in pack_sequences(df, budget=2048, n_buckets=8).collect()
        }
        assert got == _py_pack(items, 2048, 8)

    def test_every_doc_exactly_once(self, spark, items):
        df = spark.createDataFrame(list(items.items()), "doc_id long, n_tokens long")
        out = pack_sequences(df, budget=2048, n_buckets=8)
        assert out.count() == len(items)
        assert out.select("doc_id").distinct().count() == len(items)

    def test_layout_independent(self, spark, items):
        df = spark.createDataFrame(list(items.items()), "doc_id long, n_tokens long")
        a = sorted(map(tuple, pack_sequences(df.repartition(1), 2048, n_buckets=8).collect()))
        b = sorted(map(tuple, pack_sequences(df.repartition(16, "n_tokens"), 2048, n_buckets=8).collect()))
        assert a == b

    def test_budget_respected_and_oversize_isolated(self, spark):
        df = spark.createDataFrame(
            [(0, 100), (1, 100), (2, 5000), (3, 100)], "doc_id long, n_tokens long"
        )
        out = pack_sequences(df, budget=250, n_buckets=1).collect()
        by_pack = {}
        for r in out:
            by_pack.setdefault(r["pack_id"], []).append(r)
        for pid, rows in by_pack.items():
            fill = sum(r["n_tokens"] for r in rows)
            if any(r["oversize"] for r in rows):
                assert len(rows) == 1  # oversize doc is alone in its pack
            else:
                assert fill <= 250
        assert sum(1 for r in out if r["oversize"]) == 1

    def test_next_fit_fill_bound(self, spark, items):
        """Every CLOSED pack (all but possibly the last per bucket) is more
        than half full when no doc exceeds budget/2."""
        small = {k: min(v, 1000) for k, v in items.items()}  # <= budget/2
        df = spark.createDataFrame(list(small.items()), "doc_id long, n_tokens long")
        out = pack_sequences(df, budget=2000, n_buckets=4).collect()
        fills = {}
        for r in out:
            fills.setdefault((r["bucket"], r["pack_id"]), 0)
            fills[(r["bucket"], r["pack_id"])] += r["n_tokens"]
        last_per_bucket = {
            b: max(int(p.split("/")[1]) for (bb, p) in fills if bb == b)
            for b in {bb for bb, _ in fills}
        }
        for (b, pid), fill in fills.items():
            if int(pid.split("/")[1]) != last_per_bucket[b]:
                assert fill > 1000, (b, pid, fill)
        stats = pack_stats(
            pack_sequences(df, budget=2000, n_buckets=4), budget=2000
        ).first()
        assert stats["mean_fill_ratio"] > 0.5
        assert stats["n_oversize_packs"] == 0

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
        with pytest.raises(ValueError):
            pack_sequences(df, budget=0)
        with pytest.raises(ValueError):
            pack_sequences(df, budget=10, n_buckets=0)
