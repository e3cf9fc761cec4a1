"""Decontamination + deterministic hash sampling: planted-leak detection,
python-replayed selection rules, fraction accuracy, strata handling."""

from __future__ import annotations

import hashlib

import pytest

from deduplication_challenge_spark.operators.decontaminate import (
    contamination_flags,
    remove_contaminated,
)
from deduplication_challenge_spark.operators.sampling import (
    sample_by_hash,
    stratified_sample_by_hash,
)


class TestDecontaminate:
    def test_planted_leak_flagged(self, spark):
        bench = spark.createDataFrame(
            [("the quick brown fox jumps over the lazy dog",)], "text string"
        )
        docs = spark.createDataFrame(
            [
                # full benchmark sentence inside unrelated text -> contaminated
                (1, "intro words then the quick brown fox jumps over the lazy dog and more"),
                # only a 3-gram of the benchmark -> NOT contaminated at n=4
                (2, "totally unrelated but quick brown fox appears here"),
                (3, "nothing shared with anything at all in this one"),
            ],
            "doc_id long, text string",
        )
        flagged = {r["doc_id"]: r["n_matched_grams"]
                   for r in contamination_flags(docs, bench, n=4).collect()}
        assert set(flagged) == {1}
        assert flagged[1] == 6  # 9-token sentence -> 6 distinct 4-grams
        clean = remove_contaminated(docs, bench, n=4)
        assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]

    def test_case_insensitive_and_duplicate_grams_counted_once(self, spark):
        bench = spark.createDataFrame([("Alpha Beta Gamma Delta",)], "text string")
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta alpha beta gamma delta")],
            "doc_id long, text string",
        )
        out = contamination_flags(docs, bench, n=4).collect()
        assert len(out) == 1 and out[0]["n_matched_grams"] == 1  # distinct, lowered

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            contamination_flags(None, None, n=1)


def _md5_pick(key, salt: str, fraction: float) -> bool:
    h = hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:4]
    return h < format(int(fraction * 0x10000), "04x")


class TestHashSampling:
    @pytest.fixture(scope="class")
    def keys_df(self, spark):
        return spark.createDataFrame(
            [(i, "even" if i % 2 == 0 else "odd") for i in range(4000)],
            "k long, stratum string",
        )

    def test_exact_python_replay_and_determinism(self, spark, keys_df):
        got = sorted(r["k"] for r in sample_by_hash(keys_df, "k", 0.25, salt="s").collect())
        expected = sorted(i for i in range(4000) if _md5_pick(i, "s", 0.25))
        assert got == expected
        again = sorted(r["k"] for r in sample_by_hash(keys_df, "k", 0.25, salt="s").collect())
        assert got == again

    def test_fraction_accuracy(self, keys_df):
        n = sample_by_hash(keys_df, "k", 0.25, salt="x").count()
        assert abs(n / 4000 - 0.25) < 0.03  # binomial: sd ~ 0.007

    def test_salts_give_independent_samples(self, keys_df):
        a = {r["k"] for r in sample_by_hash(keys_df, "k", 0.5, salt="a").collect()}
        b = {r["k"] for r in sample_by_hash(keys_df, "k", 0.5, salt="b").collect()}
        overlap = len(a & b) / 4000
        assert 0.15 < overlap < 0.35  # ~0.25 if independent; 0.5 if correlated

    def test_edges(self, keys_df):
        assert sample_by_hash(keys_df, "k", 0.0).count() == 0
        assert sample_by_hash(keys_df, "k", 1.0).count() == 4000
        with pytest.raises(ValueError):
            sample_by_hash(keys_df, "k", 1.5)

    def test_stratified(self, keys_df):
        out = stratified_sample_by_hash(
            keys_df, "stratum", {"even": 0.5, "odd": 0.1}, "k", salt="z"
        ).collect()
        got = {(r["k"], r["stratum"]) for r in out}
        for k, stratum in got:
            frac = 0.5 if stratum == "even" else 0.1
            assert _md5_pick(k, "z", frac)
        n_even = sum(1 for _, s in got if s == "even")
        n_odd = sum(1 for _, s in got if s == "odd")
        assert abs(n_even / 2000 - 0.5) < 0.05
        assert abs(n_odd / 2000 - 0.1) < 0.04

    def test_stratified_default_drops_unlisted(self, spark):
        df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, stratum string")
        out = stratified_sample_by_hash(df, "stratum", {"x": 1.0}, "k")
        assert [r["stratum"] for r in out.collect()] == ["x"]


class TestUrlCanonicalization:
    @pytest.mark.parametrize("raw,want", [
        ("HTTP://WWW.Example.COM:80/A/b/", "https://example.com/A/b"),
        ("https://example.com:443/x?q=1#frag", "https://example.com/x?q=1"),
        ("https://example.com/", "https://example.com/"),  # root slash kept
        ("https://sub.www-like.org/p", "https://sub.www-like.org/p"),
        ("http://example.com", "https://example.com"),
        ("not a url", "not a url"),  # passthrough, never null
        ("https://example.com/a?b=2#x#y", "https://example.com/a?b=2"),
    ])
    def test_rules(self, spark, raw, want):
        from deduplication_challenge_spark.operators.urlnorm import canonical_url

        df = spark.createDataFrame([(raw,)], "url string")
        assert df.select(canonical_url("url").alias("c")).first()["c"] == want

    def test_dedup_by_url_first_seen_wins(self, spark):
        import datetime as dt

        from deduplication_challenge_spark.operators.urlnorm import dedup_by_url

        rows = [
            ("http://www.a.com/p/", dt.datetime(2025, 1, 2), None, "late", "en"),
            ("https://a.com/p", dt.datetime(2025, 1, 1), None, "early", "en"),
            ("https://b.com/q", dt.datetime(2025, 1, 1), None, "other", "en"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        out = {r["canonical_url"]: r for r in dedup_by_url(df).collect()}
        assert len(out) == 2
        assert out["https://a.com/p"]["text"] == "early"  # earliest crawl wins
        assert out["https://b.com/q"]["text"] == "other"

    def test_zero_shuffle_canonicalization(self, spark):
        from deduplication_challenge_spark.operators.urlnorm import canonical_url

        df = spark.createDataFrame([("https://x.com/a",)], "url string")
        plan = df.select(canonical_url("url"))._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestUrlDedupNullSafety:
    def test_null_warc_ts_not_dropped(self, spark):
        """Review finding: a group whose winner has null warc_ts must not
        vanish through the non-null-safe re-join; null ts sorts as epoch."""
        import datetime as dt

        from deduplication_challenge_spark.operators.urlnorm import dedup_by_url

        rows = [
            ("https://a.com/only", None, None, "undated unique", "en"),
            ("https://b.com/p", None, None, "undated dup", "en"),
            ("http://www.b.com/p/", dt.datetime(2025, 1, 1), None, "dated dup", "en"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        out = {r["canonical_url"]: r for r in dedup_by_url(df).collect()}
        assert len(out) == 2
        assert out["https://a.com/only"]["text"] == "undated unique"  # survived
        # null ts == epoch == earliest -> the undated crawl wins the pair
        assert out["https://b.com/p"]["text"] == "undated dup"

    def test_oracle_mirror_handles_null_ts(self):
        from dataclasses import replace

        from deduplication_challenge_spark.config import DedupConfig
        from deduplication_challenge_spark.oracle import run_oracle

        pages = [
            {"url": "https://b.com/p", "warc_ts": None,
             "html": b"<html><body><p>x y z</p></body></html>", "text": None, "lang": "en"},
            {"url": "http://www.b.com/p/", "warc_ts": __import__("datetime").datetime(2025, 1, 1),
             "html": b"<html><body><p>x y z</p></body></html>", "text": None, "lang": "en"},
        ]
        res = run_oracle(pages, replace(DedupConfig(), url_dedup=True), include_substring=False)
        assert len(res.docs) == 1  # no TypeError, undated winner kept


class TestRedactNullText:
    def test_null_text_counts_zero_not_negative(self, spark):
        from deduplication_challenge_spark.operators.redact import redact_pii

        df = spark.createDataFrame(
            [(1, None), (2, "a@b.org wrote")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in redact_pii(df).collect()}
        assert out[1]["n_email"] == 0 and out[1]["n_ipv4"] == 0 and out[1]["n_phone"] == 0
        assert out[1]["text"] == ""  # normalized, not null
        assert out[2]["n_email"] == 1
