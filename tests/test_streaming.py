"""Structured Streaming operator tests, driven to completion with the
availableNow trigger over a file source (deterministic, no live queue)."""

import datetime as dt
import os

import pytest

from deduplication_challenge_spark.streaming.stream_ops import (
    read_page_stream,
    run_to_completion,
    stream_exact_dedup,
    stream_lang_window_counts,
)

TS = dt.datetime(2025, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in"))
    rows = [
        ("https://a/1", TS, None, "same content here", "en"),
        ("https://a/2", TS + dt.timedelta(minutes=1), None, "same content here", "en"),
        ("https://a/3", TS + dt.timedelta(minutes=2), None, "different content", "de"),
        ("https://a/4", TS + dt.timedelta(minutes=11), None, "same content here", "en"),
        ("https://a/5", TS + dt.timedelta(minutes=12), None, "yet another page", "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


class TestStreamExactDedup:
    def test_first_seen_survives(self, spark, stream_input, tmp_path_factory):
        ckpt = str(tmp_path_factory.mktemp("ckpt_dedup"))
        stream = read_page_stream(spark, stream_input)
        name = run_to_completion(stream_exact_dedup(stream, watermark="1 hour"), ckpt)
        out = spark.sql(f"SELECT * FROM {name}").collect()
        texts = sorted(r["text"] for r in out)
        # 'same content here' deduped to one survivor within the watermark
        assert texts == ["different content", "same content here", "yet another page"]

    def test_streaming_plan_is_incremental(self, spark, stream_input):
        stream = read_page_stream(spark, stream_input)
        assert stream_exact_dedup(stream).isStreaming


class TestWindowCounts:
    def test_tumbling_counts(self, spark, stream_input, tmp_path_factory):
        ckpt = str(tmp_path_factory.mktemp("ckpt_win"))
        stream = read_page_stream(spark, stream_input)
        # complete mode: append would emit only windows already past the
        # watermark, and a single availableNow drain closes none of them
        name = run_to_completion(
            stream_lang_window_counts(stream, window="10 minutes", watermark="1 hour"),
            ckpt,
            output_mode="complete",
        )
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        got = {
            (r["window_start"].minute, r["lang"]): r["n_docs"]
            for r in rows
        }
        # window [00:00,00:10): en x2 (urls 1,2), de x1; window [00:10,00:20): en x2
        assert got.get((0, "en")) == 2
        assert got.get((0, "de")) == 1
        assert got.get((10, "en")) == 2


class TestStreamNearDup:
    def test_near_identical_recrawls_suppressed(self, spark, tmp_path_factory):
        """Byte-identical and signature-identical re-crawls share the canopy
        key and dedupe; distinct content survives; empty docs never
        co-bucket with each other."""
        from deduplication_challenge_spark.streaming.stream_ops import stream_near_dup

        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
        other = ("completely different words about completely different "
                 "topics nothing shared at all here friend ") * 4
        rows = [
            ("https://s/1", TS, None, base, "en"),
            ("https://s/2", TS + dt.timedelta(minutes=1), None, base, "en"),  # exact re-crawl
            ("https://s/3", TS + dt.timedelta(minutes=2), None, other, "en"),
            ("https://s/4", TS + dt.timedelta(minutes=3), None, "", "en"),    # empty
            ("https://s/5", TS + dt.timedelta(minutes=4), None, "", "en"),    # empty
        ]
        path = str(tmp_path_factory.mktemp("neardup_in"))
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        ).coalesce(1).write.mode("overwrite").parquet(path)
        ckpt = str(tmp_path_factory.mktemp("ckpt_neardup"))
        stream = read_page_stream(spark, path)
        name = run_to_completion(stream_near_dup(stream, watermark="1 hour"), ckpt)
        out = spark.sql(f"SELECT * FROM {name}").collect()
        urls = sorted(r["url"] for r in out)
        # one survivor of the base pair; both empties survive (url-keyed)
        assert len([u for u in urls if u in ("https://s/1", "https://s/2")]) == 1
        assert "https://s/3" in urls
        assert "https://s/4" in urls and "https://s/5" in urls

    def test_is_streaming_and_bounded_state(self, spark, tmp_path_factory):
        from deduplication_challenge_spark.streaming.stream_ops import stream_near_dup

        path = str(tmp_path_factory.mktemp("neardup_in2"))
        spark.createDataFrame(
            [("https://s/9", TS, None, "hello world " * 20, "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        ).coalesce(1).write.mode("overwrite").parquet(path)
        stream = read_page_stream(spark, path)
        df = stream_near_dup(stream)
        assert df.isStreaming
        assert "canopy" in df.columns
        assert "len_bucket" in df.columns  # widened key: canopy + length

    def test_length_bucket_guards_precision(self, spark):
        """The canopy key includes a doubling length bucket: docs ~2x apart
        in length can never co-suppress (random band-hash collisions between
        dissimilar docs are killed), while a 4% near-dup edit stays in the
        same bucket."""
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(100,), (1000,), (1040,), (4000,)], "n int"
        ).select(
            "n",
            F.floor(F.log2(F.lit(1.0) + F.col("n") / F.lit(64.0))).cast("int").alias("b"),
        )
        b = {r["n"]: r["b"] for r in df.collect()}
        assert b[100] != b[1000]      # dissimilar lengths -> different buckets
        assert b[1000] == b[1040]     # 4% edit -> same bucket
        assert b[1000] != b[4000]


class TestStreamNearDupTagged:
    def test_all_rows_kept_and_tagged(self, spark, tmp_path_factory):
        """The lossless variant emits EVERY input row exactly once; later
        canopy-mates are tagged suppressed with first_url pointing at the
        first-seen member — nothing is dropped (side-sink recovery path)."""
        from deduplication_challenge_spark.streaming.stream_ops import (
            stream_near_dup_tagged,
        )

        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
        other = ("completely different words about completely different "
                 "topics nothing shared at all here friend ") * 4
        rows = [
            ("https://t/1", TS, None, base, "en"),
            ("https://t/2", TS + dt.timedelta(minutes=1), None, base, "en"),  # re-crawl
            ("https://t/3", TS + dt.timedelta(minutes=2), None, other, "en"),
            ("https://t/4", TS + dt.timedelta(minutes=3), None, "", "en"),    # empty
        ]
        path = str(tmp_path_factory.mktemp("tagged_in"))
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        ).coalesce(1).write.mode("overwrite").parquet(path)
        ckpt = str(tmp_path_factory.mktemp("ckpt_tagged"))
        stream = read_page_stream(spark, path)
        name = run_to_completion(stream_near_dup_tagged(stream, watermark="1 hour"), ckpt)
        out = {r["url"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
        assert sorted(out) == [f"https://t/{i}" for i in (1, 2, 3, 4)]  # lossless
        assert not out["https://t/1"]["suppressed"]  # first-seen by event time
        assert out["https://t/2"]["suppressed"]
        assert out["https://t/2"]["first_url"] == "https://t/1"
        assert not out["https://t/3"]["suppressed"]  # distinct content
        assert not out["https://t/4"]["suppressed"]  # empty doc keys on url
        # agreement with the dropping variant: suppressed=false === survivors
        from deduplication_challenge_spark.streaming.stream_ops import stream_near_dup

        ckpt2 = str(tmp_path_factory.mktemp("ckpt_tagged_ref"))
        name2 = run_to_completion(
            stream_near_dup(read_page_stream(spark, path), watermark="1 hour"), ckpt2
        )
        survivors = {r["url"] for r in spark.sql(f"SELECT * FROM {name2}").collect()}
        assert {u for u, r in out.items() if not r["suppressed"]} == survivors

    def test_state_spans_micro_batches(self, spark, tmp_path_factory):
        """A re-crawl arriving in a LATER micro-batch is still tagged
        suppressed: the (first_url, first_ts) state persists across batches
        within the watermark horizon."""
        from deduplication_challenge_spark.streaming.stream_ops import (
            stream_near_dup_tagged,
        )

        text = "one two three four five six seven eight nine ten " * 8
        path = str(tmp_path_factory.mktemp("tagged_multi"))
        schema = "url string, warc_ts timestamp, html binary, text string, lang string"
        # two separate files + maxFilesPerTrigger=1 -> two micro-batches
        spark.createDataFrame([("https://m/1", TS, None, text, "en")], schema) \
            .coalesce(1).write.parquet(path + "/f1")
        spark.createDataFrame(
            [("https://m/2", TS + dt.timedelta(minutes=5), None, text, "en")], schema
        ).coalesce(1).write.parquet(path + "/f2")
        import glob, shutil
        merged = str(tmp_path_factory.mktemp("tagged_merged"))
        for i, f in enumerate(sorted(glob.glob(path + "/f*/*.parquet"))):
            shutil.copy(f, f"{merged}/part-{i}.parquet")
        ckpt = str(tmp_path_factory.mktemp("ckpt_tagged_multi"))
        stream = read_page_stream(spark, merged, max_files_per_trigger=1)
        name = run_to_completion(stream_near_dup_tagged(stream, watermark="1 hour"), ckpt)
        out = {r["url"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
        assert len(out) == 2
        n_sup = sum(r["suppressed"] for r in out.values())
        assert n_sup == 1
        sup = next(r for r in out.values() if r["suppressed"])
        first = next(r for r in out.values() if not r["suppressed"])
        assert sup["first_url"] == first["url"]


class TestTaggedNullTimestamps:
    def test_null_warc_ts_rows_flow_through(self, spark, tmp_path_factory):
        """Null-date rows (the WARC reader's output for bad dates) must be
        tagged, not crash the query via an epoch-anchored timeout."""
        from deduplication_challenge_spark.streaming.stream_ops import (
            stream_near_dup_tagged,
        )

        rows = [
            ("https://z/1", None, None, "content alpha beta gamma delta " * 8, "en"),
            ("https://z/2", TS, None, "totally different words here entirely " * 8, "en"),
        ]
        path = str(tmp_path_factory.mktemp("tagged_nullts"))
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        ).coalesce(1).write.mode("overwrite").parquet(path)
        ckpt = str(tmp_path_factory.mktemp("ckpt_nullts"))
        name = run_to_completion(
            stream_near_dup_tagged(read_page_stream(spark, path), watermark="1 hour"), ckpt
        )
        out = spark.sql(f"SELECT * FROM {name}").collect()
        assert len(out) == 2  # lossless, no crash
        assert all(not r["suppressed"] for r in out)

    def test_null_ts_sorts_as_epoch_not_last(self, spark, tmp_path_factory):
        """Advisor finding: pandas sorts NaT LAST, but the engine's pinned
        null-ts convention is the EPOCH (urlnorm._NULL_TS) — a null-ts row
        sharing a canopy group with dated rows must be elected 'first seen',
        matching the batch first-seen rule."""
        from deduplication_challenge_spark.streaming.stream_ops import (
            stream_near_dup_tagged,
        )

        text = "shared canopy words alpha beta gamma delta epsilon " * 8
        rows = [
            ("https://e/dated", TS, None, text, "en"),
            ("https://e/nullts", None, None, text, "en"),  # same canopy, null ts
        ]
        path = str(tmp_path_factory.mktemp("tagged_null_order"))
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        ).coalesce(1).write.mode("overwrite").parquet(path)
        ckpt = str(tmp_path_factory.mktemp("ckpt_null_order"))
        name = run_to_completion(
            stream_near_dup_tagged(read_page_stream(spark, path), watermark="1 hour"), ckpt
        )
        out = {r["url"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
        assert not out["https://e/nullts"]["suppressed"]  # epoch < TS => first
        assert out["https://e/dated"]["suppressed"]
        assert out["https://e/dated"]["first_url"] == "https://e/nullts"
