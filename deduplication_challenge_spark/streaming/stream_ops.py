"""Streaming operators: incremental exact dedup + windowed event analytics.

Patterns:
  * exact dedup of a page stream — ``dropDuplicatesWithinWatermark`` on the
    content hash: state is bounded by the watermark horizon instead of
    growing forever (the only viable contract at crawl scale);
  * windowed per-lang throughput — watermark + tumbling window aggregation;
  * signature stream — the SAME Arrow kernel as batch
    (operators/signatures.compute_signatures works unchanged on a streaming
    DataFrame: mapInPandas is stateless per batch).

Tests drive these with a file source + ``trigger(availableNow=True)`` so
they run deterministically to completion on the sandbox (no real queue).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduplication_challenge_spark.operators.ingest import extract_pages

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_page_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_exact_dedup(pages_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """First-seen page per exact text content within the watermark horizon.

    Streaming analog of operators/exact.py: late re-crawls of already-seen
    content are dropped; state for a content hash is evicted once the
    watermark passes it.
    """
    docs = extract_pages(pages_stream)
    return (
        docs.withColumn("text_hash", F.sha2("text", 256))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def stream_near_dup(pages_stream: DataFrame, cfg=None, watermark: str = "1 hour") -> DataFrame:
    """Streaming NEAR-dup suppression via a canopy key: (each doc's minimum
    LSH band-bucket hash, coarse length bucket), deduped with
    watermark-bounded state.  One Arrow pass computes shingles -> MinHash ->
    band hashes -> min.

    Detection contract (documented, deliberately weaker than batch):
    byte-identical and signature-identical docs ALWAYS share the canopy key
    (identical bands => identical min, identical length bucket);
    partially-similar docs are caught when their minimum-valued band
    collides, which for Jaccard s is at least s^rows per band and
    concentrates on the argmin band.  Full recall stays with the batch
    pipeline — this operator is the bounded-state frontline filter that
    keeps obvious re-crawls out of the batch input, the only viable
    stateful contract at crawl scale (state per canopy key, evicted at the
    watermark horizon).

    PRECISION / data-loss risk (explicit): suppression happens on canopy-key
    equality alone — no similarity verification is possible inside
    dropDuplicatesWithinWatermark, so two DISSIMILAR docs whose argmin band
    hashes collide (prob ~s^rows per band pair for Jaccard s, plus ~2^-64
    raw hash collisions at crawl scale) would be silently suppressed.  Two
    mitigations: (1) the key includes a coarse doubling length bucket
    (floor(log2(1 + len/64))), so colliding docs must ALSO be within ~2x in
    length — near-dups almost always are, random collisions almost never;
    (2) when losing a colliding row is unacceptable, use
    :func:`stream_near_dup_tagged` instead — the lossless variant that TAGS
    canopy-mates rather than dropping them, so suppressed rows can ride a
    side sink into the batch pipeline for verification/recovery while the
    canopy filter only decides what is processed eagerly, never what is
    kept.  Near-dup pairs that straddle a
    length-bucket boundary lose suppression (recall, not correctness —
    batch catches them)."""
    docs = _with_canopy_key(extract_pages(pages_stream), cfg)
    return (
        docs.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["canopy", "len_bucket"])
    )


def _with_canopy_key(docs: DataFrame, cfg=None) -> DataFrame:
    """Attach the near-dup canopy key columns: ``canopy`` (the doc's minimum
    LSH band-bucket hash, one Arrow pass over shingles -> MinHash -> band
    hashes) and ``len_bucket`` (coarse doubling length bucket)."""
    from deduplication_challenge_spark.config import DedupConfig
    from deduplication_challenge_spark.functions import hashing as H
    from deduplication_challenge_spark.functions.textnorm import shingles

    cfg = cfg or DedupConfig()
    a, b = H.minhash_params(cfg.num_perm, cfg.seed, cfg.minhash_prime)

    @F.pandas_udf("long")
    def canopy_udf(text: pd.Series) -> pd.Series:
        out: list[int | None] = [None] * len(text)
        for i, t in enumerate(text.tolist()):
            sh = shingles(t or "", cfg.shingle_k)
            if not sh:
                continue  # null -> coalesced to a per-url key below
            sig = H.minhash_signature(H.hash64_batch(sh, seed=cfg.seed), a, b, cfg.minhash_prime)
            out[i] = int(H.band_hashes(sig, cfg.bands, cfg.rows, cfg.seed).min())
        return pd.Series(out, dtype="Int64")

    # shingle-less (empty/tiny) docs key on their url so they never co-bucket
    # with each other or with real band hashes
    canopy = F.coalesce(canopy_udf("text"), F.xxhash64(F.lit("empty:"), F.col("url")))
    # coarse doubling length bucket: docs must be within ~2x in length to
    # co-suppress — kills virtually all random band-hash collisions while
    # keeping true near-dups (which share most of their text) together
    len_bucket = F.floor(F.log2(F.lit(1.0) + F.length(F.coalesce("text", F.lit(""))) / F.lit(64.0)))
    return docs.withColumn("canopy", canopy).withColumn("len_bucket", len_bucket.cast("int"))


def _duration_ms(spec: str) -> int:
    """Parse a simple '<n> second(s)|minute(s)|hour(s)|day(s)' duration."""
    scale = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
    try:
        n, unit = spec.strip().split()
        return int(n) * scale[unit.rstrip("s")]
    except (ValueError, KeyError):
        raise ValueError(
            f"unsupported duration {spec!r}: use '<n> second(s)/minute(s)/hour(s)/day(s)'"
        ) from None


TAGGED_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string, "
    "canopy long, len_bucket int, suppressed boolean, first_url string"
)


def stream_near_dup_tagged(
    pages_stream: DataFrame, cfg=None, watermark: str = "1 hour"
) -> DataFrame:
    """Lossless variant of :func:`stream_near_dup`: instead of DROPPING
    later arrivals that share a canopy key, every input row is emitted with
    a ``suppressed`` flag and a ``first_url`` pointer to the first-seen
    member of its canopy group — a custom stateful operator built on
    ``applyInPandasWithState``.

    This is the side-sink recovery pattern made concrete: route
    ``suppressed = false`` rows to the eager path and ``suppressed = true``
    rows to a staging sink the BATCH pipeline verifies later, so a canopy
    collision between dissimilar docs (see stream_near_dup's precision
    note) delays processing of a row but can never lose it.

    State per canopy key is one (first_url, first_ts) pair, evicted by an
    event-time timeout one watermark horizon after the group's newest row —
    the same bounded-state contract as dropDuplicatesWithinWatermark."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    horizon_ms = _duration_ms(watermark)
    docs = _with_canopy_key(extract_pages(pages_stream), cfg)

    def tag(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        first_url, first_ts = state.get if state.exists else (None, 0)
        # concat the whole group THEN sort: per-chunk sorting would make the
        # "first seen" election depend on Spark's chunking of the group.
        # Null timestamps sort as the EPOCH (the engine's pinned null-ts
        # convention, operators/urlnorm._NULL_TS) — NOT pandas' NaT-last —
        # so the streaming election matches the batch first-seen rule.
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            if state.exists:
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + horizon_ms)
            return
        pdf = pd.concat(chunks, ignore_index=True)
        ts_filled = pdf["warc_ts"].fillna(pd.Timestamp(0))
        pdf = pdf.assign(_ts=ts_filled).sort_values(["_ts", "url"], kind="mergesort")
        ts_ms = pdf["_ts"].to_numpy("datetime64[ns]").astype("int64") // 1_000_000
        max_ts = int(ts_ms.max())
        # vectorized election: only the group's globally-first row (state
        # empty) is unsuppressed; everything else tags to first_url
        suppressed = [True] * len(pdf)
        if first_url is None:
            first_url, first_ts = pdf["url"].iloc[0], int(ts_ms[0])
            suppressed[0] = False
        frames = [
            pdf.assign(suppressed=suppressed, first_url=first_url)[
                ["url", "warc_ts", "text", "lang", "canopy", "len_bucket",
                 "suppressed", "first_url"]
            ]
        ]
        state.update((first_url, first_ts))
        # anchor the timeout at max(newest event, current watermark): rows
        # with null warc_ts contribute ts_ms=0, and epoch+horizon would sit
        # BELOW an advanced watermark — Spark rejects that and fails the
        # whole query
        state.setTimeoutTimestamp(max(max_ts, state.getCurrentWatermarkMs()) + horizon_ms)
        yield from frames

    return (
        docs.withWatermark("warc_ts", watermark)
        .groupBy("canopy", "len_bucket")
        .applyInPandasWithState(
            tag,
            outputStructType=TAGGED_SCHEMA,
            stateStructType="first_url string, first_ts long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_lang_window_counts(
    pages_stream: DataFrame, window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window docs/lang counts with late-data tolerance."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_docs",
        )
    )


def run_to_completion(stream_df: DataFrame, checkpoint: str, output_mode: str = "append"):
    """Drain all available input (availableNow trigger) into an in-memory
    table; returns the query name for SELECT-back. Test harness helper ONLY:
    the memory sink does not support checkpoint recovery — use a real sink
    (parquet/kafka) for restart semantics (verified: stateful dedup state
    survives restarts with a parquet sink on the same checkpoint)."""
    import uuid

    name = f"q_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name
