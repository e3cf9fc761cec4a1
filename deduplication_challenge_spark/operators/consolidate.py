"""Per-cluster consolidation into one enriched canonical record.

This is the reference's core contract — "consolidate duplicate product
entries into a single, enriched record per product, ensuring uniqueness
while maximizing the available information" (/root/reference/README.md:3-4),
merge loop at /root/reference/src/main.py:21-73 — re-expressed for web pages
per the north_star: longest text, earliest warc_ts, merged lang/url
metadata, provenance details.

Pinned election semantics (deterministic — SURVEY.md §7.5; every tie-break
is a total order on doc_id so results are identical across partitionings):
  * cluster_id       = component min doc_id
  * doc_id           = min(doc_id)            (survivor = min id,
                        /root/reference/src/controller.py:230-235)
  * text, url        = of the member with (longest text, tie: min doc_id)
                        (lengthiest-value policy,
                        /root/reference/src/controller.py:237-244)
  * warc_ts          = min(warc_ts)           (earliest observation)
  * lang             = most frequent, tie: lexicographic (deterministic
                        relaxation of the reference's order-dependent
                        frequency election, SURVEY.md §4.3.3)
  * langs            = sorted distinct langs  (completing policy,
                        /root/reference/src/controller.py:322-332)
  * member_urls      = sorted member urls     (provenance,
                        /root/reference/src/controller.py:145-154)
  * n_members, details(JSON field->value->urls,
                        /root/reference/src/controller.py:134-168)

Physical plan: clusters with >= 2 members go through
``groupBy(cluster_id).applyInPandas`` (north_star mandate); singletons — the
overwhelming majority at web scale — take a pure-JVM projection building the
identical schema, so they never pay the Python/Arrow round trip (mirrors the
reference's ">= 2 members only" rule, /root/reference/src/main.py:93-95).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CANONICAL_SCHEMA = (
    "cluster_id long, doc_id long, url string, warc_ts timestamp, text string, "
    "lang string, langs array<string>, member_urls array<string>, "
    "n_members long, details string"
)

# slim kernel output: the winning TEXT itself is joined back JVM-side after
# the kernel (winner_doc_id), so full document bodies never cross the Arrow
# boundary — at 1M-docs bench scale that cut the consolidate stage's Python
# payload ~10x
CANONICAL_SLIM_SCHEMA = (
    "cluster_id long, doc_id long, winner_doc_id long, url string, "
    "warc_ts timestamp, lang string, langs array<string>, "
    "member_urls array<string>, n_members long, details string"
)


def consolidate_cluster_slim_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Consolidation kernel for ONE cluster over slim columns
    (cluster_id, doc_id, url, warc_ts, lang, text_len) — shared with the
    pytest oracle, same bytes by construction."""
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    # null url would TypeError inside sorted(); normalize like lang below
    # (the pipeline never ships null urls, direct callers may)
    pdf = pdf.assign(url=pdf["url"].fillna(""))
    cluster_id = int(pdf["cluster_id"].iloc[0])
    # longest text, tie -> min doc_id (stable sort preserves doc_id order;
    # idxmax returns the FIRST occurrence of the max)
    winner = pdf["text_len"].fillna(0).idxmax()
    # value_counts drops NaN; all-null lang would leave it empty (the
    # pipeline coalesces lang to '' in ingest, but direct callers may not)
    lang_counts = pdf["lang"].fillna("").value_counts()
    top = lang_counts[lang_counts == lang_counts.max()]
    lang = sorted(top.index)[0]
    details = {
        "lang": {
            str(v): sorted(pdf.loc[pdf["lang"] == v, "url"])
            for v in pdf["lang"].dropna().unique()
        }
    }
    return pd.DataFrame(
        {
            "cluster_id": [cluster_id],
            "doc_id": [int(pdf["doc_id"].min())],
            "winner_doc_id": [int(pdf["doc_id"].iloc[winner])],
            "url": [pdf["url"].iloc[winner]],
            "warc_ts": [pdf["warc_ts"].min()],
            "lang": [lang],
            "langs": [sorted(pdf["lang"].dropna().unique())],
            "member_urls": [sorted(pdf["url"])],
            "n_members": [len(pdf)],
            "details": [json.dumps(details, sort_keys=True, separators=(",", ":"))],
        }
    )


def consolidate_cluster_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Full-schema kernel (slim kernel + text attach) — the oracle and the
    kernel-golden tests consume this; the Spark plan uses the slim kernel
    with a JVM-side text join instead."""
    slim_in = pdf.assign(text_len=pdf["text"].fillna("").str.len())
    out = consolidate_cluster_slim_pdf(
        slim_in[["cluster_id", "doc_id", "url", "warc_ts", "lang", "text_len"]]
    )
    text_by_id = dict(zip(pdf["doc_id"], pdf["text"]))
    # slim output still carries winner_doc_id at position 2, so index 5
    # lands text AFTER warc_ts — matching CANONICAL_SCHEMA's column order
    # once winner_doc_id is dropped
    out.insert(5, "text", out["winner_doc_id"].map(text_by_id))
    return out.drop(columns=["winner_doc_id"])


def attach_clusters(docs: DataFrame, assignments: DataFrame) -> DataFrame:
    """Left-join CC assignments; unclustered docs become their own cluster
    (singleton passthrough)."""
    return docs.join(assignments, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    )


def consolidate(docs_with_cluster: DataFrame, min_group_size: int = 2) -> DataFrame:
    """(doc_id, url, warc_ts, text, lang, cluster_id) -> canonical table."""
    # null policy pinned at entry, for BOTH paths: lang/url normalize to ''
    # (the pipeline's ingest already does this; a direct caller shipping
    # nulls would otherwise crash the singleton path's create_map with
    # NULL_MAP_KEY and the kernel's sorted(url) with a TypeError)
    docs_with_cluster = docs_with_cluster.withColumn(
        "lang", F.coalesce("lang", F.lit(""))
    ).withColumn("url", F.coalesce("url", F.lit("")))
    # Cluster sizing via aggregate + shuffle join on cluster_id: the join
    # reuses the same hash partitioning the applyInPandas groupBy needs, so
    # AQE collapses the exchanges; a window count would be equivalent but
    # hides the reuse.
    sizes = docs_with_cluster.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    dc = docs_with_cluster.join(sizes, "cluster_id")

    multi = dc.where(F.col("n_members") >= min_group_size)
    single = dc.where(F.col("n_members") < min_group_size)

    # slim columns through the Arrow boundary; winning text joined back
    # JVM-side.  The lazy localCheckpoint lets slim (one row per multi-member
    # cluster — tiny next to docs) be referenced twice without recomputing
    # the Arrow kernel: once for the distinct winner ids that SEMI-JOIN-prune
    # the docs build side explicitly (not left to AQE), once for the final
    # text attach.
    #
    # The kernel is invoked per BUCKET of clusters, not per cluster: a
    # per-cluster FlatMapGroupsInPandas pays ~ms of pandas frame overhead
    # per group, and AQE byte-coalesces the tiny shuffle onto a handful of
    # tasks (measured 6.1s for 2.9k clusters on 6 tasks at the 50k-doc
    # bench).  Clusters are hashed into defaultParallelism buckets via an
    # EXPLICIT repartition (AQE respects user-specified partition counts,
    # so Python-heavy work keeps its parallelism), and the per-cluster
    # kernel — still the single shared implementation the oracle uses —
    # loops inside each bucket call.
    # 4x the core count: finer buckets keep the per-task inner loop short
    # and balanced as the cluster count grows, at no extra shuffle cost
    n_buckets = 4 * docs_with_cluster.sparkSession.sparkContext.defaultParallelism

    def _bucket_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [
            consolidate_cluster_slim_pdf(g)
            for _, g in pdf.drop(columns=["_b"]).groupby("cluster_id", sort=False)
        ]
        return pd.concat(parts, ignore_index=True)

    slim = (
        multi.select(
            "cluster_id", "doc_id", "url", "warc_ts", "lang",
            F.length(F.coalesce(F.col("text"), F.lit(""))).alias("text_len"),
        )
        .withColumn("_b", F.pmod(F.xxhash64("cluster_id"), F.lit(n_buckets)))
        .repartition(n_buckets, "_b")
        .groupBy("_b")
        .applyInPandas(_bucket_kernel, schema=CANONICAL_SLIM_SCHEMA)
        .localCheckpoint(eager=False)
    )
    winner_ids = slim.select(F.col("winner_doc_id").alias("doc_id")).distinct()
    winner_text = (
        docs_with_cluster.join(winner_ids, "doc_id", "left_semi")
        .select(F.col("doc_id").alias("winner_doc_id"), F.col("text"))
    )
    consolidated = slim.join(winner_text, "winner_doc_id").select(
        "cluster_id", "doc_id", "url", "warc_ts", "text", "lang",
        "langs", "member_urls", "n_members", "details",
    )
    passthrough = single.select(
        "cluster_id",
        "doc_id",
        "url",
        "warc_ts",
        "text",
        "lang",
        F.array("lang").alias("langs"),
        F.array("url").alias("member_urls"),
        F.lit(1).cast("long").alias("n_members"),
        # compact JSON identical to the kernel's json.dumps(...,
        # separators=(",", ":"), sort_keys=True) for the one-member case
        F.to_json(
            F.create_map(
                F.lit("lang"), F.create_map(F.col("lang"), F.array(F.col("url")))
            )
        ).alias("details"),
    )
    return consolidated.unionByName(passthrough)
