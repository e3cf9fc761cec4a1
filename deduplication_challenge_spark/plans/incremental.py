"""Incremental dedup — attach a NEW crawl batch to an EXISTING dedup index
without recomputing the index.  At 10^12-doc scale the full pipeline runs
once per corpus, not once per crawl: each new batch is deduped against the
persisted signatures of everything already processed, and only affected
clusters re-consolidate.

Index = the stage tables a previous ``DedupPipeline`` run left in its
workdir (``ingest`` docs, ``signatures``, ``cc`` assignments) — the
incremental pass reads them as plain parquet and never rewrites them.

Pinned contract:
  * APPEND-ONLY: existing cluster assignments never change;
  * a new doc (or a whole new-new connected component) attaches to the
    MINIMUM existing cluster id among its verified edges into the index;
  * a component bridging >= 2 existing clusters still attaches to the
    minimum, and the bridge is RECORDED in the ``bridges`` output — the
    signal that a periodic full recluster (compaction) is due, never a
    silent merge or a silent drop;
  * detection scope: MinHash-LSH bands + Jaccard verification (plus
    new-vs-new SimHash).  The suffix-array substring pass needs the full
    corpus text and is deliberately a full-run/compaction concern —
    documented, not silent (`report['scope']`).

Scale shape: the cross join touches only LSH band buckets that contain at
least one NEW doc (the band equi-join prunes the index side); per bucket,
each new doc pairs with the MINIMUM old doc (star-edge analog, <= bands
edges per new doc — never |new| x |old|); verification joins project
signatures to (doc_id, minhash) only.  Old text is re-read ONLY for
clusters that actually gained members (semi-join prune on the ingest
table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduplication_challenge_spark.config import DedupConfig
from deduplication_challenge_spark.operators import lsh, simhash, verify
from deduplication_challenge_spark.operators.connected_components import (
    connected_components,
)
from deduplication_challenge_spark.operators.consolidate import (
    attach_clusters,
    consolidate,
)
from deduplication_challenge_spark.operators.ingest import extract_pages
from deduplication_challenge_spark.operators.signatures import compute_signatures


def lsh_cross_candidates(bands_new: DataFrame, bands_old: DataFrame) -> DataFrame:
    """Cross candidates (src=new, dst=old): band equi-join pruning the index
    to buckets containing a new doc; min old doc per bucket bounds fan-out
    at <= bands edges per new doc (the star-edge analog)."""
    return (
        bands_new.join(
            bands_old.groupBy("band_idx", "band_hash").agg(
                F.min("doc_id").alias("old_doc")
            ),
            ["band_idx", "band_hash"],
        )
        .select(F.col("doc_id").alias("src"), F.col("old_doc").alias("dst"))
        .distinct()
    )


def simhash_cross_candidates(
    chunks_new: DataFrame, chunks_old: DataFrame, hamming_k: int
) -> DataFrame:
    """Manku's online probe as an equi-join: new permuted chunk keys vs the
    index's chunk table (min old per bucket), accepted on Hamming <= k."""
    old_min = chunks_old.groupBy("chunk_idx", "chunk_val").agg(
        F.min(F.struct("doc_id", "simhash")).alias("o")
    )
    return (
        chunks_new.join(old_min, ["chunk_idx", "chunk_val"])
        .where(
            F.bit_count(F.col("simhash").bitwiseXOR(F.col("o.simhash"))) <= hamming_k
        )
        .select(F.col("doc_id").alias("src"), F.col("o.doc_id").alias("dst"))
        .distinct()
    )


class IncrementalDedup:
    """Attach new pages to the index in ``index_workdir`` (a completed
    DedupPipeline workdir with the SAME config)."""

    def __init__(self, spark: SparkSession, cfg: DedupConfig, index_workdir: str) -> None:
        if cfg.line_dedup_min_docs:
            # line dedup is a CORPUS-WIDE document-frequency decision; a
            # batch cannot recompute it consistently with the index (the
            # index's signatures were taken over line-deduped text, the
            # batch would approximate with batch-local frequencies and the
            # signatures would disagree).  Loud beats approximate: run the
            # stage at full-run compaction time instead.
            raise ValueError(
                "line_dedup_min_docs is a full-run (compaction) stage; "
                "incremental attach over a line-deduped index would compute "
                "inconsistent signatures — unset it for delta batches"
            )
        self.spark = spark
        self.cfg = cfg
        self.workdir = index_workdir
        for stage in ("ingest", "signatures", "cc"):
            if not os.path.exists(os.path.join(index_workdir, stage)):
                raise FileNotFoundError(
                    f"index workdir is missing the '{stage}' stage table: "
                    f"{index_workdir} (run DedupPipeline first)"
                )

    def _index(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.workdir, stage))

    def run(self, new_pages: DataFrame, recompute_text: bool = True):
        """-> (canonical_updates, assignments_new, bridges, report dict).

        ``canonical_updates`` holds the re-consolidated records for every
        cluster that gained members plus brand-new clusters — the delta to
        upsert over the previous canonical table."""
        cfg = self.cfg
        if cfg.url_dedup:
            # unlike line dedup, url dedup is batch-local-safe: it is
            # per-row canonicalization + within-input first-seen, and a url
            # variant of an INDEXED page simply attaches via signatures
            from deduplication_challenge_spark.operators.urlnorm import dedup_by_url

            new_pages = dedup_by_url(new_pages).drop("canonical_url")
        docs_new = extract_pages(new_pages, recompute_text=recompute_text)
        docs_new = docs_new.localCheckpoint(eager=False)
        sigs_new = compute_signatures(docs_new, cfg).localCheckpoint(eager=False)

        sigs_old = self._index("signatures")
        assign_old = self._index("cc")  # (doc_id, cluster_id)

        bands_new = lsh.band_table(sigs_new)
        bands_old = lsh.band_table(sigs_old)

        cross = lsh_cross_candidates(bands_new, bands_old)
        sigs_union = sigs_new.unionByName(sigs_old)
        cross_lsh = verify.verify_pairs(cross, sigs_union, cfg).select("src", "dst")

        from deduplication_challenge_spark.operators.simhash import simhash_chunk_table

        cross_sim = simhash_cross_candidates(
            simhash_chunk_table(sigs_new, cfg),
            simhash_chunk_table(sigs_old, cfg),
            cfg.hamming_k,
        )
        # lazy checkpoint: cross_ok feeds the attach join AND two report
        # counters — without it the band join + verify + simhash probe (the
        # dominant cost at index scale) would re-execute per consumer
        cross_ok = cross_lsh.unionByName(cross_sim).distinct().localCheckpoint(eager=False)

        # new-vs-new edges: the standard batch rules at batch scale
        nn_lsh, _ = lsh.candidate_pairs(bands_new, cfg)
        nn_sim, _ = simhash.hamming_pairs(sigs_new, cfg)
        nn_ok = (
            verify.verify_pairs(nn_lsh.select("src", "dst"), sigs_new, cfg)
            .select("src", "dst")
            .unionByName(nn_sim.select("src", "dst"))
            .distinct()
        )
        comps = connected_components(nn_ok)  # (doc_id, cluster_id) among new
        comp_of = docs_new.select("doc_id").join(comps, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("comp_id")
        )

        # attachment: per component, min existing cluster over members' edges.
        # LEFT join + coalesce because the persisted cc table only contains
        # docs that appeared in edges — an index doc that was a SINGLETON
        # has no row there and its implicit cluster id is its own doc_id
        # (the same coalesce rule consolidate applies)
        attach = (
            cross_ok.join(
                assign_old.select(
                    F.col("doc_id").alias("dst"), F.col("cluster_id").alias("old_cluster")
                ),
                "dst",
                "left",
            )
            .withColumn("old_cluster", F.coalesce("old_cluster", F.col("dst")))
            .join(comp_of.select(F.col("doc_id").alias("src"), "comp_id"), "src")
        )
        per_comp = attach.groupBy("comp_id").agg(
            F.min("old_cluster").alias("attached_cluster"),
            F.countDistinct("old_cluster").alias("n_old_clusters"),
            # sort BEFORE capping: the 16 SMALLEST cluster ids, deterministic
            # (and always containing attached_cluster = the minimum)
            F.slice(F.array_sort(F.collect_set("old_cluster")), 1, 16).alias(
                "bridged_clusters"
            ),
        ).localCheckpoint(eager=False)  # feeds assignments + bridges + report
        bridges = per_comp.where(F.col("n_old_clusters") >= 2).select(
            "comp_id", "n_old_clusters", "bridged_clusters"
        )
        assignments_new = (
            comp_of.join(per_comp.select("comp_id", "attached_cluster"), "comp_id", "left")
            .select(
                "doc_id",
                F.coalesce("attached_cluster", "comp_id").alias("cluster_id"),
                F.col("attached_cluster").isNotNull().alias("attached"),
            )
        ).localCheckpoint(eager=False)

        # delta consolidation: old members of clusters that gained members,
        # plus every new doc
        touched = assignments_new.where("attached").select("cluster_id").distinct()
        docs_old_touched = (
            self._index("ingest")
            .join(assign_old, "doc_id", "left")
            .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
            .join(touched, "cluster_id", "left_semi")
            # re-crawl of a known url carries the SAME doc_id (xxhash64(url));
            # the new version wins (last-write-wins) so the doc never appears
            # twice in one consolidation group
            .join(docs_new.select("doc_id"), "doc_id", "left_anti")
        )
        docs_all = attach_clusters(docs_new, assignments_new.select("doc_id", "cluster_id")).unionByName(
            docs_old_touched, allowMissingColumns=True
        ).drop("attached")
        canonical_updates = consolidate(docs_all, cfg.min_group_size)

        report = {
            "new_docs": docs_new.count(),
            "cross_pairs_verified": cross_ok.count(),
            "attached_docs": assignments_new.where("attached").count(),
            "new_clusters": assignments_new.where("NOT attached")
            .select("cluster_id").distinct().count(),
            "bridges": bridges.count(),
            "scope": "minhash-lsh+verify cross; lsh+simhash new-new; "
                     "substring pass deferred to full-run compaction",
        }
        self._last = (docs_new, sigs_new, assignments_new)
        return canonical_updates, assignments_new, bridges, report

    def extend_index(self) -> None:
        """Grow the index with the batch from the last ``run`` so the NEXT
        batch attaches against everything seen so far — the operational
        loop: run(B); extend_index(); run(C); ...

        Appends the batch's docs / signatures / assignments to the index
        stage tables (parquet append — on Iceberg this is a snapshot
        append).  Re-crawled urls (doc_ids already present in the index)
        are EXCLUDED from the append — first-write-wins for the index
        itself, so a doc_id can never appear twice in the stage tables and
        inflate later consolidation groups; the re-crawl still participated
        in the attach that just ran (its delta consolidation was
        last-write-wins).  The workdir stops being a resumable
        DedupPipeline checkpoint once extended — its stage manifests
        describe the ORIGINAL run — so the manifests are deleted to make
        any later resume attempt rebuild loudly instead of silently
        reusing stale fingerprints."""
        if not hasattr(self, "_last"):
            raise RuntimeError("extend_index() requires a completed run() first")
        docs_new, sigs_new, assignments_new = self._last
        known = self._index("ingest").select("doc_id")
        # EAGER checkpoint: fresh reads the very parquet dir the append below
        # writes to — materialize the anti-join fully before touching it
        fresh = docs_new.join(known, "doc_id", "left_anti").localCheckpoint()
        fresh_ids = fresh.select("doc_id")
        fresh.write.mode("append").parquet(os.path.join(self.workdir, "ingest"))
        sigs_new.join(fresh_ids, "doc_id", "left_semi").write.mode("append").parquet(
            os.path.join(self.workdir, "signatures")
        )
        assignments_new.select("doc_id", "cluster_id").join(
            fresh_ids, "doc_id", "left_semi"
        ).write.mode("append").parquet(os.path.join(self.workdir, "cc"))
        for name in os.listdir(self.workdir):
            if name.endswith(".manifest.json"):
                os.remove(os.path.join(self.workdir, name))
        del self._last
