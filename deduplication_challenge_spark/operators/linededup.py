"""Sub-document (line / paragraph) deduplication — the CCNet/RefinedWeb
pattern: a line that appears in many distinct documents is boilerplate
(navigation, cookie banners, license footers) and is removed from the
corpus before model training; document-level dedup never catches it because
the surrounding text differs.

Two modes:
  * ``remove``     — a line seen in >= min_docs distinct docs is deleted
                     from EVERY document (boilerplate removal; CCNet
                     "dedup on paragraphs" semantics);
  * ``keep_first`` — the single occurrence with the smallest (doc_id, pos)
                     survives, every other copy is deleted (sub-document
                     dedup: shared content stays in the corpus exactly
                     once).

Scale shape (the part that matters at 10^12 docs):
  * lines ride ONE posexplode, keyed by ``xxhash64(line)`` so the document
    frequency aggregate and all joins move 8-byte keys, never line text
    (collision odds ~2^-64 per pair — same documented trade as the
    substring pass);
  * the hot-line set is SMALL by construction (each member needs min_docs
    distinct docs behind it, so |hot| <= total_lines / min_docs) and is
    broadcast onto the line stream as a TAG (left join, not a filter) —
    the full line table shuffles exactly once, for the per-document
    rebuild;
  * totals, removal counts, and the rebuild fold into ONE groupBy(doc_id):
    array_sort(collect_list(struct(pos, line, keep))) then filter/concat —
    deterministic order restoration without a window function, and no
    second aggregation or join against a separate totals table.

No silent drops: every output row carries (n_lines, n_removed) and
documents that lose every line still appear (empty text), so corpus-level
removal rates are one aggregation away.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default paragraph separator in extracted page text (functions/textnorm
#: collapses newline runs to at most two, so '\n\n' delimits paragraphs)
DEFAULT_SEP = "\n\n"


def split_lines(docs: DataFrame, sep: str = DEFAULT_SEP) -> DataFrame:
    """(doc_id, text) -> (doc_id, pos, line) with empty segments dropped.

    Reconstruction via ``sep.join`` is canonical, not byte-exact: runs of
    separators collapse (matching textnorm's own newline normalization)."""
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split("text", re.escape(sep))).alias("pos", "line"),
    )
    return lines.where(F.length("line") > 0)


def dedup_lines(
    docs: DataFrame,
    min_docs: int = 2,
    sep: str = DEFAULT_SEP,
    mode: str = "remove",
) -> DataFrame:
    """(doc_id, text) -> (doc_id, text, n_lines, n_removed) with lines that
    appear in >= min_docs DISTINCT documents deduplicated per ``mode``.

    ``n_lines`` counts the document's non-empty lines before dedup;
    ``n_removed`` how many this operator deleted.  Documents whose every
    line is removed come back with ``text = ''`` rather than vanishing.
    """
    if mode not in ("remove", "keep_first"):
        raise ValueError(f"mode must be 'remove' or 'keep_first', got {mode!r}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")

    lines = split_lines(docs, sep).withColumn("h", F.xxhash64("line"))
    lines = lines.localCheckpoint(eager=False)  # feeds the df agg + tag join

    hot = (
        lines.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("h")
    )

    # TAG (broadcast left join), don't filter: totals and rebuild then fold
    # into ONE groupBy(doc_id) — a single wide shuffle for the whole operator
    if mode == "remove":
        tagged = lines.join(
            F.broadcast(hot).withColumn("is_hot", F.lit(True)), "h", "left"
        )
        keep = F.col("is_hot").isNull()
    else:
        # keep_first: per hot line, the occurrence with min (doc_id, pos)
        # survives.  Winners are one row per hot line — broadcast-sized by
        # the same argument as the hot set itself.
        winners = (
            lines.join(F.broadcast(hot), "h", "left_semi")
            .groupBy("h")
            .agg(F.min(F.struct("doc_id", "pos")).alias("w"))
            .select("h", F.col("w.doc_id").alias("w_doc"), F.col("w.pos").alias("w_pos"))
        )
        tagged = lines.join(F.broadcast(winners), "h", "left")
        keep = F.col("w_doc").isNull() | (
            (F.col("doc_id") == F.col("w_doc")) & (F.col("pos") == F.col("w_pos"))
        )

    per_doc = tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "line", keep.alias("keep")))),
                    lambda x: x["keep"],
                ),
                lambda x: x["line"],
            ),
        ).alias("text"),
    )
    # anchor on the INPUT doc ids (assumed unique), not the line table:
    # a doc that is all-empty on input, or loses every line, must still
    # come back (empty text) rather than vanish — this also makes the
    # operator idempotent
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )
