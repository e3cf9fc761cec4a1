"""Deterministic synthetic Common-Crawl-style corpus with planted duplicates.

Generates the exact north-rule input shape
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(BASELINE.json input_hint) plus a golden ``(url, cluster_id)`` assignment
table, entirely from a seeded RNG — no external data, no wall clock
(FIXTURES.md §1).

Planted structure (each group's ground-truth cluster id recorded):
  * exact duplicates        — identical text, different url/warc_ts
                              (analog of exact product_identifier groups,
                              /root/reference/src/main.py:85-89)
  * near duplicates         — seeded token edits at controlled rates
                              straddling the Jaccard threshold
  * substring duplicates    — one doc embedded verbatim in a longer doc
  * hot-bucket boilerplate  — one paragraph shared by a large doc fraction
                              (LSH skew exercise)
  * singletons              — majority; must pass through untouched
                              (/root/reference/src/main.py:94-95)

``text`` is defined as ``extract_text(html)`` — the byte-identical
extraction invariant holds by construction.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import numpy as np

from deduplication_challenge_spark.functions.textnorm import extract_text

_EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)
_LANGS = ["en", "de", "fr", "ro", "es"]

# Small deterministic vocabulary; words are synthetic but pronounceable so
# fixtures are hand-readable at micro scale.
_CONS = "bcdfghklmnprstvz"
_VOWS = "aeiou"


def _build_vocab(rng: np.random.Generator, size: int) -> list[str]:
    vocab = set()
    while len(vocab) < size:
        n_syll = int(rng.integers(2, 4))
        w = "".join(
            _CONS[int(rng.integers(len(_CONS)))] + _VOWS[int(rng.integers(len(_VOWS)))]
            for _ in range(n_syll)
        )
        vocab.add(w)
    return sorted(vocab)


@dataclass
class SynthCorpus:
    rows: list[dict] = field(default_factory=list)      # pages rows
    golden: list[dict] = field(default_factory=list)    # (url, cluster_id)
    boilerplate: str = ""


def _paragraphs_to_html(title: str, paragraphs: list[list[str]]) -> bytes:
    body = "".join(f"<p>{' '.join(p)}</p>" for p in paragraphs)
    page = (
        f"<html><head><title>{title}</title>"
        f"<script>var t={{}};</script><style>p{{margin:0}}</style></head>"
        f"<body><div class=\"nav\">{body}</div>"
        f"<!-- crawler: synthetic fixture --></body></html>"
    )
    return page.encode("utf-8")


def _edit_tokens(
    rng: np.random.Generator, paragraphs: list[list[str]], vocab: list[str], rate: float
) -> list[list[str]]:
    """Apply seeded token-level edits (replace/drop/insert) at ~`rate`."""
    out = []
    for para in paragraphs:
        new: list[str] = []
        for tok in para:
            r = rng.random()
            if r < rate / 3:
                new.append(vocab[int(rng.integers(len(vocab)))])  # replace
            elif r < 2 * rate / 3:
                continue  # drop
            elif r < rate:
                new.append(tok)
                new.append(vocab[int(rng.integers(len(vocab)))])  # insert
            else:
                new.append(tok)
        if new:
            out.append(new)
    return out or [["empty"]]


def generate_corpus(
    n_docs: int = 3000,
    seed: int = 42,
    dup_fraction: float = 0.30,
    near_dup_edit_rate: float = 0.04,
    boilerplate_fraction: float = 0.25,
) -> SynthCorpus:
    """Build the corpus. ~``dup_fraction`` of docs belong to planted
    duplicate groups (exact / near / substring, round-robin); the rest are
    singletons. ``boilerplate_fraction`` of ALL docs additionally share one
    boilerplate paragraph (hot LSH bucket).

    NOTE (pinned behavior): the boilerplate draw is per MEMBER, so members
    of a planted exact/near group may differ by the boilerplate paragraph —
    "exact" groups are exact up to boilerplate.  Planted-recall gates
    therefore verify the LSH+SimHash+substring paths JOINTLY (a
    boilerplate-divergent small doc can fall below the Jaccard threshold
    and be recovered by the substring pass); this is deliberate — it is
    also what real crawl data looks like — and the corpus recipe cannot
    change without invalidating every pinned canonical count."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = _build_vocab(rng, 4000)
    corpus = SynthCorpus()
    boiler = [vocab[int(rng.integers(len(vocab)))] for _ in range(40)]
    corpus.boilerplate = " ".join(boiler)

    n_dup_docs = int(n_docs * dup_fraction)
    row_idx = 0
    cluster_idx = 0

    def base_doc() -> tuple[str, list[list[str]]]:
        title = " ".join(
            vocab[int(rng.integers(len(vocab)))] for _ in range(int(rng.integers(2, 5)))
        )
        n_para = int(rng.integers(3, 8))
        paragraphs = [
            [vocab[int(rng.integers(len(vocab)))] for _ in range(int(rng.integers(25, 70)))]
            for _ in range(n_para)
        ]
        return title, paragraphs

    def emit(title: str, paragraphs: list[list[str]], cluster_id: int) -> None:
        nonlocal row_idx
        if rng.random() < boilerplate_fraction:
            paragraphs = paragraphs + [boiler]
        html = _paragraphs_to_html(title, paragraphs)
        site = int(rng.integers(0, max(2, n_docs // 50)))
        url = f"https://site{site:03d}.example/p/{row_idx:07d}"
        corpus.rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + dt.timedelta(seconds=row_idx * 37 % 31_000_000),
                "html": html,
                "text": extract_text(html),
                "lang": _LANGS[int(rng.integers(len(_LANGS)))],
            }
        )
        corpus.golden.append({"url": url, "cluster_id": cluster_id})
        row_idx += 1

    # --- planted duplicate groups ---------------------------------------
    docs_emitted = 0
    kind_cycle = 0
    while docs_emitted < n_dup_docs:
        group_size = int(rng.integers(2, 5))
        title, paragraphs = base_doc()
        cid = cluster_idx
        cluster_idx += 1
        kind = kind_cycle % 3
        kind_cycle += 1
        if kind == 0:  # exact duplicates
            for _ in range(group_size):
                emit(title, paragraphs, cid)
        elif kind == 1:  # near duplicates
            emit(title, paragraphs, cid)
            for _ in range(group_size - 1):
                emit(title, _edit_tokens(rng, paragraphs, vocab, near_dup_edit_rate), cid)
        else:  # substring duplicates: short doc embedded in longer doc
            emit(title, paragraphs, cid)
            for _ in range(group_size - 1):
                extra = [
                    [vocab[int(rng.integers(len(vocab)))] for _ in range(30)]
                ]
                emit(title, extra + paragraphs + extra, cid)
        docs_emitted += group_size

    # --- singletons -------------------------------------------------------
    while row_idx < n_docs:
        title, paragraphs = base_doc()
        emit(title, paragraphs, cluster_idx)
        cluster_idx += 1

    return corpus


def corpus_to_spark(spark, corpus: SynthCorpus):
    """Materialize as Spark DataFrames (pages, golden)."""
    from pyspark.sql import types as T

    pages_schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    golden_schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("cluster_id", T.LongType(), False),
        ]
    )
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in corpus.rows],
        schema=pages_schema,
    )
    golden = spark.createDataFrame(
        [(g["url"], g["cluster_id"]) for g in corpus.golden], schema=golden_schema
    )
    return pages, golden
