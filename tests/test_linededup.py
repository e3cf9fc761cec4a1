"""Sub-document (line/paragraph) dedup: pure-Python differential oracle,
planted-boilerplate removal on the synth corpus, and contract edges."""

from __future__ import annotations

import numpy as np
import pytest

from deduplication_challenge_spark.operators.ingest import extract_pages
from deduplication_challenge_spark.operators.linededup import dedup_lines

SEP = "\n\n"


def _py_dedup(docs: dict[int, str], min_docs: int, mode: str) -> dict[int, tuple[str, int, int]]:
    """Reference implementation: doc_id -> (text, n_lines, n_removed)."""
    lines = {
        d: [ln for ln in t.split(SEP) if ln] for d, t in docs.items()
    }
    df: dict[str, set[int]] = {}
    for d, ls in lines.items():
        for ln in set(ls):
            df.setdefault(ln, set()).add(d)
    hot = {ln for ln, ds in df.items() if len(ds) >= min_docs}
    winner: dict[str, tuple[int, int]] = {}
    if mode == "keep_first":
        for d in sorted(lines):
            for pos, ln in enumerate(lines[d]):
                if ln in hot and ln not in winner:
                    winner[ln] = (d, pos)
    out = {}
    for d, ls in lines.items():
        kept = [
            ln
            for pos, ln in enumerate(ls)
            if ln not in hot or (mode == "keep_first" and winner[ln] == (d, pos))
        ]
        out[d] = (SEP.join(kept), len(ls), len(ls) - len(kept))
    return out


def _random_docs(seed: int, n_docs: int = 30) -> dict[int, str]:
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = [f"w{i}" for i in range(12)]
    shared = [
        " ".join(rng.choice(vocab, size=4)) for _ in range(5)
    ]  # candidate boilerplate lines
    docs = {}
    for d in range(n_docs):
        paras = []
        for _ in range(int(rng.integers(1, 6))):
            if rng.random() < 0.4:
                paras.append(shared[int(rng.integers(len(shared)))])
            else:
                paras.append(" ".join(rng.choice(vocab, size=int(rng.integers(3, 7)))))
        docs[d] = SEP.join(paras)
    return docs


@pytest.mark.parametrize("mode", ["remove", "keep_first"])
@pytest.mark.parametrize("seed", [1, 2])
def test_differential_vs_python(spark, mode, seed):
    docs = _random_docs(seed)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in dedup_lines(df, min_docs=3, mode=mode).collect()
    }
    assert got == _py_dedup(docs, 3, mode)


def test_boilerplate_paragraph_removed_from_synth_corpus(spark, micro_corpus):
    """The synth corpus plants ONE boilerplate paragraph in ~25% of docs —
    document-level dedup can't touch it (surrounding text differs), line
    dedup removes every copy (mode=remove) or all but one (keep_first)."""
    pages = spark.createDataFrame(micro_corpus.rows)
    docs = extract_pages(pages).select("doc_id", "text")
    boiler = micro_corpus.boilerplate
    n_with = docs.where(docs.text.contains(boiler)).count()
    assert n_with >= 3  # planted in a meaningful fraction

    out = dedup_lines(docs, min_docs=2, mode="remove")
    assert out.where(out.text.contains(boiler)).count() == 0
    assert out.count() == docs.count()  # lossless row-wise
    # removal is counted, never silent
    assert out.agg({"n_removed": "sum"}).first()[0] >= n_with

    kept_once = dedup_lines(docs, min_docs=2, mode="keep_first")
    assert kept_once.where(kept_once.text.contains(boiler)).count() == 1


def test_fully_removed_doc_survives_with_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "same line"), (2, "same line"), (3, "same line" + SEP + "unique bit")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=2).collect()}
    assert out[1]["text"] == "" and out[1]["n_removed"] == 1
    assert out[2]["text"] == ""
    assert out[3]["text"] == "unique bit"


def test_idempotent(spark):
    docs = _random_docs(7)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    once = dedup_lines(df, min_docs=2).select("doc_id", "text")
    twice = dedup_lines(once, min_docs=2).select("doc_id", "text")
    assert sorted(once.collect()) == sorted(twice.collect())


def test_within_doc_repeats_are_not_cross_doc_boilerplate(spark):
    """df counts DISTINCT docs: a line repeated 5x inside one doc is not
    hot, so within-doc structure is preserved by the cross-doc operator."""
    df = spark.createDataFrame(
        [(1, SEP.join(["echo echo"] * 5)), (2, "something else")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=2).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["n_lines"] == 5


def test_validation():
    with pytest.raises(ValueError):
        dedup_lines(None, mode="bogus")
    with pytest.raises(ValueError):
        dedup_lines(None, min_docs=1)
