"""Rule-based document quality filters for webtext pipelines.

Two public operators, both pure Catalyst expressions (no UDFs, no shuffle —
they are per-row projections that pipeline into whatever scan feeds them):

- :func:`gopher_quality` — the repetition-free subset of the Gopher quality
  rules (Rae et al. 2021, §A1.1): word-count bounds, mean-word-length bounds,
  symbol-to-word ratio, alphabetic-word fraction, and a minimum number of
  distinct stopwords.  (The repetition rules live in
  ``q_doc_repetition_signals`` — this operator deliberately does not repeat
  them.)
- :func:`c4_line_stats` — the line-level C4 cleaning heuristics (Raffel et
  al. 2020, §2.2): a line survives iff it has at least five words and ends
  in terminal punctuation; documents carrying ``{`` (code markers) or the
  phrase ``lorem ipsum`` are flagged; a document passes with >= 3 surviving
  lines and no flags.

Reference parity: the reference engine has no quality filtering at all
(its scope is product-record dedup, /root/reference/src/controller.py) —
these operators extend SURVEY.md §2's "text analysis" axis the same way
quality_scores / doc_repetition_signals / boilerplate_rate do.

Scale shape: both operators are narrow projections — column-pruned scans,
whole-stage-codegen'd expression trees, zero exchanges.  At 100 TB they run
at scan speed and preserve the upstream partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed stopword probe set (Gopher uses "the, be, to, of, and, that, have,
#: with"; we keep a 10-word superset pinned here so the oracle SQL and the
#: Spark plan can never drift).  A hit = a whitespace TOKEN equal to the
#: stopword (case-sensitive) — one array intersect over the already-split
#: tokens, not ten word-boundary regex scans of the full text (the regex
#: formulation cost 10 extra full-text passes per row and dominated the
#: operator's runtime at sf0.1)
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "that", "for", "it")

#: Gopher rule constants (Rae et al. 2021 table A1)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2

#: C4 rule constants (Raffel et al. 2020 §2.2: lines with >= 5 words)
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
#: terminal punctuation a surviving line must end with (C4 uses ., !, ?, ").
#: Checked against the WHITESPACE-STRIPPED line: Java's '$' matches before a
#: trailing \r while RE2's (the oracle's) matches only at end-of-string, so
#: anchoring on the raw line would diverge on CRLF documents.
C4_TERMINAL_RE = '[.!?"]$'
#: strip both ends of a line before the terminal check / kept_chars measure
#: (F.trim strips only ' ', which leaves \r and \t behind)
_EDGE_WS_RE = "^[ \\t\\x0B\\f\\r]+|[ \\t\\x0B\\f\\r]+$"


#: explicit whitespace class instead of \s: Java's \s includes \x0B but
#: RE2's (the DuckDB oracle's engine) does not — the explicit class pins
#: identical token boundaries on both sides (same convention as
#: q_token_stats / q_boilerplate_rate_by_source)
WS_RE = "[ \\t\\n\\x0B\\f\\r]+"


def _words(col: Column) -> Column:
    """Whitespace tokens of ``col`` with empties dropped (leading/trailing
    whitespace would otherwise contribute '' tokens)."""
    return F.filter(F.split(col, WS_RE), lambda w: w != "")


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher quality signals + composite pass flag.

    Input: any frame with ``doc_id`` and ``text_col``; rows with
    empty/whitespace-only text are excluded (no words -> no ratios).
    Output columns (doubles rounded to 4 so a SQL oracle hash-matches):
    ``doc_id, n_words, mean_word_len, alpha_word_frac, symbol_ratio,
    stopword_hits, passes_gopher``.
    """
    t = F.col(text_col)
    # any non-whitespace char (trim strips only spaces, so a tab-only doc
    # would otherwise slip through with n_words = 0 and NULL ratios)
    d = df.where(t.rlike("[^ \\t\\n\\x0B\\f\\r]"))
    w = _words(t)
    n_words = F.size(w).cast("long")
    # sum of token lengths == length of the text with ALL whitespace removed
    mean_word_len = F.length(F.regexp_replace(t, WS_RE, "")) / n_words
    alpha_word_frac = (
        F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]"))) / n_words
    )
    # Gopher counts '#' and ellipsis as symbols; '...' and the one-char
    # form U+2026 both count, longest-match-first so '...' is one symbol
    symbol_ratio = F.regexp_count(t, F.lit(r"#|\.\.\.|…")) / n_words
    stopword_hits = F.size(
        F.array_intersect(F.array_distinct(w), F.array(*[F.lit(s) for s in STOPWORDS]))
    ).cast("long")
    passes = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_word_len.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (symbol_ratio < GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_word_frac > GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stopword_hits >= GOPHER_MIN_STOPWORD_HITS)
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(alpha_word_frac, 4).alias("alpha_word_frac"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        stopword_hits.alias("stopword_hits"),
        passes.cast("int").alias("passes_gopher"),
    )


def c4_line_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document C4 line-filter statistics + composite pass flag.

    A line is KEPT iff it has >= ``C4_MIN_LINE_WORDS`` words and its
    trimmed form ends in terminal punctuation.  Output columns:
    ``doc_id, n_lines, n_kept_lines, kept_chars, has_brace, has_lorem,
    passes_c4``.  ``kept_chars`` measures the whitespace-stripped surviving
    lines — the size of the document after cleaning.
    """
    t = F.col(text_col)
    d = df.where(t.rlike("[^ \\t\\n\\x0B\\f\\r]"))
    lines = F.split(t, "\n")

    def _stripped(ln):
        return F.regexp_replace(ln, _EDGE_WS_RE, "")

    kept = F.filter(
        lines,
        lambda ln: (F.size(_words(ln)) >= C4_MIN_LINE_WORDS)
        & _stripped(ln).rlike(C4_TERMINAL_RE),
    )
    kept_chars = F.aggregate(
        kept, F.lit(0).cast("long"), lambda acc, ln: acc + F.length(_stripped(ln))
    )
    has_brace = t.contains("{")
    has_lorem = F.lower(t).contains("lorem ipsum")
    passes = (
        (F.size(kept) >= C4_MIN_KEPT_LINES) & ~has_brace & ~has_lorem
    )
    return d.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        kept_chars.alias("kept_chars"),
        has_brace.cast("int").alias("has_brace"),
        has_lorem.cast("int").alias("has_lorem"),
        passes.cast("int").alias("passes_c4"),
    )
