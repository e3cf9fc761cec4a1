"""Rule-based quality filters (operators/quality.py): Gopher composite
rules and C4 line-level cleaning, pinned against hand-computed expectations
on multi-line fixtures (the driver's documents table is single-line, so
these fixtures are where the line-level behavior is actually exercised)."""

from __future__ import annotations

import pytest

from deduplication_challenge_spark.operators.quality import (
    C4_MIN_KEPT_LINES,
    GOPHER_MIN_WORDS,
    c4_line_stats,
    gopher_quality,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopherQuality:
    def test_word_count_and_mean_len(self, spark):
        # 4 words, 16 non-space chars -> mean 4.0
        out = gopher_quality(_df(spark, [(1, "aaaa bbbb cccc dddd")])).collect()[0]
        assert out["n_words"] == 4
        assert out["mean_word_len"] == 4.0
        assert out["alpha_word_frac"] == 1.0
        assert out["symbol_ratio"] == 0.0
        # short doc: fails the n_words >= 50 rule regardless of the rest
        assert out["passes_gopher"] == 0

    def test_passes_on_good_doc(self, spark):
        words = ["the", "and", "word"] * 20  # 60 words, all alpha, 2 stopwords
        out = gopher_quality(_df(spark, [(1, " ".join(words))])).collect()[0]
        assert out["n_words"] == 60
        assert out["stopword_hits"] == 2
        assert out["passes_gopher"] == 1

    def test_symbol_ratio_counts_ellipsis_once(self, spark):
        # '...' is ONE symbol (longest-match-first), '#' is one, U+2026 is one
        text = " ".join(["word"] * 7) + " ... # …"
        out = gopher_quality(_df(spark, [(1, text)])).collect()[0]
        assert out["n_words"] == 10
        assert out["symbol_ratio"] == pytest.approx(3 / 10, abs=1e-4)

    def test_stopwords_are_whole_tokens(self, spark):
        # 'theory' must not count as 'the'; 'it' inside 'item' must not
        # count; a hit is a whole whitespace token, so punctuation-glued
        # 'the,' does not count either (token-equality semantics, matching
        # the list_intersect oracle); repeats count once
        rows = gopher_quality(
            _df(spark, [(1, "theory items margin"),
                        (2, "the, and. margin"),
                        (3, "the the the and")])
        ).collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[1]["stopword_hits"] == 0
        assert by_id[2]["stopword_hits"] == 0
        assert by_id[3]["stopword_hits"] == 2  # distinct stopwords, not occurrences

    def test_alpha_word_frac(self, spark):
        out = gopher_quality(_df(spark, [(1, "abc 123 a1 456")])).collect()[0]
        assert out["alpha_word_frac"] == pytest.approx(0.5, abs=1e-4)

    def test_non_alpha_heavy_doc_fails(self, spark):
        nums = " ".join(str(i) for i in range(GOPHER_MIN_WORDS + 10))
        out = gopher_quality(_df(spark, [(1, nums)])).collect()[0]
        assert out["passes_gopher"] == 0  # alpha_word_frac == 0

    def test_empty_and_whitespace_docs_excluded(self, spark):
        """Tab/newline-only docs are excluded too (a trim()-based filter
        strips only spaces and would let them through with n_words = 0)."""
        rows = [(1, ""), (2, "   "), (3, "\t\t"), (4, " \n \r "), (5, "ok words")]
        assert gopher_quality(_df(spark, rows)).count() == 1


class TestC4LineStats:
    def test_line_survival_rules(self, spark):
        text = "\n".join(
            [
                "This line has enough words.",      # kept (5 words)
                "Too short.",                       # < 5 words
                "no terminal punctuation in here",  # no [.!?"]
                "Does a question survive too?",     # kept
                'He said "we must stop".',          # kept (ends with .)
            ]
        )
        out = c4_line_stats(_df(spark, [(1, text)])).collect()[0]
        assert out["n_lines"] == 5
        assert out["n_kept_lines"] == 3
        assert out["kept_chars"] == sum(
            len(s) for s in ["This line has enough words.",
                             "Does a question survive too?",
                             'He said "we must stop".']
        )
        assert out["has_brace"] == 0 and out["has_lorem"] == 0
        assert out["passes_c4"] == 1  # 3 kept >= C4_MIN_KEPT_LINES

    def test_crlf_lines_match_unix_lines(self, spark):
        """CRLF documents: the terminal-punctuation anchor runs on the
        whitespace-STRIPPED line (Java's '$' matches before a trailing \\r,
        RE2's does not — the stripped form pins both engines to the same
        answer), and kept_chars never counts the '\\r'."""
        unix = "\n".join(["Good line one ends right here."] * 3)
        crlf = "\r\n".join(["Good line one ends right here."] * 3)
        rows = c4_line_stats(_df(spark, [(1, unix), (2, crlf)])).collect()
        by_id = {r["doc_id"]: r for r in rows}
        for col in ("n_lines", "n_kept_lines", "kept_chars", "passes_c4"):
            assert by_id[1][col] == by_id[2][col], col
        assert by_id[2]["kept_chars"] == 3 * len("Good line one ends right here.")

    def test_brace_and_lorem_flags_block_pass(self, spark):
        good = "\n".join(["One good line right here."] * C4_MIN_KEPT_LINES)
        out = c4_line_stats(
            _df(spark, [(1, good + "\nfunction f() { return; }"),
                        (2, good + "\nLorem Ipsum dolor sit amet."),
                        (3, good)])
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["has_brace"] == 1 and by_id[1]["passes_c4"] == 0
        assert by_id[2]["has_lorem"] == 1 and by_id[2]["passes_c4"] == 0
        assert by_id[3]["passes_c4"] == 1

    def test_too_few_kept_lines_fails(self, spark):
        out = c4_line_stats(
            _df(spark, [(1, "Only two good lines here.\nAnd this is the other.")])
        ).collect()[0]
        assert out["n_kept_lines"] == 2
        assert out["passes_c4"] == 0

    def test_kept_chars_zero_when_nothing_survives(self, spark):
        out = c4_line_stats(_df(spark, [(1, "nope\nstill nope")])).collect()[0]
        assert out["n_kept_lines"] == 0
        assert out["kept_chars"] == 0

    def test_trailing_whitespace_line_still_kept(self, spark):
        # the terminal-punctuation check runs on the TRIMMED line
        out = c4_line_stats(_df(spark, [(1, "A full sentence ends here.   ")])).collect()[0]
        assert out["n_kept_lines"] == 1
        assert out["kept_chars"] == len("A full sentence ends here.")

    def test_indented_crlf_line_kept(self, spark):
        """BOTH edge runs must be stripped — a line with leading spaces AND
        a trailing \\r regressed the oracle when its regexp_replace lacked
        the 'g' option (first-match-only), so this shape is pinned."""
        out = c4_line_stats(
            _df(spark, [(1, "  Hello world it is good.\r\n  Another good line sits here.\r")])
        ).collect()[0]
        assert out["n_kept_lines"] == 2
        assert out["kept_chars"] == len("Hello world it is good.") + len(
            "Another good line sits here."
        )


class TestPlanShape:
    def test_no_exchange_in_plans(self, spark):
        """Both operators are pure projections — any Exchange in the plan
        means a regression broke the scan-speed contract."""
        df = _df(spark, [(1, "a b c.")])
        for op in (gopher_quality, c4_line_stats):
            plan = op(df)._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
