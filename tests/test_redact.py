"""PII redaction operator: planted identifiers, counting semantics, chained
kinds, and passthrough guarantees — plus a hypothesis fuzz of the text
extraction kernel's normalization invariants (pure Python, no Spark)."""

from __future__ import annotations

import re
import unicodedata

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deduplication_challenge_spark.operators.redact import PII_PATTERNS, redact_pii


class TestRedactPII:
    def test_planted_pii_redacted_and_counted(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail a@b.org and c.d+tag@e.co.uk twice", "s0"),
                (2, "server at 192.168.0.1 and 10.0.0.255", "s0"),
                (3, "call +1 (415) 555-0100 maybe", "s1"),
                (4, "nothing sensitive here", "s1"),
            ],
            "doc_id long, text string, source string",
        )
        out = {r["doc_id"]: r for r in redact_pii(df).collect()}
        assert out[1]["n_email"] == 2 and out[1]["text"].count("|||EMAIL|||") == 2
        assert "a@b.org" not in out[1]["text"]
        assert out[2]["n_ipv4"] == 2 and out[2]["text"].count("|||IP|||") == 2
        assert out[3]["n_phone"] == 1 and "|||PHONE|||" in out[3]["text"]
        assert out[4]["text"] == "nothing sensitive here"
        assert out[4]["n_email"] == out[4]["n_ipv4"] == out[4]["n_phone"] == 0
        # passthrough columns survive
        assert out[1]["source"] == "s0"

    def test_email_digits_not_double_counted_as_phone(self, spark):
        df = spark.createDataFrame(
            [(1, "user1234567890@example.com wrote")], "doc_id long, text string"
        )
        out = redact_pii(df).collect()[0]
        assert out["n_email"] == 1
        assert out["n_phone"] == 0  # email redacted before phone pass

    def test_unknown_kind_rejected(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            redact_pii(df, kinds=("email", "ssn"))

    def test_patterns_registry_is_total(self):
        for kind, (pat, token) in PII_PATTERNS.items():
            re.compile(pat)  # every pattern is a valid regex
            assert token.startswith("|||") and token.endswith("|||")


# --- hypothesis fuzz: extraction/normalization invariants -------------------

_html_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    max_size=200,
)


class TestExtractionFuzz:
    @settings(max_examples=200, deadline=None)
    @given(_html_text, st.sampled_from(["p", "div", "span", "b", "li"]))
    def test_normalization_invariants(self, body, tag):
        """For ANY utf-8 payload wrapped in ANY tag, the extracted text obeys
        the pinned policy: no carriage returns, no 3+ newline runs, no
        horizontal-whitespace runs, stripped line edges, NFC-normalized,
        and extraction is idempotent under re-normalization."""
        from deduplication_challenge_spark.functions.textnorm import (
            extract_text,
            normalize_text,
        )

        html = f"<html><body><{tag}>{body}</{tag}><p>tail</p></body></html>".encode(
            "utf-8", errors="replace"
        )
        out = extract_text(html)
        assert "\r" not in out
        assert "\n\n\n" not in out
        for ln in out.split("\n"):
            assert ln == ln.strip()
            assert "  " not in ln and "\t" not in ln
        assert out == out.strip()
        assert unicodedata.is_normalized("NFC", out)
        assert normalize_text(out) == out  # idempotent fixpoint

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=300))
    def test_total_on_arbitrary_bytes(self, payload):
        """extract_text is a TOTAL function: arbitrary (even invalid-utf8)
        bytes never raise and still satisfy the normalization contract."""
        from deduplication_challenge_spark.functions.textnorm import extract_text

        out = extract_text(payload)
        assert isinstance(out, str)
        assert "\r" not in out and "\n\n\n" not in out
