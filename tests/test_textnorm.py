"""Extraction / normalization policy unit tests (FIXTURES.md §4 adversarial
cases). Mirrors the reference's normalization unit tests
(/root/reference/src/tests/test_units.py TestHelperMethods layer)."""

from deduplication_challenge_spark.functions.textnorm import (
    extract_text,
    normalize_text,
    shingles,
    tokenize,
)


class TestExtractText:
    def test_strips_script_style_comments(self):
        html = b"<html><script>var x=1;</script><style>p{}</style><!-- c --><body><p>keep</p></body></html>"
        assert extract_text(html) == "keep"

    def test_block_tags_become_newlines(self):
        html = b"<body><p>one</p><p>two</p></body>"
        assert extract_text(html) == "one\n\ntwo"

    def test_inline_tags_become_spaces(self):
        html = b"<body><p>a<b>b</b>c</p></body>"
        assert extract_text(html) == "a b c"

    def test_entities_decoded(self):
        assert extract_text(b"<p>a&amp;b &lt;x&gt; caf&eacute;</p>") == "a&b <x> café"

    def test_crlf_and_nbsp_folded(self):
        assert extract_text("<p>a\r\nb\xc2\xa0c</p>".encode("latin-1")) == "a\nb c"

    def test_invalid_utf8_is_total(self):
        # never raises; replacement char is deterministic
        out = extract_text(b"<p>ok \xff\xfe broken</p>")
        assert "ok" in out and "broken" in out

    def test_empty_and_none(self):
        assert extract_text(b"") == ""
        assert extract_text(None) == ""
        assert extract_text(b"<html><body></body></html>") == ""

    def test_idempotent_normalization(self):
        html = b"<body><p>Hello   World</p><p></p><p>x</p></body>"
        t = extract_text(html)
        assert normalize_text(t) == t

    def test_case_sensitivity_of_tags(self):
        assert extract_text(b"<P>a</P><SCRIPT>x</SCRIPT>") == "a"

    def test_zero_width_removed(self):
        assert extract_text("<p>a​b﻿c</p>".encode()) == "abc"


class TestTokensAndShingles:
    def test_tokenize_lowercases(self):
        assert tokenize("Hello  WORLD\nfoo") == ["hello", "world", "foo"]

    def test_shingles_k3(self):
        assert shingles("a b c d", 3) == ["a\x1fb\x1fc", "b\x1fc\x1fd"]

    def test_short_doc_single_shingle(self):
        assert shingles("a b", 3) == ["a\x1fb"]

    def test_empty_doc_no_shingles(self):
        assert shingles("", 3) == []
        assert shingles("   ", 3) == []
