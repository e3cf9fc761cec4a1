"""Extraction / normalization policy unit tests (FIXTURES.md §4 adversarial
cases). Mirrors the reference's normalization unit tests
(/root/reference/src/tests/test_units.py TestHelperMethods layer)."""

from deduplication_challenge_spark.functions.textnorm import (
    extract_text,
    normalize_text,
    resolve_charset,
    shingles,
    sniff_charset,
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


class TestCharsetHandling:
    """Charset precedence: BOM > transport hint > <meta charset> > utf-8.
    Non-utf-8 crawl pages must decode to real text, not deterministic
    mojibake (the round-3 verdict's top gap)."""

    def test_transport_hint_latin1(self):
        html = "<p>café exposé</p>".encode("latin-1")
        assert extract_text(html, "ISO-8859-1") == "café exposé"
        # same bytes without the hint mis-decode (documented utf-8 fallback)
        assert extract_text(html) != "café exposé"

    def test_meta_charset_windows1252(self):
        html = "<html><meta charset=windows-1252><p>smart “quotes” – dash</p></html>".encode("cp1252")
        assert sniff_charset(html) == "cp1252"
        assert extract_text(html) == "smart “quotes” – dash"

    def test_meta_http_equiv_variant(self):
        html = (
            b'<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">'
            + "<p>naïve</p>".encode("latin-1")
        )
        assert extract_text(html) == "naïve"

    def test_utf16_bom_wins_over_wrong_hint(self):
        html = "<p>日本語のページ</p>".encode("utf-16")  # BOM'd
        assert resolve_charset(html, "latin-1").startswith("utf-16")
        assert extract_text(html, "latin-1") == "日本語のページ"

    def test_hint_beats_meta(self):
        # server says latin-1; the (stale) meta tag says utf-8 — transport wins
        html = "<meta charset=utf-8><p>résumé</p>".encode("latin-1")
        assert extract_text(html, "iso-8859-1") == "résumé"

    def test_unknown_charset_falls_back_utf8(self):
        assert extract_text(b"<meta charset=klingon-9><p>ok</p>") == "ok"
        assert extract_text(b"<p>ok</p>", "not-a-codec") == "ok"

    def test_utf8_sig_bom_stripped(self):
        assert extract_text("<p>bom</p>".encode("utf-8-sig")) == "bom"

    def test_no_signal_unchanged_vs_round3_policy(self):
        # pages with no charset signal decode exactly as before (utf-8 /
        # replace) — the extraction invariant over existing corpora holds
        assert extract_text("<p>héllo wörld</p>".encode()) == "héllo wörld"
        out = extract_text(b"<p>ok \xff broken</p>")
        assert "ok" in out and "broken" in out

    def test_shift_jis_via_hint(self):
        html = "<p>日本語テスト</p>".encode("shift-jis")
        assert extract_text(html, "Shift_JIS") == "日本語テスト"

    def test_non_text_codecs_rejected_total_function(self):
        """Review finding: Python registers bytes-to-bytes codecs (zlib,
        base64, hex...) that codecs.lookup accepts but bytes.decode raises
        on even with errors='replace' — a page declaring one must fall back
        to utf-8, never crash the extraction UDF (total-function contract)."""
        for bad in ("zlib", "base64", "hex", "bz2", "rot13"):
            assert extract_text(f'<meta charset="{bad}"><p>ok</p>'.encode()) == "ok"
            assert extract_text(b"<p>ok</p>", bad) == "ok"

    def test_charset_inside_unrelated_attribute_ignored(self):
        """Review finding: 'charset=' inside an unrelated attribute VALUE
        (e.g. a description mentioning charsets) must not hijack decoding."""
        html = ('<meta name="description" content="how to set charset=big5 in html">'
                "<p>héllo wörld</p>").encode()
        assert sniff_charset(html) is None
        assert extract_text(html) == "héllo wörld"
        # ...but the real http-equiv content declaration still counts
        he = (b'<meta http-equiv="Content-Type" content="text/html; charset=latin-1">'
              + "<p>naïve</p>".encode("latin-1"))
        assert extract_text(he) == "naïve"

    def test_meta_scan_window_is_bounded(self):
        # a meta tag past the 1 KiB prescan window is ignored (WHATWG rule)
        pad = b"<!-- " + b"x" * 1100 + b" -->"
        html = pad + b"<meta charset=latin-1><p>ok</p>"
        assert sniff_charset(html) is None
        assert extract_text(html) == "ok"


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
