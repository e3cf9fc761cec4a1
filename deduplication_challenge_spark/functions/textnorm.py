"""Deterministic HTML -> text extraction and text normalization.

The north-rule input is ``(url, warc_ts, html, text, lang)`` where ``text``
must be byte-identical to what our extraction produces from ``html`` for the
same ``url`` (BASELINE.json input_hint). This module is the single source of
truth: the executor-side pandas UDF (operators/extract in plans/pipeline.py)
and the pytest oracle both call :func:`extract_text` — same bytes by
construction.

Scope: a deterministic, dependency-free extractor (regex tag stripping +
entity decoding + whitespace policy), NOT a full HTML5 parser — real crawls
would swap in a proper extractor behind the same signature; everything
downstream (shingles, signatures, clustering) only assumes "deterministic
string per input bytes".

Reference counterpart: the reference's normalization layer
(/root/reference/src/controller.py:28-58) canonicalizes cells so they are
hashable; here canonicalization is the text policy below (NFC, newline fold,
whitespace collapse).
"""

from __future__ import annotations

import html as _htmllib
import re
import unicodedata

# Tags whose content is never text.
_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
# Block-level tags become newlines so words from different blocks don't fuse.
_BLOCK_TAG_RE = re.compile(
    rb"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header|"
    rb"footer|blockquote|pre|hr|title|body|html|head)\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RUN_RE = re.compile(r"[ \t\f\v]+")
_NL_RUN_RE = re.compile(r"\n{2,}")

_TOKEN_RE = re.compile(r"\S+")


def decode_html_bytes(data: bytes) -> str:
    """utf-8 decode with replacement — deterministic for any byte input."""
    return data.decode("utf-8", errors="replace")


def extract_text(html_bytes: bytes) -> str:
    """Deterministic text extraction. bytes -> str, total function.

    Policy (pinned — part of the golden config):
      1. strip script/style/noscript bodies and comments (bytes level),
      2. block tags -> ``\\n``, all other tags -> ``" "``,
      3. utf-8 decode (errors=replace), HTML entity unescape,
      4. unicode NFC normalization, ``\\r\\n``/``\\r`` -> ``\\n``,
         NBSP/zero-width chars folded,
      5. collapse horizontal whitespace runs, strip line edges,
         collapse blank-line runs, strip outer whitespace.
    """
    if html_bytes is None:
        return ""
    raw = _SCRIPT_STYLE_RE.sub(b" ", html_bytes)
    raw = _COMMENT_RE.sub(b" ", raw)
    raw = _BLOCK_TAG_RE.sub(b"\n", raw)
    raw = _ANY_TAG_RE.sub(b" ", raw)
    text = decode_html_bytes(raw)
    text = _htmllib.unescape(text)
    return normalize_text(text)


def normalize_text(text: str) -> str:
    """Steps 4-5 of the policy; also applied to already-extracted text."""
    text = unicodedata.normalize("NFC", text)
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    for ch, repl in (("\u00a0", " "), ("\u200b", ""), ("\u200c", ""),
                     ("\u200d", ""), ("\ufeff", "")):
        text = text.replace(ch, repl)
    lines = [_WS_RUN_RE.sub(" ", ln).strip() for ln in text.split("\n")]
    text = "\n".join(lines)
    text = _NL_RUN_RE.sub("\n\n", text)
    return text.strip()


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization, lowercased — the shingle alphabet.

    Pinned: signatures are case-insensitive; near-dup detection should not
    split clusters on casing. (Analogous canonicalization spirit to
    /root/reference/src/controller.py:56-58 joining identifier parts.)
    """
    return _TOKEN_RE.findall(text.lower())


def shingles(text: str, k: int) -> list[str]:
    """Word k-shingles as ``\\x1f``-joined token strings (k from config)."""
    toks = tokenize(text)
    if len(toks) < k:
        # degenerate short doc: single shingle of all tokens (may be empty)
        return ["\x1f".join(toks)] if toks else []
    return ["\x1f".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
