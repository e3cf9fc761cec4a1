"""PII redaction — the scrubbing pass a web-crawl curation pipeline runs
before training (emails / IP addresses / phone-like numbers replaced with
stable placeholder tokens, occurrences counted per document).  Placeholder
style follows the common "|||TYPE|||" convention so downstream tokenizers
see one rare token instead of the raw identifier.

Scale shape: pure row-local regexp projection — zero shuffles, stays in
whole-stage codegen, composes with column pruning.  Counts come from
regexp_extract_all BEFORE replacement so redaction is never silent.

The email and IPv4 patterns are deliberately dialect-portable (verified
byte-identical behavior between Spark's Java regex and DuckDB's RE2 in the
driver oracle); the phone pattern is looser and intentionally conservative
— digit runs with separators, 9+ digits — because false positives only
cost a placeholder while false negatives leak PII.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pattern registry: kind -> (regex, placeholder).  Order matters: emails
#: are redacted before phones so the digits of "user123@..." never half-match.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "|||EMAIL|||"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "|||IP|||"),
    "phone": (r"\+?\d[\d\s().-]{7,}\d", "|||PHONE|||"),
}


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Replace PII matches in ``text_col`` with placeholders and append one
    ``n_<kind>`` count column per requested kind.  All other columns pass
    through untouched."""
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    # null text normalizes to '' up front: regexp_extract_all(NULL) is NULL
    # and size(NULL) is -1, which would silently skew count aggregations
    out = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    redacted = F.col(text_col)
    for kind in kinds:
        pat, token = PII_PATTERNS[kind]
        # count on the CURRENT text (post-earlier-redactions) so overlapping
        # kinds never double-count the same span
        out = out.withColumn(f"n_{kind}", F.size(F.regexp_extract_all(redacted, F.lit(pat), F.lit(0))))
        redacted = F.regexp_replace(redacted, pat, token)
        out = out.withColumn(text_col, redacted)
        redacted = F.col(text_col)
    return out
