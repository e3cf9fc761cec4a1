"""Deterministic hash-based sampling — the data-mixing primitive of a
training pipeline: select a reproducible fraction of a corpus (optionally a
different fraction per stratum) such that the SAME rows are selected on
every run, on any cluster, at any partitioning, and the rule is expressible
in plain ANSI SQL for cross-engine verification.

Rule: a row is selected iff the first 4 hex chars of md5(key || salt) fall
below floor(fraction * 16^4), compared as fixed-width lowercase hex strings
(lexicographic == numeric for fixed-width hex).  md5 here is a uniform
hash, not a security primitive; 16 bits of threshold resolution means the
realized fraction is within 2^-16 of the request, which is what a mixing
recipe needs.  Changing ``salt`` yields an independent sample (train/val
splits, A/B corpora) without reshuffling anything.

Scale shape: pure row-local projection + filter — zero shuffles, pushes
into whole-stage codegen, and composes with partition pruning (the filter
is a scan-level predicate over a deterministic expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(int(fraction * 0x10000), "04x") if fraction < 1.0 else "ffff0"


def _bucket(key_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 4
    )


def sample_by_hash(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ``fraction``-sample of df keyed on ``key_col``."""
    return df.where(_bucket(key_col, salt) < F.lit(_hex_threshold(fraction)))


def stratified_sample_by_hash(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (different mixing weight per
    source/language/...).  Strata absent from ``fractions`` fall back to
    ``default_fraction`` (0.0 = dropped)."""
    thr = F.lit(_hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_hex_threshold(frac))).otherwise(thr)
    return df.where(_bucket(key_col, salt) < thr)
