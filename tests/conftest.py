"""Shared fixtures: one session-scoped SparkSession, micro corpus, oracle run."""

from __future__ import annotations

import pytest

from deduplication_challenge_spark.config import DedupConfig
from deduplication_challenge_spark.sources.synth import generate_corpus


@pytest.fixture(scope="session")
def spark():
    from deduplication_challenge_spark.session import build_session

    s = build_session("pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg() -> DedupConfig:
    return DedupConfig()


@pytest.fixture(scope="session")
def micro_corpus():
    return generate_corpus(n_docs=60, seed=42)


@pytest.fixture(scope="session")
def micro_oracle(micro_corpus, cfg):
    from deduplication_challenge_spark.oracle import run_oracle

    return run_oracle(micro_corpus.rows, cfg, include_substring=True)
