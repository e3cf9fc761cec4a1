"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic
feature contract (decode itself is stubbed — FIXTURES/multimodal note)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplication_challenge_spark.operators.multimodal import (
    ASSET_SCHEMA,
    decode_and_featurize,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", bytes(range(256)) * 4, ("png", 16, 16, None)),
        (2, "image", b"\x00" * 1024, ("png", 32, 32, None)),
        (3, "image", None, ("png", None, None, None)),
        (4, "audio", b"\x01\x02\x03\x04" * 100, ("wav", None, None, 2000)),
        (5, "video", b"\xff" * 2048, ("mp4", 640, 480, 3500)),
        (6, "video", b"", ("mp4", 640, 480, 0)),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


class TestDecodeFeaturize:
    def test_schema_and_rowcount(self, spark, assets):
        out = decode_and_featurize(assets)
        rows = out.collect()
        assert len(rows) == 6
        assert out.columns == ["asset_id", "kind", "ok", "n_bytes", "byte_entropy", "features"]

    def test_feature_contract(self, spark, assets):
        rows = {r["asset_id"]: r for r in decode_and_featurize(assets, feature_dim=16).collect()}
        # fixed width, float32-valued, normalized histogram sums to ~1
        for aid in (1, 2, 4, 5):
            feats = rows[aid]["features"]
            assert len(feats) == 16
            assert abs(sum(feats) - 1.0) < 1e-5
        # uniform byte stream -> max entropy 8 bits, constant stream -> 0
        assert abs(rows[1]["byte_entropy"] - 8.0) < 1e-9
        assert rows[2]["byte_entropy"] == 0.0

    def test_null_payload_is_total(self, spark, assets):
        rows = {r["asset_id"]: r for r in decode_and_featurize(assets).collect()}
        assert rows[3]["ok"] is False
        assert rows[3]["n_bytes"] == 0
        assert len(rows[3]["features"]) == 16

    def test_deterministic(self, spark, assets):
        a = sorted(map(str, decode_and_featurize(assets).collect()))
        b = sorted(map(str, decode_and_featurize(assets.repartition(5)).collect()))
        assert a == b


class TestFrameSamplePlan:
    def test_expansion_math(self, spark, assets):
        plan = frame_sample_plan(assets, every_ms=1000).collect()
        by_asset = {}
        for r in plan:
            by_asset.setdefault(r["asset_id"], []).append(r["frame_ts_ms"])
        # 3500ms @1000ms -> frames at 0,1000,2000,3000
        assert sorted(by_asset[5]) == [0, 1000, 2000, 3000]
        # duration 0 -> single frame at 0 (pinned degenerate behavior)
        assert by_asset[6] == [0]
        # non-video assets excluded
        assert set(by_asset) == {5, 6}
