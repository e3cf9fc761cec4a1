"""Vendored JPEG codec (ITU-T T.81, baseline + progressive): roundtrip
ERROR BOUNDS (JPEG is lossy by construction — the byte-exact pins stay
with PNG/BMP), progressive-vs-baseline exact-pixel differential, probe
semantics, subsampling/restart decode paths, rejection of arithmetic
coding, and the multimodal opaque-fallback integration."""

from __future__ import annotations

import numpy as np
import pytest

from deduplication_challenge_spark.functions.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    probe_jpeg,
)

H, W = 37, 53


def _gradient_rgb() -> np.ndarray:
    yy, xx = np.mgrid[0:H, 0:W]
    return np.stack(
        [(xx * 255 / W), (yy * 255 / H), ((xx + yy) * 255 / (H + W))], axis=2
    ).astype(np.uint8)


class TestRoundtrip:
    def test_rgb_quality_error_bounds(self):
        """Deterministic error bounds per quality on a smooth gradient —
        the lossy analog of decode(encode(x)) == x."""
        img = _gradient_rgb()
        for q, bound in [(100, 2), (95, 3), (75, 8)]:
            out = decode_jpeg(encode_jpeg(img, quality=q))
            assert out.shape == img.shape
            err = np.abs(out.astype(int) - img.astype(int)).max()
            assert err <= bound, (q, err)

    def test_grayscale_near_lossless_at_q100(self):
        rng = np.random.Generator(np.random.PCG64(3))
        g = rng.integers(0, 256, (24, 31)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=100))
        assert out.shape == (24, 31, 1)
        assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 1

    def test_420_subsampling_decodes(self):
        """The dominant real-world layout: 2x2 luma sampling with
        box-averaged chroma; chroma error is bounded on smooth content."""
        img = _gradient_rgb()
        out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 8

    def test_restart_markers_decode_identically(self):
        """RSTn markers reset DC predictors but never change pixels."""
        img = _gradient_rgb()
        plain = decode_jpeg(encode_jpeg(img, quality=95))
        rst = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=3))
        assert np.array_equal(plain, rst)
        rst420 = decode_jpeg(
            encode_jpeg(img, quality=95, subsampling="420", restart_interval=2)
        )
        assert np.abs(rst420.astype(int) - img.astype(int)).max() <= 8

    @pytest.mark.parametrize("shape", [(8, 8), (9, 9), (15, 17), (1, 1), (3, 50)])
    def test_odd_sizes_crop_exactly(self, shape):
        """Partial MCUs pad by edge replication on encode and crop on
        decode — output dims always equal input dims."""
        h, w = shape
        img = (np.arange(h * w * 3).reshape(h, w, 3) % 251).astype(np.uint8)
        for sub in ("444", "420"):
            out = decode_jpeg(encode_jpeg(img, quality=100, subsampling=sub))
            assert out.shape == (h, w, 3), (shape, sub)

    def test_single_component_scan_is_noninterleaved(self):
        """T.81 A.2.3: a one-component scan is NON-interleaved, so SOF
        sampling factors h=v=2 (legal, common when color sources are
        converted keeping the luma factors) must not change the data-unit
        walk.  Patch the SOF of a 1x1 grayscale stream to declare 2x2: the
        entropy stream is unchanged, so the decode must be too — including
        restart-marker MCU accounting."""
        rng = np.random.Generator(np.random.PCG64(7))
        g = rng.integers(0, 256, (H, W)).astype(np.uint8)
        for kw in ({}, {"restart_interval": 3}):
            ref = decode_jpeg(encode_jpeg(g, quality=95, **kw))
            buf = bytearray(encode_jpeg(g, quality=95, **kw))
            sof = bytes(buf).find(b"\xff\xc0")
            # SOF0 body: len(2) prec(1) h(2) w(2) ncomp(1) cid(1) hv(1)
            assert sof > 0 and buf[sof + 11] == 0x11
            buf[sof + 11] = 0x22
            assert np.array_equal(decode_jpeg(bytes(buf)), ref)

    def test_deterministic(self):
        img = _gradient_rgb()
        assert encode_jpeg(img, quality=90) == encode_jpeg(img, quality=90)


class TestProgressive:
    """SOF2 decode paths.  The progressive encoder quantizes identically to
    the baseline one and only repackages the entropy coding, so the decoded
    pixels must match the baseline decode EXACTLY — a differential pin far
    tighter than an error bound."""

    def test_matches_baseline_exactly_rgb_and_gray(self):
        img = _gradient_rgb()
        for q in (95, 75):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
            assert np.array_equal(base, prog), q
        g = img[:, :, 0]
        assert np.array_equal(
            decode_jpeg(encode_jpeg(g, quality=90)),
            decode_jpeg(encode_jpeg(g, quality=90, progressive=True)),
        )

    def test_matches_baseline_420_padded_grid(self):
        """W=53/H=37 make the luma MCU-padded grid strictly larger than the
        non-interleaved grid (ceil(53/8)=7 < 2*ceil(53/16)=8), so the AC
        scans cover a proper subset of the DC scan's blocks."""
        img = _gradient_rgb()
        base = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
        prog = decode_jpeg(
            encode_jpeg(img, quality=95, subsampling="420", progressive=True)
        )
        assert np.array_equal(base, prog)

    def test_noise_and_flat_extremes(self):
        """Random noise packs the AC bands densely (rare EOB runs); a flat
        image is DC-only so every AC scan is one long cross-block EOB run —
        both must still match the baseline decode exactly."""
        rng = np.random.Generator(np.random.PCG64(11))
        noise = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        flat = np.full((H, W, 3), 77, dtype=np.uint8)
        for img in (noise, flat):
            base = decode_jpeg(encode_jpeg(img, quality=85))
            prog = decode_jpeg(encode_jpeg(img, quality=85, progressive=True))
            assert np.array_equal(base, prog)

    def test_stream_structure(self):
        """The progressive stream is a real SOF2 multi-scan file: 2 DC
        scans + per-component (2 first + 2 refinement) AC scans."""
        data = encode_jpeg(_gradient_rgb(), progressive=True)
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data
        assert data.count(b"\xff\xda") >= 2 + 3 * 4  # SOS markers
        assert probe_jpeg(data) == (W, H, 3)

    def test_progressive_with_restart_rejected_by_encoder(self):
        with pytest.raises(ValueError, match="baseline"):
            encode_jpeg(_gradient_rgb(), progressive=True, restart_interval=2)


class TestProbeAndRejects:
    def test_probe_dims(self):
        data = encode_jpeg(_gradient_rgb())
        assert probe_jpeg(data) == (W, H, 3)
        gray = encode_jpeg(np.zeros((10, 20), dtype=np.uint8))
        assert probe_jpeg(gray) == (20, 10, 1)

    def test_probe_non_jpeg_is_none(self):
        assert probe_jpeg(b"") is None
        assert probe_jpeg(b"\x89PNG\r\n\x1a\n") is None
        assert probe_jpeg(b"\xff\xd8\xff") is None  # truncated

    def test_arithmetic_probes_but_rejects_decode(self):
        """SOF9 (arithmetic-coded sequential): dims remain probe-able,
        decode raises — the opaque-bytes fallback contract for genuinely
        unsupported modes (progressive SOF2 now decodes)."""
        data = bytearray(encode_jpeg(_gradient_rgb()))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC9
        assert probe_jpeg(bytes(data)) == (W, H, 3)
        with pytest.raises(ValueError, match="unsupported"):
            decode_jpeg(bytes(data))

    def test_truncated_stream_raises_not_hangs(self):
        data = encode_jpeg(_gradient_rgb())
        with pytest.raises(ValueError):
            decode_jpeg(data[:20])  # cut inside the header segments

    def test_corrupt_entropy_data_is_an_error_or_pixels(self):
        """Flipping bytes inside the entropy stream must either still decode
        (Huffman happens to resync) or raise ValueError — never hang or
        crash the interpreter (the multimodal fallback catches Exception)."""
        data = bytearray(encode_jpeg(_gradient_rgb()))
        data[-40] ^= 0x55
        try:
            out = decode_jpeg(bytes(data))
            assert out.shape == (H, W, 3)
        except ValueError:
            pass


class TestMultimodalIntegration:
    def test_jpeg_asset_decodes_to_pixels(self, spark):
        """decode_and_featurize over a JPEG payload: decoded=True, real
        dims, features measure pixels (histogram of decoded stream)."""
        from deduplication_challenge_spark.operators.multimodal import (
            decode_and_featurize,
        )

        img = _gradient_rgb()
        rows = [(1, "image", bytearray(encode_jpeg(img, quality=95)))]
        assets = spark.createDataFrame(
            rows, "asset_id long, kind string, payload binary"
        )
        got = decode_and_featurize(assets).collect()[0]
        assert got["decoded"] and got["ok"]
        assert got["media_format"] == "jpeg"
        assert (got["width"], got["height"]) == (W, H)

    def test_progressive_jpeg_decodes_like_baseline(self, spark):
        """The Spark featurization path decodes SOF2 payloads to the same
        pixels as the baseline encode of the same image."""
        from deduplication_challenge_spark.operators.multimodal import (
            decode_and_featurize,
        )

        img = _gradient_rgb()
        rows = [
            (1, "image", bytearray(encode_jpeg(img, quality=95))),
            (2, "image", bytearray(encode_jpeg(img, quality=95, progressive=True))),
        ]
        assets = spark.createDataFrame(
            rows, "asset_id long, kind string, payload binary"
        )
        got = {r["asset_id"]: r for r in decode_and_featurize(assets).collect()}
        assert got[2]["decoded"] and got[2]["media_format"] == "jpeg"
        assert (got[2]["width"], got[2]["height"]) == (W, H)
        assert got[2]["features"] == got[1]["features"]  # identical pixels

    def test_arithmetic_jpeg_falls_back_opaque(self, spark):
        from deduplication_challenge_spark.operators.multimodal import (
            decode_and_featurize,
        )

        data = bytearray(encode_jpeg(_gradient_rgb()))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC9  # arithmetic coding: genuinely undecodable here
        assets = spark.createDataFrame(
            [(1, "image", bytes(data))], "asset_id long, kind string, payload binary"
        )
        got = decode_and_featurize(assets).collect()[0]
        assert got["ok"] and not got["decoded"]
        assert got["media_format"] is None  # opaque bytes, never mislabeled
