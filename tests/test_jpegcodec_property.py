"""Property tests for the vendored JPEG codec: randomized shapes/content
through encode->decode, pinning (a) bounded reconstruction error, (b) the
EXACT progressive == baseline differential, (c) decode totality on
truncations (ValueError or a valid array — never a hang or wrong-shape
output).  Deterministic: hypothesis derandomized + seeded data."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from deduplication_challenge_spark.functions.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    probe_jpeg,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


def _image(h: int, w: int, c: int, seed: int, kind: str) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    if kind == "noise":
        arr = rng.integers(0, 256, (h, w, c))
    elif kind == "flat":
        arr = np.full((h, w, c), int(rng.integers(0, 256)))
    else:  # smooth gradient (no wrap — a %256 wrap is a sharp edge that
        # legitimately rings; this kind must stay genuinely low-frequency)
        yy, xx = np.mgrid[0:h, 0:w]
        base = xx * 127 // max(w - 1, 1) + yy * 127 // max(h - 1, 1)
        arr = np.broadcast_to(base[:, :, None], (h, w, c))
    return np.ascontiguousarray(arr).astype(np.uint8)


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    c=st.sampled_from([1, 3]),
    quality=st.sampled_from([60, 85, 100]),
    sub=st.sampled_from(["444", "420"]),
    kind=st.sampled_from(["noise", "flat", "smooth"]),
    seed=st.integers(0, 2**16),
)
@settings(**_SETTINGS)
def test_roundtrip_shape_and_progressive_equality(h, w, c, quality, sub, kind, seed):
    if sub == "420" and c == 1:
        sub = "444"  # subsampling applies to color only
    img = _image(h, w, c, seed, kind)
    base_bytes = encode_jpeg(img, quality=quality, subsampling=sub)
    assert probe_jpeg(base_bytes) == (w, h, c)
    base = decode_jpeg(base_bytes)
    assert base.shape == (h, w, c) and base.dtype == np.uint8
    prog = decode_jpeg(
        encode_jpeg(img, quality=quality, subsampling=sub, progressive=True)
    )
    # same quantized coefficients, different entropy packaging -> identical
    assert np.array_equal(base, prog)


@given(
    h=st.integers(8, 32),
    w=st.integers(8, 32),
    seed=st.integers(0, 2**16),
)
@settings(**_SETTINGS)
def test_smooth_content_error_bound_q95(h, w, seed):
    """On smooth content at q95 the reconstruction stays within a tight
    bound — a regression in the DCT/quant/entropy chain shows up here."""
    img = _image(h, w, 3, seed, "smooth")
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


@given(
    frac=st.floats(0.001, 0.999),
    progressive=st.booleans(),
)
@settings(**_SETTINGS)
def test_truncation_is_total(frac, progressive):
    """Truncated streams either raise ValueError or decode to a correctly
    shaped array (a prefix of scans is legal progressive data) — never an
    index error, hang, or mis-shaped output.  The cut point is a FRACTION
    of the stream so both header truncation and mid-entropy / between-scan
    truncation are actually reached (a fixed small byte cap never got past
    the ~300-600 bytes of headers before the first SOS)."""
    img = _image(24, 24, 3, 7, "smooth")
    data = encode_jpeg(img, quality=85, progressive=progressive)
    cut = max(2, min(int(len(data) * frac), len(data) - 1))
    try:
        out = decode_jpeg(data[:cut])
    except ValueError:
        return
    assert out.shape == (24, 24, 3) and out.dtype == np.uint8


def test_zero_component_sos_raises_valueerror():
    """A crafted SOS with ns=0 must raise ValueError (not IndexError from
    an empty selector list) — the opaque-fallback totality contract."""
    img = _image(16, 16, 1, 3, "flat")
    data = encode_jpeg(img, quality=85)
    sos = data.find(b"\xff\xda")
    crafted = data[:sos] + b"\xff\xda\x00\x06\x00\x00\x3f\x00" + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(crafted)


def test_truncation_mid_entropy_decodes_or_raises():
    """Pin the success branch explicitly: cutting a progressive stream
    right before the LAST scan's SOS leaves a legal prefix-of-scans file
    that must decode to the full-frame shape."""
    img = _image(24, 24, 3, 7, "smooth")
    data = encode_jpeg(img, quality=85, progressive=True)
    last_sos = data.rfind(b"\xff\xda")
    assert last_sos > 0
    out = decode_jpeg(data[:last_sos] + b"\xff\xd9")
    assert out.shape == (24, 24, 3)
