"""Minimal pure-Python baseline JPEG codec so the multimodal path decodes
the dominant real-world image format in this container (no Pillow shipped).

Implemented from the public specs only: ITU-T T.81 (ISO/IEC 10918-1)
baseline sequential DCT AND progressive DCT (SOF2) — 8-bit samples, Huffman
entropy coding, grayscale and YCbCr (JFIF color transform), arbitrary h/v
sampling factors up to 2 (4:4:4 / 4:2:2 / 4:2:0 chroma subsampling,
nearest-neighbor upsampling), restart markers honored.  The decoder
accumulates every scan (interleaved or not, spectral selection, successive
approximation with EOB-run coding per T.81 G.2) into per-component
coefficient buffers and runs one vectorized IDCT at the end — which also
makes multi-scan SEQUENTIAL streams (one scan per component) decode for
free.  The encoder (test-fixture generator, mirroring encode_png /
encode_bmp) emits baseline 4:4:4 / grayscale streams with the Annex K
quantization and Huffman tables, or — ``progressive=True`` — an SOF2
stream with a DC-first/DC-refine + banded AC-first/AC-refine scan script;
the decoder reads the tables FROM the stream (DQT/DHT segments), never
from constants, so it decodes third-party files, not just its own output.

NOT a general-purpose library: arithmetic coding, hierarchical modes,
12-bit precision and sampling factors > 2 raise ValueError — callers
(operators/multimodal.py) treat undecodable payloads as opaque bytes, the
documented fallback.  JPEG is lossy by construction: roundtrip tests pin
an ERROR BOUND, not byte equality (the PNG/BMP codecs keep the byte-exact
pins).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

#: zig-zag scan order (T.81 figure 5): index = scan position, value = index
#: into the natural (row-major) 8x8 order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

#: Annex K table K.1/K.2 quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K tables K.3-K.6 Huffman specs as (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: 8x8 DCT-II basis: C[u, x] = alpha(u) cos((2x+1) u pi / 16).
#: forward: F = C @ f @ C.T; inverse: f = C.T @ F @ C (orthonormal).
_x = np.arange(8)
_DCT = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_DCT[0, :] = np.sqrt(1 / 8)

#: SOF markers decoded here (C0 baseline, C1 extended-sequential Huffman —
#: same scan structure — and C2 progressive); other SOFn are mode markers
#: we reject (arithmetic, lossless, hierarchical)
_SOF_SUPPORTED = (0xC0, 0xC1, 0xC2)
_SOF_ALL = tuple(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)


# ---------------------------------------------------------------------------
# marker scan / probe
# ---------------------------------------------------------------------------

def _segments(data: bytes):
    """Yield (marker, payload, payload_offset) for every marker segment up
    to (and including) SOS; entropy-coded data follows SOS and is handled
    by the scan decoder."""
    if not data.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            yield marker, b"", pos + 2
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        yield marker, data[pos + 4 : pos + 2 + length], pos + 4
        if marker == 0xDA:  # SOS: entropy data follows, stop segment scan
            return
        pos += 2 + length


def probe_jpeg(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from the first SOFn, or None if not a
    JPEG.  Probing succeeds for ANY JPEG mode (dims are mode-independent);
    only decode restricts to baseline."""
    if not isinstance(data, (bytes, bytearray)) or not data.startswith(JPEG_MAGIC):
        return None
    try:
        for marker, body, _off in _segments(bytes(data)):
            if marker in _SOF_ALL and len(body) >= 6:
                _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
                return w, h, ncomp
    except (ValueError, struct.error):
        return None
    return None


# ---------------------------------------------------------------------------
# Huffman coding
# ---------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the T.81 canonical code construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value — the decode-side view of the same canon."""
    return {(ln, c): v for v, (c, ln) in _build_codes(bits, vals).items()}


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 un-stuffing;
    stops at any non-stuffing marker (RST handled by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # feed 1-bits past the end (padding convention) so a final
                # partially-padded code still decodes
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed literal 0xFF
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    self.marker = nxt
                    self.pos += 2
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_after_rst(self) -> None:
        """Consume the pending RST marker and resume byte-aligned."""
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map `size` raw magnitude bits to a signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _next_marker(data: bytes, pos: int) -> tuple[int | None, int]:
    """Scan forward from ``pos`` (inside/after entropy data) to the next
    non-RST marker; returns (marker, position_of_its_0xFF)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        if m in (0x00, 0xFF):  # stuffed FF / fill byte
            pos += 2 if m == 0x00 else 1
            continue
        if 0xD0 <= m <= 0xD7:  # stray RST inside entropy data
            pos += 2
            continue
        return m, pos
    return None, n


def _expect_rst(reader: _BitReader) -> None:
    """Consume the restart marker the caller's unit count says is due."""
    if reader.marker is None:
        reader._fill()  # surface the pending marker
    if reader.marker is None or not (0xD0 <= reader.marker <= 0xD7):
        raise ValueError("expected restart marker")
    reader.align_after_rst()


def _decode_scan(
    data: bytes,
    pos: int,
    comps: list[tuple[int, int, int, int]],
    dims: tuple[int, int, int, int, int, int],
    sel: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff: dict[tuple[int, int], dict],
    restart_interval: int,
    coefs: list[np.ndarray],
) -> int:
    """Decode ONE entropy-coded scan into the per-component coefficient
    buffers (zigzag order); returns the stream position after the scan's
    entropy data.  Handles every T.81 Huffman scan shape: interleaved or
    single-component, full-band sequential, progressive spectral selection
    and successive approximation (first + refinement, EOB runs per G.2)."""
    w, h, hmax, vmax, mcus_x, mcus_y = dims
    if not (0 <= ss <= se <= 63):
        raise ValueError(f"bad spectral band {ss}..{se}")
    if ss > 0 and len(sel) != 1:
        raise ValueError("AC scans must be single-component (T.81 B.2.3)")
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def _tables(dc_id: int, ac_id: int) -> tuple[dict | None, dict | None]:
        dc_tab = huff.get((0, dc_id))
        ac_tab = huff.get((1, ac_id))
        if ss == 0 and ah == 0 and dc_tab is None:
            raise ValueError("missing DC Huffman table")
        if (se > 0 or ss > 0) and ac_tab is None:
            raise ValueError("missing AC Huffman table")
        return dc_tab, ac_tab

    def _decode_unit(ci: int, blk: np.ndarray, dc_tab, ac_tab) -> None:
        nonlocal eobrun
        k = ss
        if ss == 0:
            if ah == 0:  # DC first (or sequential full-band start)
                size = _decode_huff(reader, dc_tab)
                pred[ci] += _extend(reader.read_bits(size), size)
                blk[0] = pred[ci] << al
            else:  # DC refinement: one bit per data unit
                if reader.read_bit():
                    blk[0] |= p1
            k = 1
            if se == 0:
                return
        if ah == 0:  # AC first pass (sequential or progressive)
            if eobrun > 0:
                eobrun -= 1
                return
            while k <= se:
                rs = _decode_huff(reader, ac_tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    eobrun -= 1  # this block's EOB consumed now
                    return
                k += r
                if k > se:
                    raise ValueError("AC index overrun")
                blk[k] = _extend(reader.read_bits(s), s) << al
                k += 1
            return
        # AC refinement (T.81 G.2 / the classic correction-bit walk):
        # the run length r counts only ZERO-HISTORY coefficients; every
        # nonzero-history coefficient passed costs one correction bit
        if eobrun == 0:
            while k <= se:
                rs = _decode_huff(reader, ac_tab)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError("refinement scan with size > 1")
                    newval = p1 if reader.read_bit() else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # fall through to the EOB-run correction sweep
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError("refinement index overrun")
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1

    unit_index = 0

    def _restart_boundary() -> None:
        nonlocal pred, eobrun
        if restart_interval and unit_index and unit_index % restart_interval == 0:
            _expect_rst(reader)
            pred = [0] * len(comps)
            eobrun = 0

    if len(sel) > 1:  # interleaved: MCU walk over the padded grid
        for _my in range(mcus_y):
            for _mx in range(mcus_x):
                _restart_boundary()
                for ci, dc_id, ac_id in sel:
                    _cid, ch, cv, _tq = comps[ci]
                    dc_tab, ac_tab = _tables(dc_id, ac_id)
                    for by in range(cv):
                        for bx in range(ch):
                            _decode_unit(
                                ci,
                                coefs[ci][_my * cv + by, _mx * ch + bx],
                                dc_tab, ac_tab,
                            )
                unit_index += 1
    else:  # non-interleaved: row-major walk over the component's own grid
        ci, dc_id, ac_id = sel[0]
        _cid, ch, cv, _tq = comps[ci]
        dc_tab, ac_tab = _tables(dc_id, ac_id)
        comp_w = -(-w * ch // hmax)  # ceil(w * ch / hmax)
        comp_h = -(-h * cv // vmax)
        nbx = -(-comp_w // 8)
        nby = -(-comp_h // 8)
        for by in range(nby):
            for bx in range(nbx):
                _restart_boundary()
                _decode_unit(ci, coefs[ci][by, bx], dc_tab, ac_tab)
                unit_index += 1

    # the reader may have read ahead in whole bytes; back up to the first
    # unconsumed byte so the marker walk resumes correctly
    if reader.marker is not None:
        return reader.pos
    return reader.pos - (reader.nbits // 8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes (baseline, extended-sequential or progressive Huffman) ->
    (H, W, C) uint8 (C = 1 grayscale, 3 RGB)."""
    data = bytes(data)
    if not data.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decoder table
    frame = None  # (w, h, comps)
    restart_interval = 0
    coefs: list[np.ndarray] = []
    dims = None
    saw_scan = False
    n = len(data)
    pos = 2
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        seg_end = pos + 2 + length
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if p + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                vals = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                # DQT stores zigzag order; q_nat[ZIGZAG[k]] = vals[k]
                q_nat = np.zeros(64, dtype=np.int64)
                q_nat[ZIGZAG] = vals.astype(np.int64)
                qtables[tq] = q_nat
                p += 65
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            p = 0
            while p < len(body):
                if p + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nval = sum(bits)
                vals = list(body[p + 17 : p + 17 + nval])
                if len(vals) < nval:
                    raise ValueError("truncated DHT segment")
                huff[(tc, th)] = _build_decoder(bits, vals)
                p += 17 + nval
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker in _SOF_ALL:
            if marker not in _SOF_SUPPORTED:
                raise ValueError(
                    f"JPEG mode 0xFF{marker:02X} unsupported"
                )
            if frame is not None:
                raise ValueError("multiple SOF frames (hierarchical?)")
            if len(body) < 6:
                raise ValueError("truncated SOF segment")
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise ValueError(f"sampling factors {ch}x{cv} unsupported")
                comps.append((cid, ch, cv, tq))
            if ncomp == 1:
                # T.81 A.2.3: every scan on a one-component frame is
                # NON-interleaved — the data-unit grid is ceil(w/8) x
                # ceil(h/8) regardless of the declared sampling factors
                # (h=v=2 grayscale is legal and common when color sources
                # are converted keeping the luma factors).  Normalizing to
                # 1x1 makes both walks degenerate to exactly that order.
                cid0, _ch0, _cv0, tq0 = comps[0]
                comps = [(cid0, 1, 1, tq0)]
            frame = (w, h, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            dims = (w, h, hmax, vmax, mcus_x, mcus_y)
            # int32 halves the dominant allocation (8 B/coefficient -> 4):
            # quantized 8-bit-precision coefficients fit in 16 bits even
            # before the successive-approximation shift
            coefs = [
                np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
                for (_cid, ch, cv, _tq) in comps
            ]
        elif marker == 0xDA:  # SOS: decode the scan, resume at next marker
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(body) < 1 or body[0] == 0 or len(body) < 4 + 2 * body[0]:
                raise ValueError("truncated or empty SOS segment")
            ns = body[0]
            by_id = {cid: i for i, (cid, *_rest) in enumerate(frame[2])}
            sel = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                if cid not in by_id:
                    raise ValueError(f"SOS names unknown component {cid}")
                sel.append((by_id[cid], tt >> 4, tt & 0x0F))
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            end = _decode_scan(
                data, seg_end, frame[2], dims, sel,
                ss, se, a >> 4, a & 0x0F,
                huff, restart_interval, coefs,
            )
            saw_scan = True
            _m, pos = _next_marker(data, end)
            continue
        pos = seg_end
    if frame is None or not saw_scan:
        raise ValueError("missing SOF/SOS")

    # dequantize + IDCT every component in one vectorized pass
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_planes = []
    for ci, (_cid, ch, cv, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
        q = qtables[tq]
        buf = coefs[ci]
        coefs[ci] = None  # free the coefficient buffer as soon as it's used
        nby, nbx, _ = buf.shape
        nat = np.zeros((nby, nbx, 64), dtype=np.float64)
        nat[:, :, ZIGZAG] = buf * q[ZIGZAG]
        del buf
        blocks = (
            np.einsum("ij,nmjk,kl->nmil", _DCT.T, nat.reshape(nby, nbx, 8, 8), _DCT)
            + 128.0
        )
        del nat
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        del blocks
        # upsample subsampled planes (nearest-neighbor), crop to (h, w)
        if ch != hmax:
            plane = np.repeat(plane, hmax // ch, axis=1)
        if cv != vmax:
            plane = np.repeat(plane, vmax // cv, axis=0)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(out_planes) != 3:
        raise ValueError(f"{len(out_planes)}-component JPEG unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (test-fixture generator: baseline, 4:4:4 / grayscale, Annex K)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)

    def emit_restart(self, m: int) -> None:
        """Pad to a byte boundary and append RSTm (markers are never
        byte-stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + m])


#: AC Huffman table for the progressive encoder's scans.  The Annex K AC
#: tables carry no EOBn symbols with n > 0 (0x10..0xE0) — their 16-bit
#: level is within one code of Kraft-full, so they cannot be extended.
#: Progressive fixtures instead use this uniform 8-bit canonical table over
#: every symbol an SOF2 AC scan can emit: EOBn (r 0..14), ZRL, and
#: (r, size) for r 0..15, size 1..10 — 176 codes, Kraft 176/256 < 1, and
#: no code is all-1-bits.  Wasteful compression, spec-valid stream; the
#: decoder reads whatever DHT the stream carries, so nothing special-cases
#: this table on the read side.
HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _magnitude(v: int) -> tuple[int, int]:
    """signed coefficient -> (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _quantize_plane(plane: np.ndarray, q: np.ndarray, nby: int, nbx: int) -> np.ndarray:
    """(H, W) float plane -> (nby, nbx, 64) int64 quantized coefficients in
    ZIGZAG order; partial edge blocks are edge-replicated deterministically."""
    yy = np.clip(np.arange(nby * 8), 0, plane.shape[0] - 1)
    xx = np.clip(np.arange(nbx * 8), 0, plane.shape[1] - 1)
    p = plane[np.ix_(yy, xx)] - 128.0
    blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    coeff = np.einsum("ij,nmjk,lk->nmil", _DCT, blocks, _DCT)
    return np.round(coeff.reshape(nby, nbx, 64)[:, :, ZIGZAG] / q[ZIGZAG]).astype(
        np.int64
    )


class _ProgACScan:
    """Per-scan AC entropy state for the progressive encoder: the EOB run
    and (for refinement scans) the correction bits buffered until the next
    Huffman symbol flushes them (T.81 G.1.2.3 / the classic two-buffer
    formulation)."""

    def __init__(self, writer: _BitWriter, codes: dict[int, tuple[int, int]]) -> None:
        self.w = writer
        self.codes = codes
        self.eobrun = 0
        self.pending: list[int] = []

    def symbol(self, sym: int) -> None:
        code, ln = self.codes[sym]
        self.w.write(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.symbol(nbits << 4)
            if nbits:
                self.w.write(self.eobrun, nbits)
            self.eobrun = 0
        for bit in self.pending:
            self.w.write(bit, 1)
        self.pending = []

    def end_block(self, carried_bits: list[int]) -> None:
        self.eobrun += 1
        self.pending.extend(carried_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _emit_ac_first(st: _ProgACScan, zz: np.ndarray, ss: int, se: int, al: int) -> None:
    """First-pass AC coding of one block's band (Ah = 0), point transform
    ``Al`` applied magnitude-wise (T.81 G.1.2.2)."""
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        av = abs(v) >> al
        vals.append(av if v >= 0 else -av)
    nz = [i for i, v in enumerate(vals) if v != 0]
    if not nz:
        st.end_block([])
        return
    st.flush_eobrun()
    run = 0
    for i in range(nz[-1] + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            st.symbol(0xF0)  # ZRL
            run -= 16
        size, bits = _magnitude(v)
        st.symbol((run << 4) | size)
        st.w.write(bits, size)
        run = 0
    if nz[-1] < se - ss:  # trailing zeros: this block contributes an EOB
        st.end_block([])


def _emit_ac_refine(st: _ProgACScan, zz: np.ndarray, ss: int, se: int, al: int) -> None:
    """Refinement AC coding of one block's band (Ah = Al + 1): newly
    significant coefficients carry (run, 1) symbols + a sign bit, history
    coefficients a buffered correction bit each (T.81 G.1.2.3)."""
    t = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # 1 past the last NEWLY significant coefficient
    for i, v in enumerate(t):
        if v == 1:
            eob = i + 1
    run = 0
    br: list[int] = []  # correction bits since the last emitted symbol
    for i, v in enumerate(t):
        if v == 0:
            run += 1
            continue
        while run > 15 and i < eob:
            st.flush_eobrun()
            st.symbol(0xF0)
            run -= 16
            for bit in br:
                st.w.write(bit, 1)
            br = []
        if v > 1:
            br.append(v & 1)
            continue
        st.flush_eobrun()
        st.symbol((run << 4) | 1)
        st.w.write(0 if int(zz[ss + i]) < 0 else 1, 1)
        for bit in br:
            st.w.write(bit, 1)
        br = []
        run = 0
    if run > 0 or br:
        st.end_block(br)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8 -> JPEG bytes
    (Annex K quantization tables).  ``subsampling='420'`` emits 2x2-sampled
    luma with box-averaged chroma (the dominant real-world layout);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs;
    ``progressive=True`` emits an SOF2 stream with the scan script
    DC-first(Al=1) -> DC-refine, then per component AC 1..5 / 6..63
    first-pass(Al=1) and refinement scans — exercising every progressive
    decode path (spectral selection, successive approximation, EOB runs).
    All three exist mainly so the DECODER's paths are exercised by fixtures
    rather than only by third-party files."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError("JPEG encoder takes 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    if progressive and restart_interval:
        raise ValueError("restart_interval is a baseline-encoder option")
    px = arr.astype(np.float64)
    if c == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [px[:, :, 0]]

    if subsampling == "420" and c == 3:
        factors = [(2, 2), (1, 1), (1, 1)]

        def _box2(p: np.ndarray) -> np.ndarray:
            hh = -(-p.shape[0] // 2) * 2
            ww = -(-p.shape[1] // 2) * 2
            padded = p[np.ix_(np.clip(np.arange(hh), 0, p.shape[0] - 1),
                              np.clip(np.arange(ww), 0, p.shape[1] - 1))]
            return padded.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))

        planes = [planes[0], _box2(planes[1]), _box2(planes[2])]
    else:
        factors = [(1, 1)] * c
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    q_luma = _quality_scale(QUANT_LUMA, quality)
    q_chroma = _quality_scale(QUANT_CHROMA, quality)
    qt = [q_luma] + ([q_chroma, q_chroma] if c == 3 else [])
    dc_spec = [HUFF_DC_LUMA] + ([HUFF_DC_CHROMA] * 2 if c == 3 else [])
    dc_codes = [_build_codes(*s) for s in dc_spec]

    # quantized coefficients over the MCU-padded grid, per component
    zzs = [
        _quantize_plane(planes[ci], qt[ci], mcus_y * cv, mcus_x * ch)
        for ci, (ch, cv) in enumerate(factors)
    ]
    # non-interleaved (per-component) grids: only these blocks are coded in
    # single-component scans (T.81 A.2.2) — the padded remainder is not
    def _ceil(a: int, b: int) -> int:
        return -(-a // b)

    ni_grid = [
        (_ceil(_ceil(h * cv, vmax), 8), _ceil(_ceil(w * ch, hmax), 8))
        for (ch, cv) in factors
    ]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(JPEG_MAGIC)
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    dqt = bytes([0]) + bytes(q_luma[ZIGZAG].astype(np.uint8))
    if c == 3:
        dqt += bytes([1]) + bytes(q_chroma[ZIGZAG].astype(np.uint8))
    out += seg(0xDB, dqt)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, h, w, c)
    for i in range(c):
        ch, cv = factors[i]
        sof += bytes([i + 1, (ch << 4) | cv, 0 if i == 0 else 1])
    out += seg(0xC2 if progressive else 0xC0, sof)

    if not progressive:
        ac_spec = [HUFF_AC_LUMA] + ([HUFF_AC_CHROMA] * 2 if c == 3 else [])
        ac_codes = [_build_codes(*s) for s in ac_spec]
        writer = _BitWriter()
        pred = [0] * c
        mcu_index = 0
        rst_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    writer.emit_restart(rst_count % 8)
                    rst_count += 1
                    pred = [0] * c
                for ci in range(c):
                    ch, cv = factors[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            zz = zzs[ci][my * cv + by, mx * ch + bx]
                            diff = int(zz[0]) - pred[ci]
                            pred[ci] = int(zz[0])
                            size, bits = _magnitude(diff)
                            code, ln = dc_codes[ci][size]
                            writer.write(code, ln)
                            if size:
                                writer.write(bits, size)
                            run = 0
                            last_nz = (
                                int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                            )
                            for k in range(1, 64):
                                v = int(zz[k])
                                if v == 0:
                                    if k > last_nz:
                                        break
                                    run += 1
                                    if run == 16:
                                        zc, zl = ac_codes[ci][0xF0]  # ZRL
                                        writer.write(zc, zl)
                                        run = 0
                                    continue
                                size, bits = _magnitude(v)
                                code, ln = ac_codes[ci][(run << 4) | size]
                                writer.write(code, ln)
                                writer.write(bits, size)
                                run = 0
                            if last_nz < 63:
                                ec, el = ac_codes[ci][0x00]  # EOB
                                writer.write(ec, el)
                mcu_index += 1
        dht = b""
        specs = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)]
        if c == 3:
            specs += [(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)]
        for tc, th, (bits, vals) in specs:
            dht += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += seg(0xC4, dht)
        sos = bytes([c])
        for i in range(c):
            sos += bytes([i + 1, 0 if i == 0 else 0x11])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        out += writer.flush()
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # --- progressive: DHTs up front, then the scan script -----------------
    ac_prog_codes = _build_codes(*HUFF_AC_PROG)
    dht = b""
    specs = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_PROG)]
    if c == 3:
        specs += [(0, 1, HUFF_DC_CHROMA)]
    for tc, th, (bits, vals) in specs:
        dht += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += seg(0xC4, dht)

    all_comps = list(range(c))
    scans: list[tuple[list[int], int, int, int, int]] = [
        (all_comps, 0, 0, 0, 1),  # DC first, Al = 1
        (all_comps, 0, 0, 1, 0),  # DC refinement
    ]
    for ci in all_comps:
        scans += [([ci], 1, 5, 0, 1), ([ci], 6, 63, 0, 1)]
    for ci in all_comps:
        scans += [([ci], 1, 5, 1, 0), ([ci], 6, 63, 1, 0)]

    for comps_in, ss, se, sah, sal in scans:
        sos = bytes([len(comps_in)])
        for ci in comps_in:
            dc_id = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (dc_id << 4) | 0])  # AC table 0 for all
        sos += bytes([ss, se, (sah << 4) | sal])
        out += seg(0xDA, sos)
        writer = _BitWriter()
        if ss == 0:  # DC scan (interleaved unless single-component frame)
            pred = [0] * c
            if len(comps_in) > 1:
                units = (
                    (ci, my * cv + by, mx * ch + bx)
                    for my in range(mcus_y)
                    for mx in range(mcus_x)
                    for ci in comps_in
                    for (ch, cv) in [factors[ci]]
                    for by in range(cv)
                    for bx in range(ch)
                )
            else:
                ci0 = comps_in[0]
                units = (
                    (ci0, by, bx)
                    for by in range(ni_grid[ci0][0])
                    for bx in range(ni_grid[ci0][1])
                )
            for ci, by, bx in units:
                dc = int(zzs[ci][by, bx, 0])
                if sah == 0:  # first pass codes DC >> Al, diff-coded
                    v = dc >> sal
                    size, bits = _magnitude(v - pred[ci])
                    pred[ci] = v
                    code, ln = dc_codes[ci][size]
                    writer.write(code, ln)
                    if size:
                        writer.write(bits, size)
                else:  # refinement: one raw bit per data unit
                    writer.write((dc >> sal) & 1, 1)
        else:  # AC scan: single component, non-interleaved
            ci0 = comps_in[0]
            st = _ProgACScan(writer, ac_prog_codes)
            emit = _emit_ac_first if sah == 0 else _emit_ac_refine
            for by in range(ni_grid[ci0][0]):
                for bx in range(ni_grid[ci0][1]):
                    emit(st, zzs[ci0][by, bx], ss, se, sal)
            st.flush_eobrun()
        out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
