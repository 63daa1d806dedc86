"""Baseline sequential-DCT JPEG (ITU-T T.81) — real codec, no image libs.

Closes the "dominant real-world format" gap left by the PNG/PNM/BMP/TIFF/
GIF decoders in ``binary_ops.py``: a pure Python+NumPy BASELINE JPEG
decoder (marker walk, DQT/DHT/SOF0/SOS/DRI parsing, canonical Huffman
decode, DC DPCM + AC run-length/zigzag, dequantization, separable float
IDCT, level shift, restart-marker handling, byte-unstuffing) plus the
matching encoder used to synthesize deterministic fixtures from doc ids.

Decoder scope contract (same style as the other codecs' formal
boundaries, binary_ops.py:598): baseline sequential DCT (SOF0),
8-bit, single-component (grayscale), 1x1 sampling. Progressive (SOF2),
arithmetic coding, multi-component/chroma-subsampled streams raise
``NotImplementedError`` with an explicit message — transcode upstream.

Exactness story for the oracle gate: fixture images are built from FLAT
8x8 blocks. A flat block has only a DC coefficient; with the DC quant
step set to 8, dequantized DC = 8*(v-128) and the IDCT of a DC-only
block is exactly DC/8 + 128 = v at every pixel — zero rounding, so the
DuckDB oracle recomputes every decoded feature from the id formula. The
AC path (run lengths, ZRL, EOB, magnitude extend) is exercised by the
unit tests against an independent NumPy IDCT reference, where exactness
is checked coefficient-for-coefficient rather than via a closed form.

Scale: the same design rules as binary_ops.py — media stays opaque
binary JVM-side, decode+feature happens in ONE Arrow-batched
``mapInPandas`` hop, pixels never shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K typical luminance tables + zigzag)
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# BITS[i] = number of codes of length i+1; HUFFVAL in code order
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical assignment of T.81 C.2."""
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


# separable IDCT basis: M[u, x] = C(u)/2 * cos((2x+1)u*pi/16);
# spatial = M.T @ coeffs @ M
_C = np.array([1.0 / np.sqrt(2.0)] + [1.0] * 7)
_IDCT_M = np.array(
    [
        [
            _C[u] / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


# ---------------------------------------------------------------------------
# Bit-level writer (with 0xFF byte stuffing) — encoder side
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # stuffing: FF in entropy data -> FF 00
                self.out.append(0x00)

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _put_block(
    w: _BitWriter,
    blk: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Huffman-encode one quantized 8x8 block (natural order); returns the
    new DC predictor."""
    zz = [int(blk.reshape(64)[ZIGZAG[k]]) for k in range(64)]
    t, bits = _magnitude(zz[0] - pred)
    code, ln = dc_codes[t]
    w.put(code, ln)
    if t:
        w.put(bits, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        t, bits = _magnitude(zz[k])
        code, ln = ac_codes[(run << 4) | t]
        w.put(code, ln)
        w.put(bits, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return zz[0]


def encode_jpeg_gray8(
    coeff_blocks: np.ndarray,
    width: int,
    height: int,
    qtable: np.ndarray,
    restart_interval: int = 0,
) -> bytes:
    """Encode QUANTIZED coefficient blocks (n_by, n_bx, 8, 8 natural
    order, int) into a baseline grayscale JFIF stream with the Annex K
    luminance Huffman tables. Used for fixture synthesis and round-trip
    tests; the decoder never assumes these tables — it reads DHT."""
    n_by, n_bx = coeff_blocks.shape[:2]
    if (n_bx * 8 < width) or (n_by * 8 < height):
        raise ValueError("coefficient grid smaller than image")
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_q = bytes(int(qtable.reshape(64)[ZIGZAG[k]]) for k in range(64))
    out += _seg(0xDB, b"\x00" + zz_q)  # DQT, 8-bit, table 0
    out += _seg(
        0xC0,  # SOF0 baseline: precision 8, 1 component, 1x1 sampling
        b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x01\x01\x11\x00",
    )
    out += _seg(
        0xC4,
        b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS),
    )
    out += _seg(
        0xC4,
        b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS),
    )
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS

    w = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(n_by):
        for bx in range(n_bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.align()
                w.out.append(0xFF)
                w.out.append(0xD0 + rst % 8)
                rst += 1
                pred = 0
            pred = _put_block(
                w, coeff_blocks[by, bx], pred, dc_codes, ac_codes
            )
            mcu += 1
    w.align()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray8_flat(
    block_values: np.ndarray,
    width: int,
    height: int,
    restart_interval: int = 0,
) -> bytes:
    """Flat-block fixture encoder: each 8x8 block is the constant
    ``block_values[by, bx]`` (0..255). DC quant step 8 makes the decode
    EXACT (DC-only IDCT = DC/8 + 128), so external oracles can recompute
    every pixel from the block formula."""
    n_by, n_bx = block_values.shape
    coeffs = np.zeros((n_by, n_bx, 8, 8), dtype=np.int64)
    coeffs[:, :, 0, 0] = block_values.astype(np.int64) - 128
    q = np.full((8, 8), 16, dtype=np.int64)
    q[0, 0] = 8
    return encode_jpeg_gray8(coeffs, width, height, q, restart_interval)


def encode_jpeg_ycbcr(
    y_blocks: np.ndarray,
    cb_blocks: np.ndarray,
    cr_blocks: np.ndarray,
    width: int,
    height: int,
    qt_luma: np.ndarray,
    qt_chroma: np.ndarray,
    sampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode a 3-component baseline YCbCr stream with interleaved MCUs.

    ``sampling`` = (h, v) factors of the LUMA component; chroma is always
    1x1, so (1, 1) is 4:4:4, (2, 2) is 4:2:0, (2, 1) is 4:2:2. Inputs are
    QUANTIZED coefficient grids: Y is (mcus_y*v, mcus_x*h, 8, 8), Cb/Cr
    are (mcus_y, mcus_x, 8, 8). Both Huffman table pairs (luma id 0,
    chroma id 1) are written to DHT — the decoder reads them, never
    assumes them."""
    sh, sv = sampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("sampling factors must be 1 or 2")
    mcus_y, mcus_x = cb_blocks.shape[:2]
    if cr_blocks.shape[:2] != (mcus_y, mcus_x):
        raise ValueError("Cb/Cr grids must match")
    if y_blocks.shape[:2] != (mcus_y * sv, mcus_x * sh):
        raise ValueError("Y grid must be (mcus_y*v, mcus_x*h)")
    if (mcus_x * sh * 8 < width) or (mcus_y * sv * 8 < height):
        raise ValueError("MCU grid smaller than image")
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zq0 = bytes(int(qt_luma.reshape(64)[ZIGZAG[k]]) for k in range(64))
    zq1 = bytes(int(qt_chroma.reshape(64)[ZIGZAG[k]]) for k in range(64))
    out += _seg(0xDB, b"\x00" + zq0 + b"\x01" + zq1)
    out += _seg(
        0xC0,
        b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x03"
        + bytes([1, (sh << 4) | sv, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    out += _seg(0xC4, b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += _seg(0xC4, b"\x01" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, b"\x11" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(
        0xDA,
        b"\x03" + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
        + b"\x00\x3f\x00",
    )

    w = _BitWriter()
    preds = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.align()
                w.out.append(0xFF)
                w.out.append(0xD0 + rst % 8)
                rst += 1
                preds = [0, 0, 0]
            for vy in range(sv):
                for vx in range(sh):
                    preds[0] = _put_block(
                        w,
                        y_blocks[my * sv + vy, mx * sh + vx],
                        preds[0],
                        dc_codes,
                        ac_codes,
                    )
            preds[1] = _put_block(
                w, cb_blocks[my, mx], preds[1], dc_codes, ac_codes
            )
            preds[2] = _put_block(
                w, cr_blocks[my, mx], preds[2], dc_codes, ac_codes
            )
            mcu += 1
    w.align()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_flat(
    y_block_values: np.ndarray,
    width: int,
    height: int,
    sampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Flat-Y / neutral-chroma color fixture: each Y 8x8 block is constant
    ``y_block_values[by, bx]``; Cb = Cr = 128 everywhere (zero chroma
    coefficients). With the DC quant step at 8 the decode is EXACT and,
    because neutral chroma makes R = G = B = Y, the decoded gray equals
    the Y formula at every pixel — color parsing, interleaved MCUs,
    per-component predictors, upsampling and the YCbCr->RGB conversion
    all run, with zero rounding slack for the oracle."""
    sh, sv = sampling
    n_by, n_bx = y_block_values.shape
    if n_by % sv or n_bx % sh:
        raise ValueError("Y grid must be a multiple of the sampling factors")
    mcus_y, mcus_x = n_by // sv, n_bx // sh
    y = np.zeros((n_by, n_bx, 8, 8), dtype=np.int64)
    y[:, :, 0, 0] = y_block_values.astype(np.int64) - 128
    cb = np.zeros((mcus_y, mcus_x, 8, 8), dtype=np.int64)
    cr = np.zeros((mcus_y, mcus_x, 8, 8), dtype=np.int64)
    q = np.full((8, 8), 16, dtype=np.int64)
    q[0, 0] = 8
    return encode_jpeg_ycbcr(
        y, cb, cr, width, height, q, q, sampling, restart_interval
    )


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with byte-unstuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed FF
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _HitRestart()
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def restart(self) -> None:
        """Consume an expected RSTn marker and realign, skipping anything
        T.81 allows before it: unconsumed entropy padding, stuffed
        ``FF 00`` pairs (a final padded-to-1s entropy byte is itself
        stuffed), and optional ``FF`` fill bytes."""
        self.acc = 0
        self.nbits = 0
        while True:
            if self.data[self.pos] != 0xFF:
                self.pos += 1
                continue
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed data byte, not a marker
                self.pos += 2
                continue
            if nxt == 0xFF:  # optional fill byte
                self.pos += 1
                continue
            break
        if not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


class _HitRestart(Exception):
    pass


class _HuffTable:
    """Canonical table decoded from a DHT segment: walk one bit at a time
    through (length -> first code, symbols) — O(code length) per symbol,
    fine for fixture-scale images (Arrow batches parallelize across
    executor threads)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.max_code[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, r: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.bits(1)
            if self.max_code[length] >= code >= self.min_code[length]:
                return self.vals[
                    self.val_ptr[length] + code - self.min_code[length]
                ]
        raise ValueError("invalid Huffman code in entropy data")


def _extend(r: _BitReader, t: int) -> int:
    if t == 0:
        return 0
    v = r.bits(t)
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


_SOF_UNSUPPORTED = {
    0xC1: "extended sequential (SOF1)",
    0xC2: "progressive (SOF2)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _decode_block(
    r: _BitReader, dct: _HuffTable, act: _HuffTable, pred: int
) -> tuple[np.ndarray, int]:
    """Entropy-decode one block; returns (zigzag coeffs, new DC pred)."""
    zz = np.zeros(64, dtype=np.int64)
    t = dct.decode(r)
    pred += _extend(r, t)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = act.decode(r)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(r, sym & 0x0F)
        k += 1
    return zz, pred


def _idct_plane(coeffs: np.ndarray) -> np.ndarray:
    """(n_by, n_bx, 8, 8) dequantized coeffs -> rounded uint8-range int64
    sample plane of shape (n_by*8, n_bx*8), via one separable IDCT."""
    n_by, n_bx = coeffs.shape[:2]
    blocks = coeffs.reshape(n_by * n_bx, 8, 8).astype(np.float64)
    spatial = np.einsum("ua,nuv,vb->nab", _IDCT_M, blocks, _IDCT_M)
    px = np.rint(spatial + 128.0).clip(0, 255).astype(np.int64)
    return (
        px.reshape(n_by, n_bx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(n_by * 8, n_bx * 8)
    )


def decode_jpeg(media: bytes) -> np.ndarray:
    """Baseline JPEG -> int64 (h, w) pixel array: grayscale streams return
    the Y plane; 3-component YCbCr streams (4:4:4 / 4:2:2 / 4:2:0 —
    any sampling factors in {1, 2}) are chroma-upsampled, converted to
    RGB, and folded to gray as ``(R+G+B) // 3`` like the repo's other
    color decoders.

    Raises ``NotImplementedError`` for out-of-scope streams (progressive,
    arithmetic, 16-bit, CMYK, sampling factors > 2) — the formal
    codec-boundary contract, mirroring binary_ops.py's PNG/TIFF notes —
    and ``ValueError`` for corrupt or truncated streams (a truncated
    stream must not leak an IndexError past the error contract)."""
    try:
        return _decode_jpeg_impl(bytes(media))
    except IndexError:
        raise ValueError(
            "truncated JPEG stream (ran past end of data)"
        ) from None


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    restart_interval = 0
    width = height = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    scan_tables: dict[int, tuple[int, int]] = {}
    pos = 2
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of optional 0xFF fill bytes may precede
        # a marker code — skip them so conforming padded streams parse
        while data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} decoding is out of scope: "
                "this decoder covers baseline sequential DCT (SOF0) only — "
                "transcode to baseline upstream"
            )
        if marker == 0xD9:  # EOI before SOS: empty image
            raise ValueError("EOI before scan data")
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit quantization tables are out of scope "
                        "(baseline is 8-bit)"
                    )
                t = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    t[ZIGZAG[k]] = body[i + 1 + k]
                qtables[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                tbl = _HuffTable(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = tbl
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise NotImplementedError(
                    "only 8-bit sample precision is in scope"
                )
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            n_comp = body[5]
            if n_comp not in (1, 3):
                raise NotImplementedError(
                    f"{n_comp}-component JPEG is out of scope: grayscale "
                    "(1) and YCbCr (3) only — CMYK/4-component streams "
                    "must be transcoded upstream"
                )
            for c in range(n_comp):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {h}x{v} is out of scope "
                        "(factors of 1 or 2 only: 4:4:4, 4:2:2, 4:2:0)"
                    )
                comps.append((cid, h, v, body[8 + 3 * c]))
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS: entropy data follows
            if body[0] != len(comps):
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline is out of "
                    "scope; single interleaved scan only"
                )
            for c in range(body[0]):
                cid = body[1 + 2 * c]
                tt = body[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
            pos = pos + 2 + seg_len
            break
        # APPn / COM / anything else: skip
        pos = pos + 2 + seg_len

    if not width or not height or not comps:
        raise ValueError("SOS before SOF0")
    max_h = max(h for _, h, _, _ in comps)
    max_v = max(v for _, _, v, _ in comps)
    mcus_x = (width + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (height + 8 * max_v - 1) // (8 * max_v)
    coeffs = {
        cid: np.zeros((mcus_y * v, mcus_x * h, 8, 8), dtype=np.int64)
        for cid, h, v, _ in comps
    }
    r = _BitReader(data, pos)
    preds = {cid: 0 for cid, _, _, _ in comps}
    mcu = 0
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    r.restart()
                    preds = {cid: 0 for cid in preds}
                for cid, h, v, _tq in comps:
                    dct, act = (
                        dc_tables[scan_tables[cid][0]],
                        ac_tables[scan_tables[cid][1]],
                    )
                    for vy in range(v):
                        for vx in range(h):
                            zz, preds[cid] = _decode_block(
                                r, dct, act, preds[cid]
                            )
                            blk = np.zeros(64, dtype=np.int64)
                            blk[ZIGZAG] = zz
                            coeffs[cid][
                                my * v + vy, mx * h + vx
                            ] = blk.reshape(8, 8)
                mcu += 1
    except _HitRestart:
        # keep the module's error contract (ValueError for corrupt
        # streams): a raw RSTn mid-block means the stream's restart
        # cadence disagrees with its DRI declaration
        raise ValueError(
            f"RSTn marker inside entropy data at MCU {mcu} — restart "
            "cadence disagrees with the DRI declaration (corrupt or "
            "non-conforming stream)"
        ) from None

    planes = {}
    for cid, h, v, tq in comps:
        plane = _idct_plane(coeffs[cid] * qtables[tq])
        # nearest-neighbor upsample to full resolution, crop to image
        plane = np.repeat(
            np.repeat(plane, max_v // v, axis=0), max_h // h, axis=1
        )
        planes[cid] = plane[:height, :width]

    if len(comps) == 1:
        return planes[comps[0][0]]
    y, cb, cr = (planes[cid].astype(np.float64) for cid, _, _, _ in comps)
    red = np.rint(y + 1.402 * (cr - 128.0)).clip(0, 255).astype(np.int64)
    grn = (
        np.rint(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
        .clip(0, 255)
        .astype(np.int64)
    )
    blu = np.rint(y + 1.772 * (cb - 128.0)).clip(0, 255).astype(np.int64)
    return (red + grn + blu) // 3


# ---------------------------------------------------------------------------
# Spark plumbing: fixture attach (one Arrow hop, like attach_png_media)
# ---------------------------------------------------------------------------


def attach_jpeg_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL baseline JPEGs from doc ids in one Arrow-batched
    Python hop. Image ``i`` is ``(i%41+24) x (i%29+24)`` (never a multiple
    of 8 for all ids — exercises edge-block padding + crop) built from
    flat 8x8 blocks with value ``(i*7 + bx*13 + by*31) % 200 + 28``;
    every third image carries DRI/RSTn restart markers (interval 4). Flat
    blocks + DC quant step 8 make the decode exact, so the SQL oracle
    recomputes width/height/mean from the same integer formula."""
    from pyspark_graph_spark.multimodal.binary_ops import (
        MEDIA_SCHEMA,
        widen_for_python,
    )

    src = widen_for_python(
        df.select(F.col(id_col).cast("long").alias("media_id"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            medias = []
            metas = []
            for i in b["media_id"]:
                i = int(i)
                w, h = i % 41 + 24, i % 29 + 24
                n_bx, n_by = (w + 7) // 8, (h + 7) // 8
                bx = np.arange(n_bx, dtype=np.int64)
                by = np.arange(n_by, dtype=np.int64)
                vals = (i * 7 + bx[None, :] * 13 + by[:, None] * 31) % 200 + 28
                medias.append(
                    encode_jpeg_gray8_flat(
                        vals, w, h, restart_interval=4 if i % 3 == 0 else 0
                    )
                )
                metas.append(
                    {"format": "jpeg", "width": w, "height": h, "n_frames": 1}
                )
            yield pd.DataFrame(
                {"media_id": b["media_id"], "media": medias, "meta": metas}
            )

    return src.mapInPandas(gen, schema=MEDIA_SCHEMA)


def attach_jpeg_color_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL baseline COLOR JPEGs (3-component YCbCr) from doc
    ids in one Arrow-batched hop. Image ``i`` is ``(i%37+20) x (i%23+18)``
    with 4:2:0 sampling for even ids and 4:4:4 for odd (every fifth image
    adds restart markers, interval 2) — interleaved MCUs, per-component
    DC predictors, chroma upsampling and YCbCr->RGB all execute on
    decode. Y blocks are flat with ``(i*11 + bx*17 + by*23) % 200 + 28``
    and chroma is neutral (Cb = Cr = 128), so R = G = B = Y exactly and
    the SQL oracle recomputes the decoded gray from the Y formula."""
    from pyspark_graph_spark.multimodal.binary_ops import (
        MEDIA_SCHEMA,
        widen_for_python,
    )

    src = widen_for_python(
        df.select(F.col(id_col).cast("long").alias("media_id"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            medias = []
            metas = []
            for i in b["media_id"]:
                i = int(i)
                w, h = i % 37 + 20, i % 23 + 18
                sh, sv = (2, 2) if i % 2 == 0 else (1, 1)
                mcus_x = (w + 8 * sh - 1) // (8 * sh)
                mcus_y = (h + 8 * sv - 1) // (8 * sv)
                n_bx, n_by = mcus_x * sh, mcus_y * sv
                bx = np.arange(n_bx, dtype=np.int64)
                by = np.arange(n_by, dtype=np.int64)
                vals = (
                    i * 11 + bx[None, :] * 17 + by[:, None] * 23
                ) % 200 + 28
                medias.append(
                    encode_jpeg_color_flat(
                        vals,
                        w,
                        h,
                        (sh, sv),
                        restart_interval=2 if i % 5 == 0 else 0,
                    )
                )
                metas.append(
                    {"format": "jpeg", "width": w, "height": h, "n_frames": 1}
                )
            yield pd.DataFrame(
                {"media_id": b["media_id"], "media": medias, "meta": metas}
            )

    return src.mapInPandas(gen, schema=MEDIA_SCHEMA)
