"""GIF decode with only the standard library — real LZW, real container.

Companion to the PGM/BMP/PNG decoders in ``binary_ops.py``: GIF is the one
classic format whose payload needs a genuine dictionary codec (variable-
width LZW, 12-bit cap, clear-code resets, the KwKwK corner case) rather
than filters-over-zlib. Both directions are implemented — the encoder is
what the synthesis path and tests use, the decoder is the product surface —
and the bitstream logic is validated against a well-known hand-assembled
1x1 GIF byte sequence in addition to roundtrips that force code-width
growth and dictionary-full resets.

Boundary contract (mirrors the PNG decoder's explicit rejections):
GIF87a/GIF89a, global or local color table, single image, non-interlaced.
Interlaced images and missing color tables raise ``ValueError`` rather
than decoding wrongly.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAX_CODE = 4096  # GIF LZW codes are capped at 12 bits


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable width, LSB-first packing, clear on full."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> dict:
        return {(i,): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    put(clear, width)
    buf: tuple = ()
    for px in indices:
        px = int(px)
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        put(table[buf], width)
        table[cand] = next_code
        next_code += 1
        # the decoder registers the same entry when it *reads* the code we
        # just wrote, so its counter trails ours by exactly one — growing
        # at next_code == (1 << width) + 1 keeps both sides in lockstep
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= _MAX_CODE:
            put(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (px,)
    if buf:
        put(table[buf], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)]
    table = list(base)
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream (no end-of-information)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= clear:
                raise ValueError("first LZW code after clear must be a literal")
            entry = base[code]
        else:
            if code < next_code:
                # literals live at [0, clear), dictionary entries at
                # [eoi+1, next_code) → list slot clear + (code - eoi - 1)
                entry = (
                    base[code]
                    if code < clear
                    else table[clear + (code - eoi - 1)]
                )
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError(f"LZW code {code} ahead of dictionary")
            if next_code < _MAX_CODE:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry


def _read_color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    flat = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
    if flat.size != 3 * n:
        raise ValueError("truncated color table")
    return flat.reshape(n, 3), pos + 3 * n


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a single-image GIF to an intensity array (palette red
    channel, which equals luminance for the grayscale palettes the
    synthesis path emits)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (packed & 0x07))
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            if pos >= len(data):
                raise ValueError("truncated GIF extension block")
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            ct = gct
            if ipacked & 0x80:
                ct, pos = _read_color_table(data, pos, 2 << (ipacked & 0x07))
            if ct is None:
                raise ValueError("GIF image has no color table")
            if ipacked & 0x40:
                raise ValueError(
                    "interlaced GIF not supported (explicit boundary, "
                    "mirrors the PNG decoder's rejection contract)"
                )
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF data sub-blocks")
                n = data[pos]
                if n == 0:
                    pos += 1
                    break
                if pos + 1 + n > len(data):
                    raise ValueError("truncated GIF data sub-blocks")
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            idx = _lzw_decode(bytes(lzw), mcs)
            if len(idx) < w * h:
                raise ValueError("LZW payload shorter than width*height")
            arr = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8)
            return ct[arr, 0].astype(np.int64).reshape(h, w)
        elif block == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF stream contains no image")


_GRAY4 = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]


def encode_gif(width: int, height: int, indices, palette=None) -> bytes:
    """Assemble a standards-conforming single-image GIF87a stream."""
    palette = palette if palette is not None else _GRAY4
    n = len(palette)
    if n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    k = n.bit_length() - 1  # entries = 2^k
    packed = 0x80 | ((k - 1) << 4) | (k - 1)
    lsd = struct.pack("<HHBBB", width, height, packed, 0, 0)
    gct = b"".join(bytes(c) for c in palette)
    idesc = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    mcs = max(2, k)
    lzw = _lzw_encode(indices, mcs)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        b"GIF87a" + lsd + gct + idesc + bytes([mcs]) + bytes(blocks)
        + b"\x00\x3b"
    )


_MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)


def attach_gif_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL GIF87a streams: ``(id % 24 + 8) x (id % 16 + 8)``
    4-color grayscale images whose pixel ``k`` has palette index
    ``(id + k) % 4`` (intensity ``index * 85``), LZW-compressed by the real
    encoder above. One Arrow-batched Python hop (the LZW bit-packing has
    no JVM expression form, unlike the PGM header path); features stay
    integer-replayable by an external oracle."""
    from pyspark_graph_spark.multimodal.binary_ops import widen_for_python

    ids = widen_for_python(
        df.select(F.col(id_col).cast("long").alias("media_id"))
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = mid % 24 + 8, mid % 16 + 8
                idx = [(mid + kk) % 4 for kk in range(w * h)]
                rows.append(
                    (mid, encode_gif(w, h, idx), ("gif", w, h, 1))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "media", "meta"]
            )

    return ids.mapInPandas(synth, _MEDIA_SCHEMA)
