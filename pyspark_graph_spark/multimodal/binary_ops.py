"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema contracts, Arrow-batched
``mapInPandas`` operators, partition sizing notes. Real decoding is
implemented in pure NumPy for the uncompressed formats (PNM ``P5``/``P6``
and 24-bit BI_RGB ``BMP`` — header parse + payload reshape, no image
library needed); compressed formats (png/jpeg/...) route to ``pillow`` when
installed and raise a clear ``NotImplementedError`` otherwise (this
container has no codec libraries). The deterministic ``fake`` format keeps
the pipeline executable with arbitrary bytes.

Design rules for 100 TB media processing encoded here:

- media stays an opaque ``binary`` column with a ``meta`` struct; nothing
  JVM-side ever interprets the bytes
- Python work is Arrow-batched ``mapInPandas`` (never row-at-a-time UDFs);
  batch size is bounded by bytes not rows —
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` and
  ``spark.sql.files.maxPartitionBytes`` are the knobs
- decode→feature in a single pass (one Python hop), never
  decode-then-shuffle-pixels
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real codec, if present (not in this container)
    from PIL import Image as _PIL_Image
except ImportError:  # pragma: no cover
    _PIL_Image = None

MEDIA_SCHEMA = StructType(
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

_DECODED_FIELDS = [
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_intensity", LongType()),
]


# widen_for_python started life here gating the media codec hop; the
# implementation now lives in functions/widen.py (it guards every
# CPU-heavy single-split stage: codecs, shingling, CDC chunking, LSH
# sketch explodes). Re-exported for backward compatibility.
from pyspark_graph_spark.functions.widen import (  # noqa: F401
    _BARE_SCAN_NODES,
    _is_bare_scan,
    widen_for_python,
)


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize a deterministic binary media column + meta struct from an
    id column (test/bench stand-in for real blob ingestion)."""
    df = widen_for_python(df)
    rep = F.sha2(F.col(id_col).cast("string"), 256)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.repeat(rep, 4), "UTF-8").alias("media"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.pmod(F.col(id_col), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) + 16).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def attach_pgm_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL binary PGM (``P5``) images entirely JVM-side: header
    ``P5\\n<w> <h>\\n255\\n`` followed by a ``w*h`` byte payload where byte
    ``k`` is ``(id + k) % 256`` — built with ``sequence``/``transform``/
    ``unhex`` so ingestion needs no Python, and the downstream decode is a
    genuine header-parse + reshape of a standards-conforming stream whose
    features an integer-only SQL oracle can recompute."""
    df = widen_for_python(df)
    i = F.col(id_col).cast("long")
    w = (F.pmod(i, F.lit(48)) + 16).cast("int")
    h = (F.pmod(i, F.lit(32)) + 16).cast("int")
    header = F.encode(
        F.concat(
            F.lit("P5\n"),
            w.cast("string"),
            F.lit(" "),
            h.cast("string"),
            F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    payload = F.unhex(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (w * h).cast("long") - 1),
                lambda k: F.lpad(F.hex(F.pmod(i + k, F.lit(256))), 2, "0"),
            ),
            "",
        )
    )
    return df.select(
        i.alias("media_id"),
        F.concat(header, payload).alias("media"),
        F.struct(
            F.lit("pgm").alias("format"),
            w.alias("width"),
            h.alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(media: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-pixels from the bytes (no codec needed)."""
    raw = np.frombuffer(media, dtype=np.uint8)
    reps = int(np.ceil(width * height / max(len(raw), 1)))
    return np.tile(raw, reps)[: width * height].reshape(height, width)


_PNM_HEADER = re.compile(
    rb"^(P[56])[ \t\r\n]+(\d+)[ \t\r\n]+(\d+)[ \t\r\n]+(\d+)[ \t\r\n]"
)


def _decode_pnm(media: bytes) -> np.ndarray:
    """Real decode of binary PNM (``P5`` graymap / ``P6`` pixmap): parse the
    ASCII header for magic, width, height, maxval, then reshape the raw
    payload. Dimensions come from the BYTES, not the metadata. Returns a
    2-D int64 intensity array (P6 intensity = integer mean of R,G,B)."""
    m = _PNM_HEADER.match(media)
    if not m:
        raise ValueError("not a binary PNM (P5/P6) stream")
    magic, w, h, maxval = (
        m.group(1),
        int(m.group(2)),
        int(m.group(3)),
        int(m.group(4)),
    )
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    payload = media[m.end() :]
    if magic == b"P5":
        if len(payload) < w * h:
            raise ValueError("truncated P5 payload")
        return (
            np.frombuffer(payload[: w * h], dtype=np.uint8)
            .reshape(h, w)
            .astype(np.int64)
        )
    if len(payload) < w * h * 3:
        raise ValueError("truncated P6 payload")
    rgb = (
        np.frombuffer(payload[: w * h * 3], dtype=np.uint8)
        .reshape(h, w, 3)
        .astype(np.int64)
    )
    return rgb.sum(axis=2) // 3


def _decode_bmp(media: bytes) -> np.ndarray:
    """Real decode of uncompressed 24-bit BI_RGB BMP: little-endian header
    fields, bottom-up rows padded to 4-byte boundaries. Returns a 2-D
    int64 intensity array (integer mean of R,G,B), top-down."""
    if media[:2] != b"BM":
        raise ValueError("not a BMP stream")
    offset = int.from_bytes(media[10:14], "little")
    w = int.from_bytes(media[18:22], "little", signed=True)
    h = int.from_bytes(media[22:26], "little", signed=True)
    bpp = int.from_bytes(media[28:30], "little")
    compression = int.from_bytes(media[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(media) < offset + stride * h:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(
        media[offset : offset + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * 3]
    bgr = rows.reshape(h, w, 3).astype(np.int64)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr.sum(axis=2) // 3


def _decode_any(media: bytes, meta) -> np.ndarray:
    """Sniff the container from the leading bytes; fall back to the fake
    codec only when the metadata explicitly says so."""
    head = bytes(media[:2])
    if head in (b"P5", b"P6"):
        return _decode_pnm(media)
    if head == b"BM":
        return _decode_bmp(media)
    if bytes(media[:8]) == b"\x89PNG\r\n\x1a\n":
        return _decode_png(media)
    if bytes(media[:4]) == b"GIF8":
        from pyspark_graph_spark.multimodal.gif_ops import decode_gif

        return decode_gif(bytes(media))
    if bytes(media[:4]) in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(bytes(media))
    if head == b"\xff\xd8":
        from pyspark_graph_spark.multimodal.jpeg_ops import decode_jpeg

        return decode_jpeg(bytes(media))
    if meta["format"] == "fake":
        return _fake_decode(media, meta["width"], meta["height"])
    if _PIL_Image is not None:  # pragma: no cover - pillow not in container
        import io

        return (
            np.asarray(_PIL_Image.open(io.BytesIO(media)).convert("L"))
            .astype(np.int64)
        )
    raise NotImplementedError(
        f"decoding format {meta['format']!r} requires an image codec "
        "(pillow) which is not installed; built-in support covers "
        "PNM (P5/P6), 24-bit BMP, and 'fake'"
    )


def decode_images(media_df: DataFrame) -> DataFrame:
    """media rows -> (media_id, width, height, mean_intensity).

    Arrow-batched ``mapInPandas``: one Python hop, decode + reduce to
    features in the same pass (pixels never cross back to the JVM).
    """
    schema = StructType(_DECODED_FIELDS)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = _decode_any(bytes(row.media), row.meta)
                # integer mean (sum // size): exact, overflow-free, and
                # reproducible by integer-only external oracles — float
                # means can round across an integer boundary
                out.append(
                    (
                        row.media_id,
                        px.shape[1],
                        px.shape[0],
                        int(px.sum()) // px.size,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in _DECODED_FIELDS]
            )

    return media_df.mapInPandas(decode, schema)


def image_stats(media_df: DataFrame) -> DataFrame:
    """Pure-JVM metadata stats — no decode, no Python: the cheap pre-filter
    you run *before* paying for decoding."""
    return media_df.select(
        "media_id",
        F.length("media").alias("n_bytes"),
        F.col("meta.format").alias("format"),
        (F.col("meta.width") * F.col("meta.height")).alias("n_pixels"),
    )


def resize_images(media_df: DataFrame, target: int = 16) -> DataFrame:
    """Decode + resize (area-mean downsample) + re-encode features in one
    Python pass. Returns (media_id, width, height, mean_intensity) of the
    resized frame."""
    schema = StructType(_DECODED_FIELDS)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = _decode_any(bytes(row.media), row.meta)
                ph = (px.shape[0] // target) * target
                pw = (px.shape[1] // target) * target
                small = (
                    px[:ph, :pw]
                    .reshape(target, ph // target, target, pw // target)
                    .mean(axis=(1, 3))
                    if ph >= target and pw >= target
                    else px
                )
                out.append(
                    (
                        row.media_id,
                        int(small.shape[1]),
                        int(small.shape[0]),
                        int(small.mean()),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in _DECODED_FIELDS]
            )

    return media_df.mapInPandas(resize, schema)


def thumbnail_images(media_df: DataFrame, target: int = 4) -> DataFrame:
    """Nearest-neighbor thumbnail in the decode pass: sample the pixel at
    (floor(i*h/T), floor(j*w/T)) for each thumbnail cell — the stride
    arithmetic every image-resize pipeline stage gets wrong first.

    Returns (media_id, width, height, thumb_sum, top_left, bottom_right):
    integer features of the T×T thumbnail (sum of sampled pixels + the two
    corner samples), so an integer-only oracle can replay the exact picks.
    One Arrow hop; pixels never return to the JVM.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("thumb_sum", LongType()),
            StructField("top_left", IntegerType()),
            StructField("bottom_right", IntegerType()),
        ]
    )

    def thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = _decode_any(bytes(row.media), row.meta)
                if px.ndim == 3:  # RGB(A): first channel, keeps ints exact
                    px = px[:, :, 0]
                h, w = px.shape[0], px.shape[1]
                rows = [(i * h) // target for i in range(target)]
                cols = [(j * w) // target for j in range(target)]
                small = px[np.ix_(rows, cols)]
                out.append(
                    (
                        row.media_id,
                        w,
                        h,
                        int(small.sum()),
                        int(small[0, 0]),
                        int(small[-1, -1]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "thumb_sum",
                    "top_left",
                    "bottom_right",
                ],
            )

    return media_df.mapInPandas(thumb, schema)


def frame_sample(media_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-style frame sampling: JVM-side sequence expansion (frame index
    column) — the decode of *selected* frames would then go through
    ``decode_images``. No Python involved in the sampling itself."""
    return media_df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("meta.n_frames") - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def attach_pgm_video(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL multi-frame "video" streams JVM-side: the media blob
    is ``n_frames`` back-to-back binary PGM (P5) frames (the moral
    equivalent of raw MJPEG — each frame independently standards-
    conforming). Frame ``f`` pixel ``k`` is ``(id + 7*f + k) % 256``, so
    frames differ and an integer-only oracle can recompute per-frame
    features. Small frames (8-31 px sides), 2-5 frames per id."""
    df = widen_for_python(df)
    i = F.col(id_col).cast("long")
    w = (F.pmod(i, F.lit(24)) + 8).cast("int")
    h = (F.pmod(i, F.lit(16)) + 8).cast("int")
    n_frames = (F.pmod(i, F.lit(4)) + 2).cast("int")
    header_hex = F.hex(
        F.encode(
            F.concat(
                F.lit("P5\n"),
                w.cast("string"),
                F.lit(" "),
                h.cast("string"),
                F.lit("\n255\n"),
            ),
            "UTF-8",
        )
    )
    frame_hex = lambda f: F.array_join(  # noqa: E731
        F.transform(
            F.sequence(F.lit(0), (w * h).cast("long") - 1),
            lambda k: F.lpad(
                F.hex(F.pmod(i + f * 7 + k, F.lit(256))), 2, "0"
            ),
        ),
        "",
    )
    media_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_frames.cast("long") - 1),
            lambda f: F.concat(header_hex, frame_hex(f)),
        ),
        "",
    )
    return df.select(
        i.alias("media_id"),
        F.unhex(media_hex).alias("media"),
        F.struct(
            F.lit("pgm-seq").alias("format"),
            w.alias("width"),
            h.alias("height"),
            n_frames.alias("n_frames"),
        ).alias("meta"),
    )


_FRAME_FIELDS = [
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_intensity", LongType()),
]


def extract_frames(media_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampled video decode: split the concatenated-P5 stream into
    frames by walking successive headers (sizes come from the BYTES),
    decode only frames ``0, every_n, 2*every_n, ...`` and reduce each to
    features — all in ONE Arrow ``mapInPandas`` hop per media row.

    At 100 TB this is the right fusion: sampling decides *inside* the
    single Python pass, skipped frames are never materialized as arrays,
    and nothing pixel-shaped crosses back to the JVM.
    """
    schema = StructType(_FRAME_FIELDS)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                media = bytes(row.media)
                pos, frame_idx = 0, 0
                while pos < len(media):
                    m = _PNM_HEADER.match(media[pos:])
                    if not m:
                        raise ValueError(
                            f"bad frame header at offset {pos}"
                        )
                    w, h = int(m.group(2)), int(m.group(3))
                    end = pos + m.end() + w * h
                    if frame_idx % every_n == 0:
                        px = _decode_pnm(media[pos:end])
                        out.append(
                            (
                                row.media_id,
                                frame_idx,
                                w,
                                h,
                                int(px.sum()) // px.size,
                            )
                        )
                    pos, frame_idx = end, frame_idx + 1
                if frame_idx == 0:
                    raise ValueError("no frames in stream")
            yield pd.DataFrame(
                out, columns=[f.name for f in _FRAME_FIELDS]
            )

    return media_df.mapInPandas(decode, schema)


# --------------------------------------------------------------------- png


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _encode_png_gray8(pixels: "np.ndarray") -> bytes:
    """Standards-conforming 8-bit grayscale PNG, cycling scanline filters
    0..4 row-by-row so a decoder must implement ALL five reconstructions
    (None, Sub, Up, Average, Paeth) to get the pixels back."""
    import struct
    import zlib as _zlib

    h, w = pixels.shape
    px = pixels.astype(np.int64)
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for r in range(h):
        row = px[r]
        f = r % 5
        if f == 0:
            out = row
        elif f == 1:  # Sub
            left = np.concatenate(([0], row[:-1]))
            out = row - left
        elif f == 2:  # Up
            out = row - prev
        elif f == 3:  # Average
            left = np.concatenate(([0], row[:-1]))
            out = row - (left + prev) // 2
        else:  # Paeth
            left = np.concatenate(([0], row[:-1]))
            upleft = np.concatenate(([0], prev[:-1]))
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prev),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = row - pred
        raw.append(f)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(media: bytes) -> "np.ndarray":
    """Real decode of non-interlaced 8-bit PNG (grayscale or RGB) with
    only the standard library: chunk walk, zlib inflate, then the five
    scanline filter reconstructions (per-row vectorized where the filter
    allows; Sub/Average/Paeth carry an in-row sequential dependency, so
    those rows reconstruct byte-by-byte — fine for the bounded image
    sizes this plumbing targets; a SIMD unfilter drops in unchanged).
    Returns 2-D int64 intensity (RGB -> integer mean)."""
    import struct
    import zlib as _zlib

    if media[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos < len(media):
        (length,) = struct.unpack(">I", media[pos : pos + 4])
        tag = media[pos + 4 : pos + 8]
        body = media[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in (0, 2, 3):
        # formal boundary contract: 8-bit non-interlaced grayscale (0),
        # RGB (2) and palette (3) streams decode; 16-bit, interlaced and
        # alpha color types are rejected loudly, never mis-decoded
        raise NotImplementedError(
            "only non-interlaced 8-bit grayscale/RGB/palette PNG supported "
            f"(depth={depth}, color={color}, interlace={interlace})"
        )
    if color == 3 and (plte is None or len(plte) == 0 or len(plte) % 3 != 0):
        raise ValueError("palette PNG missing or invalid PLTE chunk")
    ch = 3 if color == 2 else 1
    stride = w * ch
    try:
        raw = _zlib.decompress(bytes(idat))
    except _zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        base = r * (stride + 1)
        f = raw[base]
        row = np.frombuffer(
            raw[base + 1 : base + 1 + stride], dtype=np.uint8
        ).astype(np.int64)
        if f == 0:
            rec = row
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f in (1, 3, 4):
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                up = prev[x]
                upleft = prev[x - ch] if x >= ch else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else (up if pb <= pc else upleft)
                    )
                rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[r] = rec
        prev = rec
    if color == 3:
        pal = (
            np.frombuffer(plte, dtype=np.uint8)
            .reshape(-1, 3)
            .astype(np.int64)
        )
        if out.max(initial=0) >= len(pal):
            raise ValueError("palette index out of PLTE range")
        return pal[out].sum(axis=2) // 3
    if ch == 1:
        return out
    return out.reshape(h, w, 3).sum(axis=2) // 3


def attach_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL 8-bit grayscale PNGs (zlib-compressed, filter types
    cycling 0-4 per row) from doc ids via one Arrow-batched Python hop —
    PNG needs zlib + CRC32, which no JVM expression provides. Pixel ``k``
    is ``(id + k) % 256`` over a ``(id%48+16) x (id%32+16)`` image, the
    same integer formula as the PGM fixtures, so the SQL oracle recomputes
    every decoded feature."""
    src = widen_for_python(
        df.select(F.col(id_col).cast("long").alias("media_id"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            medias = []
            metas = []
            for i in b["media_id"]:
                i = int(i)
                w, h = i % 48 + 16, i % 32 + 16
                px = (i + np.arange(w * h, dtype=np.int64)).reshape(h, w) % 256
                medias.append(_encode_png_gray8(px))
                metas.append(
                    {"format": "png", "width": w, "height": h, "n_frames": 1}
                )
            yield pd.DataFrame(
                {"media_id": b["media_id"], "media": medias, "meta": metas}
            )

    return src.mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# TIFF (baseline gray8, uncompressed, little-endian) — real IFD container
# ---------------------------------------------------------------------------


def _le16(x):
    """Little-endian u16 hex string of an int column."""
    hx = F.lpad(F.hex(x), 4, "0")
    return F.concat(F.substring(hx, 3, 2), F.substring(hx, 1, 2))


def _le32(x):
    """Little-endian u32 hex string of an int column."""
    hx = F.lpad(F.hex(x), 8, "0")
    return F.concat(
        F.substring(hx, 7, 2),
        F.substring(hx, 5, 2),
        F.substring(hx, 3, 2),
        F.substring(hx, 1, 2),
    )


def _ifd_entry(tag: int, typ: int, value):
    """One 12-byte IFD entry (count=1) as a hex string; SHORT values sit
    in the low 2 bytes of the 4-byte value slot (little-endian)."""
    val = (
        F.concat(_le16(value), F.lit("0000"))
        if typ == 3
        else _le32(value)
    )
    return F.concat(
        _le16(F.lit(tag)), _le16(F.lit(typ)), _le32(F.lit(1)), val
    )


def attach_tiff_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL little-endian baseline TIFF streams JVM-side:
    ``II*\\0`` header, pixel strip at offset 8 (byte k = (id+k) % 256, the
    same closed form as the PGM twin), and a 9-entry IFD (width, length,
    bits=8, compression=1, photometric=1, strip offset/bytecount,
    rows-per-strip, samples=1) AFTER the strip. Every multi-byte integer
    is hand-assembled little-endian from hex — the decoder must walk the
    IFD for real."""
    df = widen_for_python(df)
    i = F.col(id_col).cast("long")
    w = (F.pmod(i, F.lit(40)) + 16).cast("int")
    h = (F.pmod(i, F.lit(24)) + 16).cast("int")
    n = (w * h).cast("long")
    ifd_off = (n + 8).cast("long")
    payload_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda k: F.lpad(F.hex(F.pmod(i + k, F.lit(256))), 2, "0"),
        ),
        "",
    )
    entries = [
        _ifd_entry(256, 3, w),            # ImageWidth
        _ifd_entry(257, 3, h),            # ImageLength
        _ifd_entry(258, 3, F.lit(8)),     # BitsPerSample
        _ifd_entry(259, 3, F.lit(1)),     # Compression = none
        _ifd_entry(262, 3, F.lit(1)),     # Photometric = BlackIsZero
        _ifd_entry(273, 4, F.lit(8)),     # StripOffsets
        _ifd_entry(277, 3, F.lit(1)),     # SamplesPerPixel
        _ifd_entry(278, 3, h),            # RowsPerStrip
        _ifd_entry(279, 4, n),            # StripByteCounts
    ]
    ifd_hex = F.concat(
        _le16(F.lit(len(entries))), *entries, F.lit("00000000")
    )
    stream_hex = F.concat(
        F.lit("49492A00"),  # II, 42
        _le32(ifd_off),
        payload_hex,
        ifd_hex,
    )
    return df.select(
        i.alias("media_id"),
        F.unhex(stream_hex).alias("media"),
        F.struct(
            F.lit("tiff").alias("format"),
            w.alias("width"),
            h.alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_tiff(media: bytes) -> np.ndarray:
    """Real baseline-TIFF decode: byte order, IFD walk, tag table, strip
    read. Supports single-strip uncompressed 8-bit grayscale (both byte
    orders); anything else raises the documented codec boundary."""
    import struct

    bo = bytes(media[:2])
    if bo == b"II":
        end = "<"
    elif bo == b"MM":
        end = ">"
    else:
        raise ValueError("not a TIFF stream")
    (magic,) = struct.unpack(end + "H", media[2:4])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack(end + "I", media[4:8])
    (n_entries,) = struct.unpack(
        end + "H", media[ifd_off : ifd_off + 2]
    )
    tags: dict[int, int] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + 12 * e
        tag, typ, cnt = struct.unpack(end + "HHI", media[off : off + 8])
        if cnt != 1:
            raise NotImplementedError("multi-value TIFF tags unsupported")
        if typ == 3:  # SHORT in the low half of the value slot
            (val,) = struct.unpack(end + "H", media[off + 8 : off + 10])
        elif typ == 4:  # LONG
            (val,) = struct.unpack(end + "I", media[off + 8 : off + 12])
        else:
            raise NotImplementedError(f"TIFF tag type {typ} unsupported")
        tags[tag] = val
    if tags.get(259, 1) != 1:
        raise NotImplementedError("compressed TIFF unsupported")
    if tags.get(258, 8) != 8 or tags.get(277, 1) != 1:
        raise NotImplementedError("only 8-bit single-sample TIFF supported")
    w, h = tags[256], tags[257]
    s_off, s_cnt = tags[273], tags[279]
    if s_cnt != w * h:
        raise ValueError("strip byte count does not match dimensions")
    px = np.frombuffer(
        bytes(media[s_off : s_off + s_cnt]), dtype=np.uint8
    )
    return px.reshape(h, w).astype(np.int64)


def perceptual_ahash(media_df: DataFrame, target: int = 4) -> DataFrame:
    """Average-hash (aHash) per media row: nearest-neighbor T×T
    thumbnail inside the decode pass, bit i set iff pixel_i >= the
    integer thumbnail mean, packed MSB-first into one long — the
    image-dedup key (hamming-near keys ⇒ visually near images; bucket
    join on the key like SimHash text dedup). One Arrow hop."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("ahash", LongType()),
        ]
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = _decode_any(bytes(row.media), row.meta)
                if px.ndim == 3:
                    px = px[:, :, 0]
                h, w = px.shape
                rows = [(i * h) // target for i in range(target)]
                cols = [(j * w) // target for j in range(target)]
                thumb = px[np.ix_(rows, cols)].ravel()
                mean = int(thumb.sum()) // (target * target)
                bits = 0
                for v in thumb:
                    bits = bits * 2 + (1 if int(v) >= mean else 0)
                out.append((row.media_id, bits))
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    return media_df.mapInPandas(fold, schema)


def shot_boundaries(
    media_df: DataFrame, threshold_x10: int = 136
) -> DataFrame:
    """Shot-boundary detection over concatenated-P5 video streams: decode
    EVERY frame (same header walk as ``extract_frames``), compute the
    integer sum of absolute pixel differences for each consecutive frame
    pair, and flag pairs whose mean abs diff exceeds threshold_x10/10 —
    the cut detector every video-curation pipeline runs first. The
    comparison is integer-exact (sum·10 > threshold_x10·w·h), so an
    external oracle replays it with no float anywhere. One Arrow hop;
    only two frames are ever held at once."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("sum_abs_diff", LongType()),
            StructField("is_boundary", BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                media = bytes(row.media)
                pos, idx = 0, 0
                prev = None
                while pos < len(media):
                    m = _PNM_HEADER.match(media[pos:])
                    if not m:
                        raise ValueError(
                            f"bad frame header at offset {pos}"
                        )
                    w, h = int(m.group(2)), int(m.group(3))
                    end = pos + m.end() + w * h
                    px = _decode_pnm(media[pos:end])
                    if prev is not None:
                        sad = int(np.abs(px - prev).sum())
                        out.append(
                            (
                                row.media_id,
                                idx,
                                sad,
                                sad * 10 > threshold_x10 * w * h,
                            )
                        )
                    prev = px
                    pos, idx = end, idx + 1
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "frame_idx",
                    "sum_abs_diff",
                    "is_boundary",
                ],
            )

    return media_df.mapInPandas(run, schema)
