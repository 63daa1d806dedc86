"""Audio columns: opaque binary WAV (RIFF/PCM) + pure-NumPy decode.

Mirrors the image side (``binary_ops.py``): audio stays an opaque
``binary`` column; the only Python hop is one Arrow-batched ``mapInPandas``
that parses the RIFF container, walks its chunks, and reduces PCM samples
to features in the same pass — waveforms never cross back to the JVM.

The generator builds standards-conforming 44-byte-header PCM16 mono WAV
streams entirely JVM-side (``concat``/``unhex`` little-endian encoding —
no Python in ingestion), with payload sample ``k`` equal to
``((id*31 + k*7) % 201) - 100``, so an integer-only SQL oracle can
recompute every decoded feature. A wrong chunk walk, endianness, or width
shows up as a value mismatch, exactly like the PGM image gate.

100 TB notes: identical to images — bound Arrow batches by bytes
(``spark.sql.execution.arrow.maxRecordsPerBatch`` /
``spark.sql.files.maxPartitionBytes``), decode→feature in one pass, keep
the cheap metadata pre-filter (``audio_stats``) JVM-side so most rows
never pay for Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

WAV_SAMPLE_RATE = 8000

_AUDIO_FIELDS = [
    StructField("media_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("mean_abs", LongType()),
    StructField("n_sign_changes", LongType()),
]


def _le_hex(value: Column, n_bytes: int) -> Column:
    """Hex string of ``value`` as an n-byte little-endian integer."""
    be = F.lpad(F.hex(value.cast("long")), 2 * n_bytes, "0")
    return F.concat(
        *[
            F.substring(be, 2 * n_bytes - 2 * i - 1, 2)
            for i in range(n_bytes)
        ]
    )


def attach_wav_media(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize REAL PCM16 mono WAV streams JVM-side from an id column.

    ``n = (id % 192) + 64`` samples at 8 kHz; sample ``k`` is
    ``((id*31 + k*7) % 201) - 100`` (full sign coverage, lots of zero
    crossings). The 44-byte canonical header (RIFF size, fmt chunk,
    byte-rate, block-align, data size) is assembled field-by-field with
    little-endian ``unhex`` encoding — the decoder must genuinely parse it.
    """
    from pyspark_graph_spark.multimodal.binary_ops import widen_for_python

    df = widen_for_python(df)
    i = F.col(id_col).cast("long")
    n = (F.pmod(i, F.lit(192)) + 64).cast("long")
    sr = F.lit(WAV_SAMPLE_RATE).cast("long")
    header = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        F.unhex(_le_hex(F.lit(36) + n * 2, 4)),  # riff chunk size
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        F.unhex(_le_hex(F.lit(16), 4)),          # fmt chunk size
        F.unhex(_le_hex(F.lit(1), 2)),           # audio format = PCM
        F.unhex(_le_hex(F.lit(1), 2)),           # channels = mono
        F.unhex(_le_hex(sr, 4)),                 # sample rate
        F.unhex(_le_hex(sr * 2, 4)),             # byte rate
        F.unhex(_le_hex(F.lit(2), 2)),           # block align
        F.unhex(_le_hex(F.lit(16), 2)),          # bits per sample
        F.encode(F.lit("data"), "UTF-8"),
        F.unhex(_le_hex(n * 2, 4)),              # data chunk size
    )
    sample = lambda k: F.pmod(i * 31 + k * 7, F.lit(201)) - 100  # noqa: E731
    payload = F.unhex(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0).cast("long"), n - 1),
                # int16 two's complement, little-endian byte order
                lambda k: F.concat(
                    *[
                        F.substring(
                            F.lpad(
                                F.hex(
                                    F.pmod(sample(k) + 65536, F.lit(65536))
                                ),
                                4,
                                "0",
                            ),
                            p,
                            2,
                        )
                        for p in (3, 1)
                    ]
                ),
            ),
            "",
        )
    )
    return df.select(
        i.alias("media_id"),
        F.concat(header, payload).alias("media"),
        F.struct(
            F.lit("wav").alias("format"),
            n.cast("int").alias("n_samples"),
            F.lit(WAV_SAMPLE_RATE).alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_wav(media: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE stream: verify the container magic, walk chunks to
    ``fmt `` and ``data`` (arbitrary chunk order/extras tolerated, as the
    spec allows), return (sample_rate, int16 sample array). Everything is
    read from the BYTES — the meta struct is never trusted."""
    if media[:4] != b"RIFF" or media[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sample_rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(media):
        cid = media[pos : pos + 4]
        size = int.from_bytes(media[pos + 4 : pos + 8], "little")
        body = media[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise NotImplementedError(
                    f"only PCM (format 1) supported, got {fmt}"
                )
            channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16 or channels != 1:
        raise NotImplementedError(
            f"only 16-bit mono supported (bits={bits}, channels={channels})"
        )
    return sample_rate, np.frombuffer(data, dtype="<i2")


def decode_audio(media_df: DataFrame) -> DataFrame:
    """media rows -> (media_id, n_samples, sample_rate, mean_abs,
    n_sign_changes).

    ``mean_abs`` is the integer mean of |sample| (sum // n: exact,
    reproducible by integer-only oracles); ``n_sign_changes`` counts strict
    sign flips between consecutive samples (zero-crossing rate, the classic
    cheap voiced/unvoiced signal). One Arrow hop, decode + reduce fused.
    """
    schema = StructType(_AUDIO_FIELDS)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                sr, s = _decode_wav(bytes(row.media))
                x = s.astype(np.int64)
                sign = np.sign(x)
                out.append(
                    (
                        row.media_id,
                        len(x),
                        sr,
                        int(np.abs(x).sum()) // max(len(x), 1),
                        int((sign[:-1] * sign[1:] == -1).sum()),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in _AUDIO_FIELDS]
            )

    return media_df.mapInPandas(decode, schema)


def audio_stats(media_df: DataFrame) -> DataFrame:
    """JVM-side metadata stats (no decode, no Python): the cheap pre-filter
    before paying for Python decoding — e.g. drop sub-second clips."""
    return media_df.select(
        "media_id",
        F.length("media").alias("n_bytes"),
        F.col("meta.format").alias("format"),
        (
            F.col("meta.n_samples").cast("double")
            / F.col("meta.sample_rate")
        ).alias("duration_sec"),
    )


def spectral_features(
    media_df: DataFrame, frame: int = 64, bins: tuple = (0, 1, 4, 8)
) -> DataFrame:
    """Framed DFT-bin power spectrum — the audio feature-extraction stage.

    Decodes the WAV payload (really: ``_decode_wav`` walks the RIFF
    chunks), splits samples into non-overlapping ``frame``-sample windows
    (trailing remainder dropped), and for each requested DFT bin ``b``
    accumulates per-frame power

        P_b = Σ_frames [ (Σ_k x_k cos(2πbk/N))² + (Σ_k x_k sin(2πbk/N))² ]

    — a direct Goertzel-style projection, vectorized in NumPy inside one
    Arrow-batched ``mapInPandas`` hop. A handful of named bins (DC, low,
    mid, high) is the classic cheap spectral fingerprint for corpus
    filtering; full FFTs only pay off once you need every bin.

    Trig arguments are formed left-associatively (``2π·b·k / N``) so an
    external engine evaluating the identical expression reproduces each
    term bit-for-bit; power sums are stable to ~1e-7 relative across
    summation orders and are rounded to 4 decimals.

    Returns ``(media_id, n_frames, p<b>...)``.
    """
    fields = [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
    ] + [StructField(f"p{b}", DoubleType()) for b in bins]
    schema = StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(frame)
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                _sr, x = _decode_wav(bytes(row.media))
                nfr = len(x) // frame
                xf = x[: nfr * frame].astype(np.float64).reshape(nfr, frame)
                rec = [int(row.media_id), int(nfr)]
                for b in bins:
                    ang = 2 * np.pi * b * k / frame
                    c = (xf * np.cos(ang)).sum(axis=1)
                    s = (xf * np.sin(ang)).sum(axis=1)
                    rec.append(round(float((c * c + s * s).sum()), 4))
                out.append(tuple(rec))
            yield pd.DataFrame(out, columns=[f.name for f in fields])

    return media_df.mapInPandas(run, schema)


def spectral_fingerprint(
    media_df: DataFrame,
    frame: int = 64,
    bins: tuple = (1, 4, 8),
    max_frames: int = 4,
) -> DataFrame:
    """Shazam-style spectral-delta fingerprint: for each consecutive
    frame pair and each landmark bin, one bit records whether that
    band's power ROSE — the sign pattern survives volume changes and
    re-encoding, which is why delta-coding is the standard audio
    fingerprint trick. Bits fold MSB-first in (frame, bin) order into a
    single long; per-frame powers are rounded to 4 decimals BEFORE the
    comparison so engines disagreeing by an ulp cannot flip a bit.

    Returns (media_id, n_frames_used, fingerprint). One Arrow hop.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_frames_used", IntegerType()),
            StructField("fingerprint", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(frame)
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                _sr, x = _decode_wav(bytes(row.media))
                nfr = min(len(x) // frame, max_frames)
                xf = (
                    x[: nfr * frame]
                    .astype(np.float64)
                    .reshape(nfr, frame)
                )
                powers = {}
                for b in bins:
                    ang = 2 * np.pi * b * k / frame
                    c = (xf * np.cos(ang)).sum(axis=1)
                    s = (xf * np.sin(ang)).sum(axis=1)
                    powers[b] = [round(float(v), 4) for v in c * c + s * s]
                bits = 0
                for f in range(1, nfr):
                    for b in bins:
                        bits = bits * 2 + (
                            1 if powers[b][f] > powers[b][f - 1] else 0
                        )
                out.append((int(row.media_id), int(nfr), bits))
            yield pd.DataFrame(
                out, columns=["media_id", "n_frames_used", "fingerprint"]
            )

    return media_df.mapInPandas(run, schema)
