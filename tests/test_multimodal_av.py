"""Audio (WAV) and video (concatenated-P5) decode: parser correctness
against hand-built Python streams, robustness to container variations the
JVM generator never produces, and feature parity with NumPy oracles."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.multimodal import (
    attach_pgm_video,
    attach_wav_media,
    audio_stats,
    decode_audio,
    extract_frames,
)
from pyspark_graph_spark.multimodal.audio_ops import _decode_wav
from pyspark_graph_spark.multimodal.binary_ops import _decode_pnm


def py_wav(samples, sample_rate=8000, extra_chunk=False):
    """Reference WAV writer (struct-based, independent of the Spark one)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    chunks = b""
    if extra_chunk:  # LIST chunk before fmt — spec-legal, must be skipped
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += (
        b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decoder_parses_reference_stream():
    samples = [0, 5, -3, -3, 100, -100, 0, 7]
    sr, got = _decode_wav(py_wav(samples, sample_rate=44100))
    assert sr == 44100
    assert got.tolist() == samples


def test_wav_decoder_skips_extra_chunks():
    samples = [-1, 2, -2]
    _, got = _decode_wav(py_wav(samples, extra_chunk=True))
    assert got.tolist() == samples


def test_wav_decoder_rejects_garbage_and_nonpcm():
    with pytest.raises(ValueError):
        _decode_wav(b"OggS" + b"\x00" * 60)
    bad = bytearray(py_wav([1, 2, 3]))
    bad[20] = 3  # audio format = IEEE float
    with pytest.raises(NotImplementedError):
        _decode_wav(bytes(bad))


def test_spark_generated_wav_is_standards_conforming(spark):
    rows = (
        decode_audio(
            attach_wav_media(
                spark.range(0, 20).withColumnRenamed("id", "doc_id"),
                "doc_id",
            )
        )
        .orderBy("media_id")
        .collect()
    )
    assert len(rows) == 20
    for r in rows:
        i = r.media_id
        n = i % 192 + 64
        s = np.array([((i * 31 + k * 7) % 201) - 100 for k in range(n)])
        assert r.n_samples == n
        assert r.sample_rate == 8000
        assert r.mean_abs == int(np.abs(s).sum()) // n
        sign = np.sign(s)
        assert r.n_sign_changes == int((sign[:-1] * sign[1:] == -1).sum())


def test_spark_wav_bytes_decode_with_python_reference(spark):
    # cross-check the JVM-side little-endian encoding byte-for-byte
    row = (
        attach_wav_media(
            spark.createDataFrame([(7,)], ["doc_id"]), "doc_id"
        )
        .collect()[0]
    )
    sr, s = _decode_wav(bytes(row.media))
    n = 7 % 192 + 64
    expect = [((7 * 31 + k * 7) % 201) - 100 for k in range(n)]
    assert sr == 8000
    assert s.tolist() == expect
    # and the whole stream must equal the struct-written reference
    assert bytes(row.media) == py_wav(expect)


def test_audio_stats_is_jvm_only(spark):
    media = attach_wav_media(
        spark.range(0, 5).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    plan = audio_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()
    rows = audio_stats(media).collect()
    assert all(abs(r.duration_sec - r.n_bytes / 16000) < 0.01 for r in rows)


def test_video_frame_extraction_samples_and_decodes(spark):
    out = (
        extract_frames(
            attach_pgm_video(
                spark.range(0, 12).withColumnRenamed("id", "doc_id"),
                "doc_id",
            ),
            every_n=2,
        )
        .orderBy("media_id", "frame_idx")
        .collect()
    )
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    for i, frames in by_media.items():
        n_frames = i % 4 + 2
        w, h = i % 24 + 8, i % 16 + 8
        assert [f.frame_idx for f in frames] == list(range(0, n_frames, 2))
        for f in frames:
            px = np.array(
                [(i + f.frame_idx * 7 + k) % 256 for k in range(w * h)]
            )
            assert (f.width, f.height) == (w, h)
            assert f.mean_intensity == int(px.sum()) // (w * h)


def test_video_every_n_one_decodes_all_frames(spark):
    out = extract_frames(
        attach_pgm_video(
            spark.createDataFrame([(3,)], ["doc_id"]), "doc_id"
        ),
        every_n=1,
    ).collect()
    assert len(out) == 3 % 4 + 2


def test_video_stream_is_concatenated_standard_p5(spark):
    media = bytes(
        attach_pgm_video(
            spark.createDataFrame([(5,)], ["doc_id"]), "doc_id"
        ).collect()[0].media
    )
    # first frame must decode with the plain single-image P5 decoder
    px = _decode_pnm(media)
    assert px.shape == (5 % 16 + 8, 5 % 24 + 8)
    assert px[0, 0] == 5  # pixel 0 of frame 0 is id % 256


# --------------------------------------------------------------------- png


def test_png_roundtrip_all_filters(spark):
    import numpy as np

    from pyspark_graph_spark.multimodal.binary_ops import (
        _decode_png,
        _encode_png_gray8,
    )

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(11, 23), dtype=np.int64)
    assert np.array_equal(_decode_png(_encode_png_gray8(px)), px)


def test_png_decode_end_to_end(spark):
    from pyspark_graph_spark.multimodal import attach_png_media, decode_images

    base = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    out = {r.media_id: r for r in decode_images(attach_png_media(base, "doc_id")).collect()}
    for i in range(6):
        w, h = i % 48 + 16, i % 32 + 16
        assert (out[i].width, out[i].height) == (w, h)
        expect = sum((i + k) % 256 for k in range(w * h)) // (w * h)
        assert out[i].mean_intensity == expect


def test_png_rejects_garbage(spark):
    import pytest as _pytest

    from pyspark_graph_spark.multimodal.binary_ops import _decode_png

    with _pytest.raises(ValueError):
        _decode_png(b"not a png at all")


def test_png_palette_decode(spark):
    """Color-type-3 PNG: indices map through PLTE, intensity = RGB mean."""
    import struct
    import zlib

    import numpy as np

    from pyspark_graph_spark.multimodal.binary_ops import (
        _decode_png,
        _png_chunk,
    )

    w, h = 5, 3
    idx = np.arange(w * h, dtype=np.uint8).reshape(h, w) % 4
    palette = bytes(
        [10, 20, 30,  60, 61, 65,  200, 100, 0,  255, 255, 255]
    )
    raw = bytearray()
    for r in range(h):
        raw.append(0)  # filter None
        raw.extend(idx[r].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3).astype(int)
    expect = pal[idx].sum(axis=2) // 3
    assert np.array_equal(_decode_png(png), expect)


def test_png_palette_missing_plte(spark):
    import struct
    import zlib

    import pytest as _pytest

    from pyspark_graph_spark.multimodal.binary_ops import (
        _decode_png,
        _png_chunk,
    )

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x01"))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="PLTE"):
        _decode_png(png)


def test_png_truncated_idat(spark):
    """Chopping the IDAT stream raises a clear ValueError, never a silent
    mis-decode (r2 verdict item 8)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from pyspark_graph_spark.multimodal.binary_ops import (
        _decode_png,
        _encode_png_gray8,
        _png_chunk,
    )

    px = np.arange(64, dtype=np.int64).reshape(8, 8)
    good = _encode_png_gray8(px)
    # locate the IDAT chunk and rebuild the PNG with its body halved
    pos = 8
    while True:
        (length,) = struct.unpack(">I", good[pos : pos + 4])
        tag = good[pos + 4 : pos + 8]
        if tag == b"IDAT":
            break
        pos += 12 + length
    body = good[pos + 8 : pos + 8 + length]
    bad = (
        good[:pos]
        + _png_chunk(b"IDAT", body[: len(body) // 2])
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="IDAT|truncated"):
        _decode_png(bad)


def test_png_rejects_interlaced_and_16bit(spark):
    """The rejection contract is formal: interlace=1 and depth=16 raise
    NotImplementedError with the offending parameters in the message."""
    import struct
    import zlib

    import pytest as _pytest

    from pyspark_graph_spark.multimodal.binary_ops import (
        _decode_png,
        _png_chunk,
    )

    def png_with(depth, color, interlace):
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, interlace)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + _png_chunk(b"IEND", b"")
        )

    with _pytest.raises(NotImplementedError, match="interlace=1"):
        _decode_png(png_with(8, 0, 1))
    with _pytest.raises(NotImplementedError, match="depth=16"):
        _decode_png(png_with(16, 0, 0))
    with _pytest.raises(NotImplementedError, match="color=6"):
        _decode_png(png_with(8, 6, 0))


def test_spectral_features_pure_tone(spark):
    """A synthesized pure cosine at bin 4 puts (almost) all power there."""
    import struct as _struct

    import numpy as np

    from pyspark_graph_spark.multimodal.audio_ops import spectral_features

    n = 128
    k = np.arange(n)
    x = np.round(1000 * np.cos(2 * np.pi * 4 * k / 64)).astype(np.int16)
    header = (
        b"RIFF" + _struct.pack("<I", 36 + 2 * n) + b"WAVEfmt "
        + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + _struct.pack("<I", 2 * n)
    )
    media = header + x.tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(media), ("wav", n, 8000))],
        "media_id long, media binary, meta struct<format:string,n_samples:int,sample_rate:int>",
    )
    row = spectral_features(df, frame=64, bins=(0, 1, 4, 8)).first()
    assert row["n_frames"] == 2
    # bin 4 dominates every other bin by orders of magnitude
    assert row["p4"] > 100 * max(row["p0"], row["p1"], row["p8"])
    # and matches the analytic value (N/2 * A)^2 per frame within rounding
    expect = 2 * (64 / 2 * 1000) ** 2
    assert abs(row["p4"] - expect) / expect < 0.01


def test_spectral_features_remainder_dropped(spark):
    from pyspark_graph_spark.multimodal.audio_ops import (
        attach_wav_media,
        spectral_features,
    )

    df = spark.range(3).selectExpr("id AS doc_id")
    rows = {
        r["media_id"]: r
        for r in spectral_features(attach_wav_media(df, "doc_id")).collect()
    }
    for mid in range(3):
        assert rows[mid]["n_frames"] == (mid % 192 + 64) // 64


# --------------------------------------------------------------------------
# TIFF (baseline gray8) decode
# --------------------------------------------------------------------------


def _build_tiff(w, h, pixels, byte_order="<"):
    import struct

    bo = b"II" if byte_order == "<" else b"MM"
    strip = bytes(pixels)
    ifd_off = 8 + len(strip)
    head = bo + struct.pack(byte_order + "H", 42) + struct.pack(
        byte_order + "I", ifd_off
    )
    entries = [
        (256, 3, w), (257, 3, h), (258, 3, 8), (259, 3, 1), (262, 3, 1),
        (273, 4, 8), (277, 3, 1), (278, 3, h), (279, 4, w * h),
    ]
    ifd = struct.pack(byte_order + "H", len(entries))
    for tag, typ, val in entries:
        ifd += struct.pack(byte_order + "HHI", tag, typ, 1)
        if typ == 3:
            ifd += struct.pack(byte_order + "H", val) + b"\x00\x00"
        else:
            ifd += struct.pack(byte_order + "I", val)
    ifd += b"\x00\x00\x00\x00"
    return head + strip + ifd


def test_tiff_decode_both_byte_orders():
    from pyspark_graph_spark.multimodal.binary_ops import _decode_tiff

    pix = list(range(12))
    for bo in ("<", ">"):
        px = _decode_tiff(_build_tiff(4, 3, pix, bo))
        assert px.shape == (3, 4)
        assert px[0, 0] == 0 and px[2, 3] == 11


def test_tiff_rejects_compressed():
    import struct

    import pytest as _pytest

    from pyspark_graph_spark.multimodal.binary_ops import _decode_tiff

    raw = bytearray(_build_tiff(4, 3, list(range(12))))
    # flip the Compression tag value (entry 4, SHORT) to 5 (LZW)
    ifd_off = 8 + 12
    entry_off = ifd_off + 2 + 12 * 3 + 8
    raw[entry_off : entry_off + 2] = struct.pack("<H", 5)
    with _pytest.raises(NotImplementedError):
        _decode_tiff(bytes(raw))


def test_tiff_rejects_garbage():
    import pytest as _pytest

    from pyspark_graph_spark.multimodal.binary_ops import _decode_tiff

    with _pytest.raises(ValueError):
        _decode_tiff(b"XX notatiff")


def test_tiff_attach_decode_roundtrip(spark):
    from pyspark_graph_spark.multimodal.binary_ops import (
        attach_tiff_media,
        decode_images,
    )

    df = spark.range(4).toDF("doc_id")
    out = {
        r["media_id"]: r
        for r in decode_images(attach_tiff_media(df, "doc_id")).collect()
    }
    for i in range(4):
        w, h = i % 40 + 16, i % 24 + 16
        assert (out[i]["width"], out[i]["height"]) == (w, h)
        expect = sum((i + k) % 256 for k in range(w * h)) // (w * h)
        assert out[i]["mean_intensity"] == expect
