"""Baseline JPEG codec (multimodal/jpeg_ops.py): flat-block exactness,
AC run-length path vs an independent IDCT, restart markers, scope
contract, and the Spark mapInPandas pipeline."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.multimodal.jpeg_ops import (
    attach_jpeg_color_media,
    attach_jpeg_media,
    decode_jpeg,
    encode_jpeg_color_flat,
    encode_jpeg_gray8,
    encode_jpeg_gray8_flat,
    encode_jpeg_ycbcr,
)


def _fixture_blocks(i: int):
    w, h = i % 41 + 24, i % 29 + 24
    n_bx, n_by = (w + 7) // 8, (h + 7) // 8
    bx, by = np.arange(n_bx), np.arange(n_by)
    vals = (i * 7 + bx[None, :] * 13 + by[:, None] * 31) % 200 + 28
    return vals, w, h


@pytest.mark.parametrize("i", [0, 3, 7, 41, 123, 499])
def test_flat_roundtrip_exact(i):
    vals, w, h = _fixture_blocks(i)
    data = encode_jpeg_gray8_flat(
        vals, w, h, restart_interval=4 if i % 3 == 0 else 0
    )
    img = decode_jpeg(data)
    assert img.shape == (h, w)
    expect = np.kron(vals, np.ones((8, 8), dtype=np.int64))[:h, :w]
    assert (img == expect).all()


def _reference_idct(coeff_block):
    """Straightforward O(64^2) double-loop IDCT — independent of the
    decoder's separable matrix implementation."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv / 4 * coeff_block[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s
    return out


@pytest.mark.parametrize("seed", [1, 42, 2024])
def test_ac_runlength_path_matches_reference(seed):
    rng = np.random.RandomState(seed)
    n_by, n_bx = 3, 4
    coeffs = rng.randint(-30, 31, size=(n_by, n_bx, 8, 8))
    coeffs[:, :, 0, 0] = rng.randint(-50, 51, size=(n_by, n_bx))
    # sparsify: exercises zero runs, ZRL (16-run escapes), EOB
    coeffs = np.where(rng.rand(n_by, n_bx, 8, 8) < 0.85, 0, coeffs)
    q = np.full((8, 8), 3)
    q[0, 0] = 5
    w, h = n_bx * 8 - 3, n_by * 8 - 5
    img = decode_jpeg(encode_jpeg_gray8(coeffs, w, h, q))
    full = np.zeros((n_by * 8, n_bx * 8), dtype=np.int64)
    for by in range(n_by):
        for bx in range(n_bx):
            sp = _reference_idct(coeffs[by, bx] * q)
            full[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                np.rint(sp + 128).clip(0, 255).astype(np.int64)
            )
    assert (img == full[:h, :w]).all()


def test_dense_blocks_force_zrl_and_stuffing():
    # every AC slot filled at max run gaps; magnitudes large enough to
    # produce 0xFF bytes in the entropy stream (stuffing path)
    coeffs = np.zeros((1, 2, 8, 8), dtype=np.int64)
    coeffs[0, 0].reshape(64)[:] = 1
    coeffs[0, 0, 0, 0] = 900  # wide DC category
    coeffs[0, 1, 7, 7] = -1  # single coeff at the very end: long ZRL runs
    q = np.ones((8, 8), dtype=np.int64)
    img = decode_jpeg(encode_jpeg_gray8(coeffs, 16, 8, q))
    ref0 = np.rint(_reference_idct(coeffs[0, 0] * q) + 128).clip(0, 255)
    ref1 = np.rint(_reference_idct(coeffs[0, 1] * q) + 128).clip(0, 255)
    assert (img[:, :8] == ref0.astype(np.int64)).all()
    assert (img[:, 8:] == ref1.astype(np.int64)).all()


def test_restart_marker_resets_dc_predictor():
    vals = np.array([[40, 200, 40, 200, 40, 200]], dtype=np.int64)
    with_rst = decode_jpeg(
        encode_jpeg_gray8_flat(vals, 48, 8, restart_interval=2)
    )
    without = decode_jpeg(encode_jpeg_gray8_flat(vals, 48, 8))
    assert (with_rst == without).all()


def test_scope_contract_rejections():
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x04\x00\x00")
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(b"\xff\xd8\xff\xc9\x00\x04\x00\x00")
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    # 4-component (CMYK) SOF0
    body = (
        b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + b"\x04"
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01\x04\x11\x01"
    )
    seg = b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body
    with pytest.raises(NotImplementedError, match="component"):
        decode_jpeg(b"\xff\xd8" + seg)
    # sampling factor 4 (out of the 1/2 envelope)
    body = (
        b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + b"\x03\x01\x44\x00\x02\x11\x01\x03\x11\x01"
    )
    seg = b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body
    with pytest.raises(NotImplementedError, match="sampling factor"):
        decode_jpeg(b"\xff\xd8" + seg)


# ---------------------------------------------------------------------------
# Color (3-component YCbCr) baseline
# ---------------------------------------------------------------------------


def _color_fixture_blocks(i: int):
    w, h = i % 37 + 20, i % 23 + 18
    sh, sv = (2, 2) if i % 2 == 0 else (1, 1)
    mcus_x = (w + 8 * sh - 1) // (8 * sh)
    mcus_y = (h + 8 * sv - 1) // (8 * sv)
    n_bx, n_by = mcus_x * sh, mcus_y * sv
    bx, by = np.arange(n_bx), np.arange(n_by)
    vals = (i * 11 + bx[None, :] * 17 + by[:, None] * 23) % 200 + 28
    return vals, w, h, (sh, sv)


@pytest.mark.parametrize("i", [0, 1, 4, 5, 10, 33])
def test_color_flat_roundtrip_exact(i):
    vals, w, h, sampling = _color_fixture_blocks(i)
    data = encode_jpeg_color_flat(
        vals, w, h, sampling, restart_interval=2 if i % 5 == 0 else 0
    )
    img = decode_jpeg(data)
    assert img.shape == (h, w)
    expect = np.kron(vals, np.ones((8, 8), dtype=np.int64))[:h, :w]
    assert (img == expect).all()


@pytest.mark.parametrize("sampling", [(1, 1), (2, 2), (2, 1), (1, 2)])
def test_color_ac_rich_matches_reference(sampling):
    sh, sv = sampling
    rng = np.random.RandomState(11 * sh + sv)
    mcus_y, mcus_x = 2, 2
    y = np.where(
        rng.rand(mcus_y * sv, mcus_x * sh, 8, 8) < 0.85,
        0,
        rng.randint(-20, 21, (mcus_y * sv, mcus_x * sh, 8, 8)),
    )
    cb = np.where(
        rng.rand(mcus_y, mcus_x, 8, 8) < 0.9,
        0,
        rng.randint(-10, 11, (mcus_y, mcus_x, 8, 8)),
    )
    cr = np.where(
        rng.rand(mcus_y, mcus_x, 8, 8) < 0.9,
        0,
        rng.randint(-10, 11, (mcus_y, mcus_x, 8, 8)),
    )
    ql = np.full((8, 8), 4)
    qc = np.full((8, 8), 6)
    w, h = mcus_x * sh * 8 - 3, mcus_y * sv * 8 - 5
    img = decode_jpeg(
        encode_jpeg_ycbcr(y, cb, cr, w, h, ql, qc, sampling, 2)
    )

    def plane(coeffs, q, rep_y, rep_x):
        n_by, n_bx = coeffs.shape[:2]
        out = np.zeros((n_by * 8, n_bx * 8), dtype=np.int64)
        for by in range(n_by):
            for bx in range(n_bx):
                sp = _reference_idct(coeffs[by, bx] * q)
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    np.rint(sp + 128).clip(0, 255).astype(np.int64)
                )
        return np.repeat(np.repeat(out, rep_y, axis=0), rep_x, axis=1)

    yp = plane(y, ql, 1, 1)[:h, :w].astype(float)
    cbp = plane(cb, qc, sv, sh)[:h, :w].astype(float)
    crp = plane(cr, qc, sv, sh)[:h, :w].astype(float)
    red = np.rint(yp + 1.402 * (crp - 128)).clip(0, 255).astype(np.int64)
    grn = (
        np.rint(yp - 0.344136 * (cbp - 128) - 0.714136 * (crp - 128))
        .clip(0, 255)
        .astype(np.int64)
    )
    blu = np.rint(yp + 1.772 * (cbp - 128)).clip(0, 255).astype(np.int64)
    assert (img == (red + grn + blu) // 3).all()


def test_spark_pipeline_decodes_color_jpeg(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    from pyspark_graph_spark.multimodal.binary_ops import decode_images

    out = decode_images(attach_jpeg_color_media(df, "doc_id")).collect()
    assert len(out) == 10
    for r in out:
        vals, w, h, _ = _color_fixture_blocks(r.media_id)
        assert (r.width, r.height) == (w, h)
        full = np.kron(vals, np.ones((8, 8), dtype=np.int64))[:h, :w]
        assert r.mean_intensity == int(full.sum()) // (w * h)


def test_spark_pipeline_decodes_jpeg(spark):
    df = spark.range(12).withColumnRenamed("id", "doc_id")
    from pyspark_graph_spark.multimodal.binary_ops import decode_images

    out = decode_images(attach_jpeg_media(df, "doc_id")).collect()
    assert len(out) == 12
    for r in out:
        i = r.media_id
        vals, w, h = _fixture_blocks(i)
        assert (r.width, r.height) == (w, h)
        vis_w = np.minimum(8, w - np.arange(vals.shape[1]) * 8)
        vis_h = np.minimum(8, h - np.arange(vals.shape[0]) * 8)
        total = int((vals * vis_w[None, :] * vis_h[:, None]).sum())
        assert r.mean_intensity == total // (w * h)


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker
    code — a conforming padded stream must decode identically."""
    vals, w, h = _fixture_blocks(7)
    raw = encode_jpeg_gray8_flat(vals, w, h)
    # inject two fill bytes before the SOF0 marker (FF C0 -> FF FF FF C0)
    at = raw.index(b"\xff\xc0")
    padded = raw[:at] + b"\xff\xff" + raw[at:]
    assert (decode_jpeg(padded) == decode_jpeg(raw)).all()


def test_restart_cadence_mismatch_raises_valueerror():
    """A raw RSTn inside entropy data with no (or disagreeing) DRI must
    surface as the module's documented ValueError, not escape as a
    private exception class."""
    vals = np.array([[40, 200, 40, 200, 40, 200]], dtype=np.int64)
    raw = encode_jpeg_gray8_flat(vals, 48, 8, restart_interval=2)
    # strip the DRI segment (FF DD len=0004 interval) so the decoder
    # expects an uninterrupted scan but the stream still carries RSTn
    at = raw.index(b"\xff\xdd")
    stripped = raw[:at] + raw[at + 6 :]
    with pytest.raises(ValueError, match="RSTn|restart"):
        decode_jpeg(stripped)


def test_restart_after_stuffed_ff_padding_byte():
    """T.81: if the final entropy byte before an RSTn pads to 0xFF it is
    byte-stuffed (FF 00 FF Dn) — restart() must skip the stuffed pair,
    not mistake it for a missing marker."""
    from pyspark_graph_spark.multimodal.jpeg_ops import _BitReader

    r = _BitReader(b"\xff\x00\xff\xd3\xab", 0)
    r.restart()
    assert r.pos == 4  # positioned on the byte after FF D3


def test_truncated_stream_raises_valueerror():
    """A stream cut mid-scan (or ending in an 0xFF run) must surface as
    the documented ValueError, never an IndexError."""
    vals, w, h = _fixture_blocks(11)
    raw = encode_jpeg_gray8_flat(vals, w, h)
    for cut in (len(raw) // 2, len(raw) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(raw[:cut])
    with pytest.raises(ValueError):
        decode_jpeg(raw[: len(raw) // 2] + b"\xff\xff\xff")
