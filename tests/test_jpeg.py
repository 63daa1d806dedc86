"""Baseline JPEG codec (multimodal/jpeg_ops.py): flat-block exactness,
AC run-length path vs an independent IDCT, restart markers, scope
contract, and the Spark mapInPandas pipeline."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.multimodal.jpeg_ops import (
    attach_jpeg_media,
    decode_jpeg,
    encode_jpeg_gray8,
    encode_jpeg_gray8_flat,
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
    # 3-component (color) SOF0
    body = (
        b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    seg = b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body
    with pytest.raises(NotImplementedError, match="component"):
        decode_jpeg(b"\xff\xd8" + seg)


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
