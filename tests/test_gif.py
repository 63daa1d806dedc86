"""GIF codec: known-bytes ground truth, roundtrips, rejection contract."""

import random
import struct

import numpy as np
import pytest

from pyspark_graph_spark.multimodal.gif_ops import (
    _lzw_decode,
    _lzw_encode,
    attach_gif_media,
    decode_gif,
    encode_gif,
)

# hand-assembled 1x1 white-pixel GIF89a (widely documented byte sequence);
# validates the bit-unpacking against external ground truth, not just our
# own encoder
ONE_PIXEL = bytes.fromhex(
    "474946383961010001008000"
    "00ffffff000000"
    "2c00000000010001000002024401003b"
)


def test_known_one_pixel_gif():
    arr = decode_gif(ONE_PIXEL)
    assert arr.shape == (1, 1) and arr[0, 0] == 255


def test_lzw_roundtrip_forces_width_growth_and_reset():
    rng = random.Random(1)
    idx = [rng.randrange(16) for _ in range(70000)]
    idx += [0] * 300 + [1, 1] * 200 + idx[:500]  # chains + KwKwK
    enc = _lzw_encode(idx, 4)
    assert list(_lzw_decode(enc, 4)) == idx
    # stream long enough that the dictionary filled and reset at 4096
    assert len(enc) < len(idx)  # it actually compressed


def test_lzw_kwkwk_case():
    # 'abababab...' generates the code-equal-to-next_code path immediately
    idx = [0, 1] * 50
    assert list(_lzw_decode(_lzw_encode(idx, 2), 2)) == idx


def test_container_roundtrip_palette_mapping():
    w, h = 24, 16
    idx = [(3 + k) % 4 for k in range(w * h)]
    arr = decode_gif(encode_gif(w, h, idx))
    assert arr.shape == (h, w)
    assert (arr.flatten() == np.array(idx) * 85).all()


def test_interlaced_rejected():
    g = bytearray(encode_gif(4, 4, [0] * 16))
    # image descriptor starts right after 13-byte LSD + 12-byte GCT
    pos = 13 + 12
    assert g[pos] == 0x2C
    g[pos + 9] |= 0x40  # set interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(g))


def test_truncated_lzw_rejected():
    g = encode_gif(8, 8, [1] * 64)
    # chop inside the data sub-blocks (before trailer + terminator)
    with pytest.raises(ValueError):
        decode_gif(g[:-6] + b"\x00\x3b")


def test_not_a_gif_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)


def test_extension_blocks_skipped():
    # splice a GIF89a graphic-control extension before the image descriptor
    g = encode_gif(2, 2, [0, 1, 2, 3])
    pos = 13 + 12
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = g[:pos] + ext + g[pos:]
    arr = decode_gif(spliced)
    assert (arr.flatten() == np.array([0, 1, 2, 3]) * 85).all()


def test_attach_and_decode_end_to_end(spark):
    from pyspark_graph_spark.multimodal import decode_images

    df = spark.range(5).selectExpr("id AS doc_id")
    out = {
        r["media_id"]: r
        for r in decode_images(attach_gif_media(df, "doc_id")).collect()
    }
    for mid in range(5):
        w, h = mid % 24 + 8, mid % 16 + 8
        vals = [((mid + k) % 4) * 85 for k in range(w * h)]
        assert out[mid]["width"] == w and out[mid]["height"] == h
        assert out[mid]["mean_intensity"] == sum(vals) // len(vals)
