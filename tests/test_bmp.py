"""Windows BMP codec: byte-level format conformance, roundtrip across
paddings and orientations, and the Spark decode-stats path."""

import struct

import numpy as np
import pytest

from alphalens_spark.scale.multimodal import (
    bmp_pixel_stats,
    embeddings_as_bmp,
    make_bmp,
    parse_bmp,
)


def test_bmp_header_bytes():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    payload = make_bmp(img)
    assert payload[:2] == b"BM"
    # declared file size matches, data offset is 54, header size 40
    assert struct.unpack_from("<I", payload, 2)[0] == len(payload)
    assert struct.unpack_from("<I", payload, 10)[0] == 54
    assert struct.unpack_from("<I", payload, 14)[0] == 40
    w, h = struct.unpack_from("<ii", payload, 18)
    assert (w, h) == (2, 2)
    assert struct.unpack_from("<H", payload, 28)[0] == 24  # bpp
    # 2px rows = 6 bytes -> padded to 8; raster = 16 bytes
    assert len(payload) == 54 + 16
    # bottom-up + BGR: first stored pixel is image row 1, col 0, reversed
    assert payload[54:57] == bytes(img[1, 0, ::-1])


@pytest.mark.parametrize("w,h", [(4, 4), (5, 3), (1, 7), (3, 1)])
def test_bmp_roundtrip_rgb_paddings(w, h):
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(parse_bmp(make_bmp(img)), img)


def test_bmp_roundtrip_gray_replicates():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = parse_bmp(make_bmp(g))
    assert out.shape == (8, 8, 3)
    for c in range(3):
        assert np.array_equal(out[:, :, c], g)


def test_bmp_top_down_variant():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = bytearray(make_bmp(img))
    # rewrite height negative (top-down) and re-order rows accordingly
    struct.pack_into("<i", payload, 22, -2)
    row_bytes = (3 * 3 + 3) // 4 * 4
    bottom_up = bytes(payload[54:])
    flipped = bottom_up[row_bytes:] + bottom_up[:row_bytes]
    assert np.array_equal(
        parse_bmp(bytes(payload[:54]) + flipped), img
    )


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError, match="not a BMP"):
        parse_bmp(b"PNG whatever")
    good = make_bmp(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        parse_bmp(good[:-5])
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        parse_bmp(bytes(bad_bpp))


def test_bmp_stats_spark_path(spark):
    emb = spark.createDataFrame(
        [(1, [float(i) / 40.0 - 0.5 for i in range(64)]),
         (2, [0.25] * 64)],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["media_id"]: r
        for r in bmp_pixel_stats(embeddings_as_bmp(emb, 8, 8)).collect()
    }
    for mid, vec in ((1, [i / 40.0 - 0.5 for i in range(64)]), (2, [0.25] * 64)):
        px = [
            int(np.floor(min(max((np.float32(x) + 1.0) / 2.0, 0.0), 1.0) * 255.0))
            for x in vec
        ]
        assert rows[mid]["px_sum"] == 3 * sum(px)
        assert rows[mid]["px_min"] == min(px)
        assert rows[mid]["px_max"] == max(px)
        assert (rows[mid]["width"], rows[mid]["height"]) == (8, 8)
