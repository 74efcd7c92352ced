"""Real image decode branch (VERDICT r3 #7): decode_image handles binary
PPM (P6) and uncompressed 24-bit BMP in pure Python — no codec library —
and extract_decoded_features runs that decode through the same
mapInPandas/Arrow plumbing as the driver-paired byte-level entry. Payloads
are constructed in-test so expected dimensions and channel means are
exact."""

from __future__ import annotations

import struct

import pytest

from skywalking_banyandb_spark.functions import multimodal as mm


def make_ppm(width, height, pixels, comment=False):
    """pixels: list of (r, g, b) row-major, len == width*height."""
    head = b"P6\n"
    if comment:
        head += b"# a netpbm comment\n"
    head += f"{width} {height}\n255\n".encode()
    return head + b"".join(bytes(p) for p in pixels)


def make_bmp(width, height, pixels, top_down=False):
    """Uncompressed 24-bit BMP; pixels row-major top-to-bottom RGB."""
    row_sz = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_sz - width * 3)
    rows = []
    for y in range(height):
        row = pixels[y * width:(y + 1) * width]
        rows.append(b"".join(bytes((b, g, r)) for (r, g, b) in row) + pad)
    if not top_down:
        rows.reverse()  # bottom-up storage order
    raster = b"".join(rows)
    h_field = -height if top_down else height
    info = struct.pack("<IiiHHIIiiII", 40, width, h_field, 1, 24, 0,
                       len(raster), 2835, 2835, 0, 0)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    return header + info + raster


PIX = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30),
       (40, 50, 60), (70, 80, 90)]  # 3x2


def test_decode_ppm_exact():
    w, h, rgb = mm.decode_image(make_ppm(3, 2, PIX, comment=True))
    assert (w, h) == (3, 2)
    assert rgb == b"".join(bytes(p) for p in PIX)


@pytest.mark.parametrize("top_down", [False, True])
def test_decode_bmp_matches_ppm(top_down):
    """Same pixels through BMP (either row order) == through PPM."""
    _, _, via_ppm = mm.decode_image(make_ppm(3, 2, PIX))
    w, h, via_bmp = mm.decode_image(make_bmp(3, 2, PIX, top_down=top_down))
    assert (w, h) == (3, 2)
    assert via_bmp == via_ppm


def test_decode_unknown_magic_is_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\nrest")


def test_decode_truncated_ppm_raises():
    with pytest.raises(ValueError):
        mm.decode_image(make_ppm(3, 2, PIX)[:-4])


def test_extract_decoded_features_mixed_formats(spark):
    """The mapInPandas path decodes a mixed PPM/BMP batch; channel means
    are exact (values chosen integral-friendly)."""
    rows = [
        (1, bytearray(make_ppm(3, 2, PIX))),
        (2, bytearray(make_bmp(3, 2, PIX))),
        (3, bytearray(make_ppm(2, 2, [(8, 16, 32)] * 4))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in
           mm.extract_decoded_features(df).collect()}
    assert len(out) == 3
    exp_r = sum(p[0] for p in PIX) / 6
    exp_g = sum(p[1] for p in PIX) / 6
    exp_b = sum(p[2] for p in PIX) / 6
    for doc in (1, 2):  # PPM and BMP agree exactly
        r = out[doc]
        assert (r["width"], r["height"], r["n_pixels"]) == (3, 2, 6)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (exp_r, exp_g, exp_b)
    assert (out[3]["mean_r"], out[3]["mean_g"], out[3]["mean_b"]) == (8.0, 16.0, 32.0)


def test_resize_nearest_exact():
    """4x2 -> 2x1: floor mapping picks src (0,0) and (0,2)."""
    pix = [(i, i + 1, i + 2) for i in range(0, 80, 10)]  # 8 pixels, 4x2
    w, h, rgb = mm.decode_image(make_ppm(4, 2, pix))
    out = mm.resize_nearest(w, h, rgb, 2, 1)
    assert out == bytes(pix[0]) + bytes(pix[2])
    # upscale replicates neighbours: 1x1 -> 2x2 is four copies
    up = mm.resize_nearest(1, 1, bytes((9, 8, 7)), 2, 2)
    assert up == bytes((9, 8, 7)) * 4


def test_resize_and_features_pipeline(spark):
    """decode -> resize -> featurize through mapInPandas: a uniform-color
    PPM keeps its channel means through any resize."""
    payload = make_ppm(6, 4, [(100, 150, 200)] * 24)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, payload binary")
    row = mm.resize_and_features(df, new_w=3, new_h=2).head()
    assert (row.src_width, row.src_height) == (6, 4)
    assert (row.width, row.height) == (3, 2)
    assert (row.mean_r, row.mean_g, row.mean_b) == (100.0, 150.0, 200.0)
