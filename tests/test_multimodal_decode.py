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
    # TIFF: genuinely gated (PNG is complete, baseline JPEG and GIF decode
    # in pure Python as of r6 — see tests/test_{jpeg,gif}_decode.py)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"II*\x00rest-of-tiff")


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


# ---------------------------------------------------------------------------
# PNG: the test side ENCODES (independent implementation direction) with
# explicit per-row filters; the production side decodes. Round-trip equality
# over every filter type and color type proves the unfilter math.
# ---------------------------------------------------------------------------

def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _encode_png(width, height, rgb, color=2, filters=None, palette=None):
    """Minimal test-side PNG encoder. ``rgb`` is the raw channel bytes for
    the given color type; ``filters[row]`` picks the filter each row is
    ENCODED with (the decoder must invert it)."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 6: 4}[color]
    stride = width * channels
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytearray(stride)
    for row in range(height):
        cur = bytearray(rgb[row * stride:(row + 1) * stride])
        f = filters[row]
        enc = bytearray(cur)
        for i in range(stride):
            a = cur[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 1:
                enc[i] = (cur[i] - a) & 0xFF
            elif f == 2:
                enc[i] = (cur[i] - b) & 0xFF
            elif f == 3:
                enc[i] = (cur[i] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pr) & 0xFF
        raw += bytes([f]) + enc
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette)
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return out


def _test_pixels(width, height, channels):
    import hashlib

    n = width * height * channels
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"px{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


def test_decode_png_rgb_every_filter():
    w, h = 5, 5
    rgb = _test_pixels(w, h, 3)
    payload = _encode_png(w, h, rgb, color=2, filters=[0, 1, 2, 3, 4])
    assert mm.decode_image(payload) == (w, h, rgb)


def test_decode_png_grayscale_and_rgba():
    w, h = 4, 3
    gray = _test_pixels(w, h, 1)
    gw, gh, grgb = mm.decode_image(
        _encode_png(w, h, gray, color=0, filters=[4, 1, 3]))
    assert (gw, gh) == (w, h)
    assert grgb == bytes(b for v in gray for b in (v, v, v))

    rgba = _test_pixels(w, h, 4)
    aw, ah, argb = mm.decode_image(
        _encode_png(w, h, rgba, color=6, filters=[2, 4, 0]))
    assert (aw, ah) == (w, h)
    want = bytearray()
    for i in range(w * h):
        want += rgba[4 * i:4 * i + 3]
    assert argb == bytes(want)


def test_decode_png_palette():
    w, h = 4, 2
    palette = _test_pixels(256, 1, 3)
    idx = bytes([0, 1, 2, 3, 250, 251, 252, 255])
    pw, ph, prgb = mm.decode_image(
        _encode_png(w, h, idx, color=3, filters=[1, 4], palette=palette))
    assert (pw, ph) == (w, h)
    want = bytearray()
    for v in idx:
        want += palette[3 * v:3 * v + 3]
    assert prgb == bytes(want)


def test_decode_png_palette_index_out_of_range_raises():
    """r6 (ADVICE): an index past the PLTE table must raise, not silently
    resize the output via a short bytearray slice-assignment."""
    import pytest

    palette = _test_pixels(4, 1, 3)  # 4 entries: valid indexes 0..3
    idx = bytes([0, 1, 2, 3, 1, 2, 3, 7])  # 7 is out of range
    with pytest.raises(ValueError, match="palette index"):
        mm.decode_image(
            _encode_png(4, 2, idx, color=3, filters=[0, 0], palette=palette))


def test_decode_png_remaining_gates():
    """r6: every legal depth/color combination now DECODES (tests below);
    illegal spec combinations raise ValueError, unknown color types stay
    NotImplementedError."""
    import struct
    import zlib as _z

    import pytest

    w, h = 2, 2
    rgb = _test_pixels(w, h, 3)
    assert mm.decode_image(_encode_png(w, h, rgb))[2] == rgb
    ihdr_p16 = struct.pack(">IIBBBBB", w, h, 16, 3, 0, 0, 0)
    bad_p16 = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_p16)
               + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="illegal PNG depth"):
        mm.decode_image(bad_p16)
    ihdr_rgb4 = struct.pack(">IIBBBBB", w, h, 4, 2, 0, 0, 0)
    bad_rgb4 = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_rgb4)
                + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="illegal PNG depth"):
        mm.decode_image(bad_rgb4)
    ihdr_c5 = struct.pack(">IIBBBBB", w, h, 8, 5, 0, 0, 0)
    bad_c5 = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_c5)
              + _png_chunk(b"IDAT", _z.compress(b"\x00" * 32))
              + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="color type 5"):
        mm.decode_image(bad_c5)


# ---------------------------------------------------------------------------
# r6: 16-bit depth and Adam7 interlacing (closing the r5 codec-gate items).
# The encoder below is an INDEPENDENT implementation: it filters each
# Adam7 sub-image itself and packs 16-bit samples big-endian, so decode
# equality is a real differential check, not an inverse of shared code.
# ---------------------------------------------------------------------------

_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _filter_sub(samples, w, h, bpp, filters):
    out = bytearray()
    stride = w * bpp
    prev = bytearray(stride)
    for row in range(h):
        cur = bytearray(samples[row * stride:(row + 1) * stride])
        f = filters[row % len(filters)]
        enc = bytearray(cur)
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 1:
                enc[i] = (cur[i] - a) & 0xFF
            elif f == 2:
                enc[i] = (cur[i] - b) & 0xFF
            elif f == 3:
                enc[i] = (cur[i] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pr) & 0xFF
        out += bytes([f]) + enc
        prev = cur
    return out


def _encode_png2(width, height, samples, color=2, depth=8, interlace=0,
                 filters=(0, 1, 2, 3, 4)):
    """``samples``: full raster of bytes (depth/8 bytes per sample,
    big-endian for 16-bit), row-major."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 6: 4}[color]
    bpp = channels * (depth // 8)
    if interlace == 0:
        raw = _filter_sub(samples, width, height, bpp, filters)
    else:
        raw = bytearray()
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub = bytearray()
            for yi in range(ph):
                y = y0 + yi * dy
                for xi in range(pw):
                    x = x0 + xi * dx
                    src = (y * width + x) * bpp
                    sub += samples[src:src + bpp]
            raw += _filter_sub(sub, pw, ph, bpp, filters)
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0,
                       interlace)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_decode_png_16bit_rgb_high_byte_reduction():
    w, h = 5, 4
    hi = _test_pixels(w, h, 3)             # expected 8-bit output
    lo = _test_pixels(w, h, 3)[::-1]       # arbitrary low bytes
    samples = bytes(b for pair in zip(hi, lo) for b in pair)
    assert mm.decode_image(
        _encode_png2(w, h, samples, color=2, depth=16)) == (w, h, hi)


def test_decode_png_adam7_rgb_every_filter():
    w, h = 9, 10  # exercises all 7 passes with non-trivial sizes
    rgb = _test_pixels(w, h, 3)
    got = mm.decode_image(_encode_png2(w, h, rgb, color=2, interlace=1))
    assert got == (w, h, rgb)


def test_decode_png_adam7_tiny_skips_empty_passes():
    # 3x3: passes 2 (x0=4) and several others are empty sub-images
    w, h = 3, 3
    rgb = _test_pixels(w, h, 3)
    assert mm.decode_image(
        _encode_png2(w, h, rgb, color=2, interlace=1)) == (w, h, rgb)


def test_decode_png_adam7_16bit_grayscale():
    w, h = 8, 5
    hi = _test_pixels(w, h, 1)
    lo = _test_pixels(w, h, 1)[::-1]
    samples = bytes(b for pair in zip(hi, lo) for b in pair)
    gw, gh, grgb = mm.decode_image(
        _encode_png2(w, h, samples, color=0, depth=16, interlace=1))
    assert (gw, gh) == (w, h)
    assert grgb == bytes(b for v in hi for b in (v, v, v))


# ---------------------------------------------------------------------------
# r6 part 2: sub-byte depths (1/2/4-bit gray + palette) and gray+alpha.
# The encoder packs samples MSB-first per (sub-)row independently, so
# Adam7 + packed-bit interaction is genuinely exercised.
# ---------------------------------------------------------------------------

def _pack_row(samples, depth):
    out = bytearray((len(samples) * depth + 7) // 8)
    for x, v in enumerate(samples):
        bit = x * depth
        out[bit // 8] |= (v & ((1 << depth) - 1)) << (8 - depth - bit % 8)
    return bytes(out)


def _encode_png3(width, height, samples, color, depth, interlace=0,
                 palette=None, filters=(0, 1, 2, 3, 4)):
    """``samples``: per-pixel tuples (1 value for gray/palette, 2 for GA,
    3 for RGB, 4 for RGBA), values already in [0, 2^depth)."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]

    def region(px, pw, ph):
        raw = bytearray()
        if depth >= 8:
            bps = depth // 8
            bpp = channels * bps
            flat = bytearray()
            for p in px:
                for c in range(channels):
                    if bps == 2:
                        flat += bytes((p[c], (p[c] * 31) % 256))  # low byte
                    else:
                        flat.append(p[c])
            raw += _filter_sub(flat, pw, ph, bpp, filters)
        else:
            stride = (pw * depth + 7) // 8
            packed = bytearray()
            for y in range(ph):
                packed += _pack_row(
                    [p[0] for p in px[y * pw:(y + 1) * pw]], depth)
            raw += _filter_sub(packed, stride, ph, 1, filters)
        return raw

    if interlace == 0:
        raw = region(samples, width, height)
    else:
        raw = bytearray()
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub = [samples[(y0 + yi * dy) * width + (x0 + xi * dx)]
                   for yi in range(ph) for xi in range(pw)]
            raw += region(sub, pw, ph)
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0,
                       interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette)
    out += (_png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))
    return out


def test_decode_png_4bit_grayscale():
    w, h = 9, 5  # odd width exercises row bit-padding
    vals = [((x * 3 + y * 5) % 16,) for y in range(h) for x in range(w)]
    pw, ph, rgb = mm.decode_image(_encode_png3(w, h, vals, color=0, depth=4))
    assert (pw, ph) == (w, h)
    want = bytes(b for (v,) in vals for b in (v * 17,) * 3)
    assert rgb == want


def test_decode_png_1bit_and_2bit_gray():
    w, h = 11, 4
    v1 = [((x ^ y) & 1,) for y in range(h) for x in range(w)]
    _, _, rgb1 = mm.decode_image(_encode_png3(w, h, v1, color=0, depth=1))
    assert rgb1 == bytes(b for (v,) in v1 for b in (v * 255,) * 3)
    v2 = [((x + y) % 4,) for y in range(h) for x in range(w)]
    _, _, rgb2 = mm.decode_image(_encode_png3(w, h, v2, color=0, depth=2))
    assert rgb2 == bytes(b for (v,) in v2 for b in (v * 85,) * 3)


def test_decode_png_2bit_palette():
    w, h = 7, 3
    palette = bytes((250, 1, 2, 3, 251, 4, 5, 6, 252, 7, 8, 253))
    idx = [((x + 2 * y) % 4,) for y in range(h) for x in range(w)]
    _, _, rgb = mm.decode_image(
        _encode_png3(w, h, idx, color=3, depth=2, palette=palette))
    want = bytearray()
    for (v,) in idx:
        want += palette[3 * v:3 * v + 3]
    assert rgb == bytes(want)


def test_decode_png_gray_alpha_drops_alpha():
    w, h = 6, 4
    ga = [((x * 16 + y) % 256, (y * 40) % 256)
          for y in range(h) for x in range(w)]
    _, _, rgb = mm.decode_image(_encode_png3(w, h, ga, color=4, depth=8))
    assert rgb == bytes(b for (v, _a) in ga for b in (v,) * 3)


def test_decode_png_sub8_adam7_combined():
    """2-bit grayscale + Adam7: each pass re-packs its own rows, so the
    packed-bit stride math must hold per sub-image, not per full row."""
    w, h = 10, 9
    vals = [((x * x + y) % 4,) for y in range(h) for x in range(w)]
    pw, ph, rgb = mm.decode_image(
        _encode_png3(w, h, vals, color=0, depth=2, interlace=1))
    assert (pw, ph) == (w, h)
    assert rgb == bytes(b for (v,) in vals for b in (v * 85,) * 3)
