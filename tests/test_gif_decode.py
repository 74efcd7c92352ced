"""Differential test for the pure-Python GIF decoder: an independent
test-side encoder with its own LZW COMPRESSOR (code-width growth +
explicit clear-code resets) produces real GIF87a/89a payloads whose
decode must reproduce the palette image exactly."""

from __future__ import annotations

import struct

import pytest

from skywalking_banyandb_spark.functions import multimodal as mm
from skywalking_banyandb_spark.functions.gif import decode_gif

_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _LZW:
    """Independent GIF-LZW compressor (emits an initial clear code and
    periodic resets when the dictionary tops out at 12 bits)."""

    def __init__(self, min_code_size):
        self.mcs = min_code_size
        self.clear = 1 << min_code_size
        self.eoi = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self._reset()

    def _reset(self):
        self.table = {bytes([i]): i for i in range(self.clear)}
        self.next = self.eoi + 1
        self.width = self.mcs + 1

    def _emit(self, code):
        self.acc |= code << self.nbits
        self.nbits += self.width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def compress(self, data):
        self._emit(self.clear)
        cur = b""
        for b in data:
            nxt = cur + bytes([b])
            if nxt in self.table:
                cur = nxt
                continue
            self._emit(self.table[cur])
            self.table[nxt] = self.next
            self.next += 1
            if self.next - 1 == (1 << self.width) and self.width < 12:
                self.width += 1
            elif self.next > (1 << 12):
                self._emit(self.clear)
                self._reset()
            cur = bytes([b])
        if cur:
            self._emit(self.table[cur])
        self._emit(self.eoi)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def encode_gif(width, height, idx, palette, interlace=False,
               min_code_size=None, transparent=None, version=b"89a"):
    """``idx``: per-pixel palette indices row-major; ``palette``: RGB
    bytes, power-of-two entry count."""
    n = len(palette) // 3
    depth = max(1, (n - 1).bit_length())
    assert n == 1 << depth
    mcs = min_code_size or max(2, depth)
    out = bytearray(b"GIF" + version)
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (depth - 1), 0, 0)
    out += palette
    if transparent is not None:
        out += bytes((0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0))
    ifl = 0x40 if interlace else 0
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, ifl)
    data = bytes(idx)
    if interlace:
        rows = [data[y * width:(y + 1) * width] for y in range(height)]
        seq = bytearray()
        for start, step in _GIF_PASSES:
            for y in range(start, height, step):
                seq += rows[y]
        data = bytes(seq)
    comp = _LZW(mcs).compress(data)
    out.append(mcs)
    for i in range(0, len(comp), 255):
        chunk = comp[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


def _pal(n):
    import hashlib

    out = bytearray()
    i = 0
    while len(out) < 3 * n:
        out += hashlib.md5(f"pal{i}".encode()).digest()
        i += 1
    return bytes(out[:3 * n])


def _expect(idx, palette):
    out = bytearray()
    for v in idx:
        out += palette[3 * v:3 * v + 3]
    return bytes(out)


def test_gif_basic_roundtrip():
    w, h = 13, 7
    pal = _pal(16)
    idx = [(x * 3 + y * 7) % 16 for y in range(h) for x in range(w)]
    assert decode_gif(encode_gif(w, h, idx, pal)) == (w, h, _expect(idx, pal))


def test_gif_code_width_growth():
    """Enough distinct runs to push the LZW dictionary through several
    code widths."""
    w, h = 64, 32
    pal = _pal(128)
    idx = [(x * x + 31 * y) % 128 for y in range(h) for x in range(w)]
    assert decode_gif(encode_gif(w, h, idx, pal)) == (w, h, _expect(idx, pal))


def test_gif_dictionary_reset():
    """A noisy image large enough to overflow 12-bit codes forces the
    encoder to emit a mid-stream CLEAR; the decoder must resync."""
    import random

    random.seed(3)
    w, h = 120, 90
    pal = _pal(256)
    idx = [random.randrange(256) for _ in range(w * h)]
    assert decode_gif(encode_gif(w, h, idx, pal)) == (w, h, _expect(idx, pal))


def test_gif_interlaced():
    w, h = 17, 13
    pal = _pal(8)
    idx = [(x + y) % 8 for y in range(h) for x in range(w)]
    got = decode_gif(encode_gif(w, h, idx, pal, interlace=True))
    assert got == (w, h, _expect(idx, pal))


def test_gif_transparency_resolves_to_background():
    w, h = 4, 2
    pal = _pal(4)
    idx = [0, 1, 2, 3, 3, 2, 1, 0]
    got = decode_gif(encode_gif(w, h, idx, pal, transparent=2))
    # transparent index 2 renders as background color (index 0 here)
    want = bytearray()
    for v in idx:
        src = 0 if v == 2 else v
        want += pal[3 * src:3 * src + 3]
    assert got == (w, h, bytes(want))


def test_gif_through_decode_image_and_gates():
    w, h = 5, 5
    pal = _pal(4)
    idx = [(x * y) % 4 for y in range(h) for x in range(w)]
    assert mm.decode_image(encode_gif(w, h, idx, pal))[:2] == (w, h)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"GIF00a" + b"\x00" * 20)
    # truncated LZW stream must raise, not return short RGB
    full = encode_gif(8, 8, [(x + y) % 4 for y in range(8) for x in range(8)],
                      _pal(4))
    with pytest.raises(ValueError):
        decode_gif(full[:len(full) // 2] + b"\x00\x3B")


def test_gif_out_of_range_background_does_not_resize_rgb():
    """ADVICE r6: a screen-descriptor background byte >= the active color
    table's entry count must NOT let the slice assignment silently resize
    the rgb buffer — the decoder falls back to index 0."""
    w, h = 3, 1
    pal = _pal(4)
    idx = [0, 2, 1]
    payload = bytearray(encode_gif(w, h, idx, pal, transparent=2))
    # byte 11 is the background color index in the logical screen
    # descriptor; point it past the 4-entry table
    payload[11] = 200
    got_w, got_h, rgb = decode_gif(bytes(payload))
    assert (got_w, got_h) == (w, h)
    assert len(rgb) == w * h * 3  # was 6 instead of 9 before the fix
    want = bytearray()
    for v in idx:
        src = 0 if v == 2 else v  # transparent -> clamped bg = 0
        want += pal[3 * src:3 * src + 3]
    assert rgb == bytes(want)
