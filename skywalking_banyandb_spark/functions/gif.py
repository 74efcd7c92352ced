"""Pure-Python GIF decoder (87a/89a) — first frame to RGB.

Completes the common-web-format set beside PNG (complete) and baseline
JPEG in ``decode_image``. Scope: the first image descriptor of a GIF87a /
GIF89a stream — global or local color table, LZW-compressed indices,
interlaced or not, transparent pixels resolved against the background
color index (alpha is dropped anyway). Animation beyond frame 0 and PLAIN
TEXT extensions are skipped per the spec's block structure.

Differentially tested (``tests/test_gif_decode.py``) against an
independent test-side encoder with its own LZW compressor — including
code-width growth and dictionary-reset (clear code) paths.
"""

from __future__ import annotations

import struct
from typing import Tuple

# GIF interlace row order: 4 passes (RFC: GIF89a appendix E)
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """LZW decompression (GIF variant: variable code width starting at
    min_code_size+1, clear/EOI codes, MSB-last bit packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    prev = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                next_code = eoi + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                if len(out) < expect:
                    raise ValueError("GIF LZW ended early")
                return bytes(out[:expect])
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
            if len(out) >= expect:
                return bytes(out[:expect])
    if len(out) < expect:
        raise ValueError("truncated GIF LZW stream")
    return bytes(out[:expect])


def decode_gif(payload: bytes) -> Tuple[int, int, bytes]:
    """Decode the FIRST frame of a GIF to ``(width, height, rgb_bytes)``."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    try:
        return _decode_gif_body(payload)
    except (struct.error, IndexError) as e:
        # walking a truncated/corrupt block structure must surface as a
        # decode error, not an internal unpack failure
        raise ValueError(f"corrupt GIF stream: {e}") from e


def _decode_gif_body(payload: bytes) -> Tuple[int, int, bytes]:
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    transparent = None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control: transparency flag
                sz = payload[pos]
                gfl = payload[pos + 1]
                if gfl & 0x01:
                    transparent = payload[pos + 4]
                pos += 1 + sz
            # skip remaining sub-blocks
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02X}")
        # image descriptor
        ix, iy, iw, ih, ifl = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        lct = b""
        if ifl & 0x80:
            n = 2 << (ifl & 0x07)
            lct = payload[pos:pos + 3 * n]
            pos += 3 * n
        table = lct or gct
        if not table:
            raise ValueError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            sz = payload[pos]
            data += payload[pos + 1:pos + 1 + sz]
            pos += 1 + sz
        idx = _lzw_decode(bytes(data), min_code, iw * ih)
        if ifl & 0x40:  # interlaced: reorder rows
            rows = [idx[r * iw:(r + 1) * iw] for r in range(ih)]
            ordered: list = [None] * ih
            src = 0
            for start, step in _GIF_PASSES:
                for y in range(start, ih, step):
                    ordered[y] = rows[src]
                    src += 1
            idx = b"".join(ordered)
        out = bytearray(iw * ih * 3)
        n_entries = len(table) // 3
        # the screen descriptor's background byte is independent of the
        # *active* (possibly local, possibly smaller) color table; an
        # out-of-range bg would make table[3*bg:3*bg+3] a short slice and
        # the slice-assignments below would silently RESIZE the rgb
        # buffer (the same hazard the PNG palette path guards against) —
        # fall back to index 0 per the common viewer behavior
        if bg >= n_entries:
            bg = 0
        for i, v in enumerate(idx):
            if v >= n_entries:
                raise ValueError(
                    f"GIF color index {v} out of range for "
                    f"{n_entries}-entry table")
            src = v if (transparent is None or v != transparent) else bg
            out[3 * i:3 * i + 3] = table[3 * src:3 * src + 3]
        # first frame only; the logical screen may be larger but the
        # common single-image case has (ix, iy) = (0, 0), (iw, ih) = screen
        if (ix, iy, iw, ih) != (0, 0, sw, sh):
            # compose onto the background-colored screen
            screen = bytearray(
                bytes(table[3 * bg:3 * bg + 3]) * (sw * sh))
            for y in range(ih):
                srow = (iy + y) * sw + ix
                screen[3 * srow:3 * (srow + iw)] = \
                    out[3 * y * iw:3 * (y + 1) * iw]
            return sw, sh, bytes(screen)
        return iw, ih, bytes(out)
    raise ValueError("GIF has no image data")
