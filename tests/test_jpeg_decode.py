"""Differential test for the pure-Python baseline JPEG decoder: an
INDEPENDENT test-side encoder (forward DCT, Annex K quant/Huffman tables,
its own bitwriter) produces real baseline JFIF payloads; the production
decoder must reproduce the source image within quantization tolerance —
and exactly for DC-only (uniform) blocks, where quantization is lossless
by construction. Covers 4:4:4 and 4:2:0 sampling, grayscale, restart
intervals, PROGRESSIVE scans (an independent libjpeg-scan-script encoder:
DC/AC successive approximation, spectral bands, EOB runs — decoded output
must equal the baseline decode of the same coefficients), and the
remaining 12-bit / exotic-SOF gates."""

from __future__ import annotations

import math
import struct

import pytest

from skywalking_banyandb_spark.functions import multimodal as mm
from skywalking_banyandb_spark.functions.jpeg import ZIGZAG, decode_jpeg

# ---------------------------------------------------------------------------
# Annex K tables (T.81) — the standard luminance/chrominance quant tables
# and the "typical" Huffman tables every real encoder ships.
# ---------------------------------------------------------------------------

QL = [  # luminance quant, natural order
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QC = [  # chrominance quant
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

DC_L_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_L_SYMS = list(range(12))
DC_C_COUNTS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_C_SYMS = list(range(12))
AC_L_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_L_SYMS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_C_COUNTS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_C_SYMS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_FDCT_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0) / 2.0
        for x in range(8)
    ]
    for u in range(8)
]


def _fdct(block):
    """Forward 8×8 DCT of level-shifted samples."""
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            c = _FDCT_COS[u]
            tmp[y * 8 + u] = sum(
                block[y * 8 + x] * c[x] for x in range(8))
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            c = _FDCT_COS[v]
            out[v * 8 + u] = sum(
                tmp[y * 8 + u] * c[y] for y in range(8))
    return out


def _huff_codes(counts, syms):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[syms[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)


def _mag(v):
    """(size, magnitude-bits) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coef = _fdct(block)
    zz = [int(round(coef[ZIGZAG[k]] / q[k])) for k in range(64)]
    diff = zz[0] - pred
    n, bits = _mag(diff)
    code, ln = dc_codes[n]
    bw.put(code, ln)
    if n:
        bw.put(bits, n)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        n, bits = _mag(zz[k])
        code, ln = ac_codes[(run << 4) | n]
        bw.put(code, ln)
        bw.put(bits, n)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return zz[0]


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(width, height, rgb, subsample=False, gray=False,
                restart_interval=0):
    """Independent baseline JFIF encoder: 4:4:4 (or 4:2:0 with
    ``subsample``), Annex K tables, optional restart interval."""
    # color convert
    ys, cbs, crs = [], [], []
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        ys.append(min(255.0, max(0.0, y)))
        cbs.append(min(255.0, max(0.0, 128 - 0.168736 * r
                                  - 0.331264 * g + 0.5 * b)))
        crs.append(min(255.0, max(0.0, 128 + 0.5 * r - 0.418688 * g
                                  - 0.081312 * b)))

    def plane_block(plane, pw, ph, ox, oy):
        blk = []
        for yy in range(8):
            for xx in range(8):
                x = min(ox + xx, pw - 1)
                y = min(oy + yy, ph - 1)
                blk.append(plane[y * pw + x] - 128.0)
        return blk

    dc_l = _huff_codes(DC_L_COUNTS, DC_L_SYMS)
    ac_l = _huff_codes(AC_L_COUNTS, AC_L_SYMS)
    dc_c = _huff_codes(DC_C_COUNTS, DC_C_SYMS)
    ac_c = _huff_codes(AC_C_COUNTS, AC_C_SYMS)
    ql = [QL[ZIGZAG[k]] for k in range(64)]
    qc = [QC[ZIGZAG[k]] for k in range(64)]

    bw = _BitWriter()
    rst = 0
    if gray:
        comps = [(1, 1, 1, 0)]
        preds = [0]
        mcux, mcuy = (width + 7) // 8, (height + 7) // 8
        mcun = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcun and \
                        mcun % restart_interval == 0:
                    bw.pad()
                    bw.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    preds = [0]
                mcun += 1
                preds[0] = _encode_block(
                    bw, plane_block(ys, width, height, mx * 8, my * 8),
                    ql, dc_l, ac_l, preds[0])
    elif not subsample:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        preds = [0, 0, 0]
        mcux, mcuy = (width + 7) // 8, (height + 7) // 8
        mcun = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcun and \
                        mcun % restart_interval == 0:
                    bw.pad()
                    bw.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    preds = [0, 0, 0]
                mcun += 1
                for ci, (plane, q, dc, ac) in enumerate((
                        (ys, ql, dc_l, ac_l), (cbs, qc, dc_c, ac_c),
                        (crs, qc, dc_c, ac_c))):
                    preds[ci] = _encode_block(
                        bw, plane_block(plane, width, height,
                                        mx * 8, my * 8),
                        q, dc, ac, preds[ci])
    else:  # 4:2:0
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        cw, ch = (width + 1) // 2, (height + 1) // 2
        sub_cb, sub_cr = [], []
        for y in range(ch):
            for x in range(cw):
                acc_b = acc_r = 0.0
                n = 0
                for dy in range(2):
                    for dx in range(2):
                        sx, sy = min(2 * x + dx, width - 1), \
                            min(2 * y + dy, height - 1)
                        acc_b += cbs[sy * width + sx]
                        acc_r += crs[sy * width + sx]
                        n += 1
                sub_cb.append(acc_b / n)
                sub_cr.append(acc_r / n)
        preds = [0, 0, 0]
        mcux, mcuy = (width + 15) // 16, (height + 15) // 16
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(2):
                    for bx in range(2):
                        preds[0] = _encode_block(
                            bw, plane_block(ys, width, height,
                                            (mx * 2 + bx) * 8,
                                            (my * 2 + by) * 8),
                            ql, dc_l, ac_l, preds[0])
                preds[1] = _encode_block(
                    bw, plane_block(sub_cb, cw, ch, mx * 8, my * 8),
                    qc, dc_c, ac_c, preds[1])
                preds[2] = _encode_block(
                    bw, plane_block(sub_cr, cw, ch, mx * 8, my * 8),
                    qc, dc_c, ac_c, preds[2])
    bw.pad()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc))
    out += _seg(0xC4, bytes([0x00] + DC_L_COUNTS) + bytes(DC_L_SYMS))
    out += _seg(0xC4, bytes([0x10] + AC_L_COUNTS) + bytes(AC_L_SYMS))
    if not gray:
        out += _seg(0xC4, bytes([0x01] + DC_C_COUNTS) + bytes(DC_C_SYMS))
        out += _seg(0xC4, bytes([0x11] + AC_C_COUNTS) + bytes(AC_C_SYMS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, hh, vv, tq in comps:
        sof += bytes([cid, (hh << 4) | vv, tq])
    out += _seg(0xC0, sof)
    sos = bytes([len(comps)])
    for ci, (cid, _, _, _) in enumerate(comps):
        sos += bytes([cid, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _gradient(width, height):
    rgb = bytearray()
    for y in range(height):
        for x in range(width):
            rgb += bytes((
                (x * 255) // max(width - 1, 1),
                (y * 255) // max(height - 1, 1),
                ((x + y) * 255) // max(width + height - 2, 1),
            ))
    return bytes(rgb)


def _maxerr(a, b):
    return max(abs(x - y) for x, y in zip(a, b))


def test_jpeg_uniform_color_near_exact():
    """A uniform image is DC-only; quantized DC error <= half a quant step
    over 8 -> the decode is within ~2 levels after color round-trips."""
    w, h = 16, 8
    rgb = bytes((120, 65, 200)) * (w * h)
    dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb))
    assert (dw, dh) == (w, h)
    assert _maxerr(out, rgb) <= 3


def test_jpeg_gradient_444_within_quant_tolerance():
    w, h = 24, 17  # non-multiple of 8 exercises edge-block replication
    rgb = _gradient(w, h)
    dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb))
    assert (dw, dh) == (w, h)
    # smooth gradients survive Annex-K quantization well
    assert _maxerr(out, rgb) <= 32
    mean_err = sum(abs(a - b) for a, b in zip(out, rgb)) / len(rgb)
    assert mean_err <= 6.0


def test_jpeg_grayscale():
    w, h = 16, 16
    rgb = bytes(v for y in range(h) for x in range(w)
                for v in ((x * 16 + y) % 256,) * 3)
    dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, gray=True))
    assert (dw, dh) == (w, h)
    # decoded is gray replicated to RGB
    assert all(out[3 * i] == out[3 * i + 1] == out[3 * i + 2]
               for i in range(w * h))


def test_jpeg_420_subsampling():
    w, h = 32, 24
    rgb = _gradient(w, h)
    dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, subsample=True))
    assert (dw, dh) == (w, h)
    assert _maxerr(out, rgb) <= 48  # chroma is quarter-resolution
    mean_err = sum(abs(a - b) for a, b in zip(out, rgb)) / len(rgb)
    assert mean_err <= 8.0


def test_jpeg_restart_intervals():
    w, h = 40, 8
    rgb = _gradient(w, h)
    plain = decode_jpeg(encode_jpeg(w, h, rgb))
    restarted = decode_jpeg(encode_jpeg(w, h, rgb, restart_interval=2))
    assert plain == restarted  # same coefficients, same result


def test_jpeg_through_decode_image():
    w, h = 8, 8
    rgb = bytes((10, 200, 30)) * (w * h)
    got = mm.decode_image(encode_jpeg(w, h, rgb))
    assert got[:2] == (w, h)
    assert _maxerr(got[2], rgb) <= 3


def test_jpeg_remaining_gates():
    """Progressive (SOF2) decodes as of r6 part 2 — the remaining gates
    are 12-bit precision and the exotic SOF variants (lossless,
    arithmetic, hierarchical)."""
    w, h = 8, 8
    payload = bytearray(encode_jpeg(w, h, _gradient(w, h)))
    i = payload.index(b"\xff\xc0")
    # 12-bit precision: first SOF byte after the length field
    payload[i + 4] = 12
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg(bytes(payload))
    payload[i + 4] = 8
    payload[i + 1] = 0xC3  # lossless SOF3
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(payload))


# ---------------------------------------------------------------------------
# r6 part 2: PROGRESSIVE (SOF2). The encoder below implements the libjpeg
# scan-script structure independently: DC first at Al=1 + DC refinement,
# then per component AC spectral bands at Al=1, then AC refinement scans
# at Ah=1 -> Al=0 (newly-significant s=1 codes, buffered correction bits,
# EOB-run accumulation across blocks).
# ---------------------------------------------------------------------------

class _ProgBits(_BitWriter):
    def sym(self, codes, symbol):
        c, ln = codes[symbol]
        self.put(c, ln)


def _quant_blocks(plane, pw, ph, q):
    """All 8x8 blocks of a (padded) plane as quantized zigzag coef lists."""
    out = []
    bw, bh = (pw + 7) // 8, (ph + 7) // 8
    for by in range(bh):
        for bx in range(bw):
            blk = []
            for yy in range(8):
                for xx in range(8):
                    x = min(bx * 8 + xx, pw - 1)
                    y = min(by * 8 + yy, ph - 1)
                    blk.append(plane[y * pw + x] - 128.0)
            coef = _fdct(blk)
            out.append([int(round(coef[ZIGZAG[k]] / q[k]))
                        for k in range(64)])
    return out, bw, bh


def _emit_dc_first(bw_, blocks_per_comp, dc_codes_per_comp, al):
    preds = [0] * len(blocks_per_comp)
    nb = len(blocks_per_comp[0])
    for blk in range(nb):
        for ci, blocks in enumerate(blocks_per_comp):
            v = blocks[blk][0] >> al  # arithmetic shift per T.81 DC PT
            diff = v - preds[ci]
            preds[ci] = v
            n, bits = _mag(diff)
            bw_.sym(dc_codes_per_comp[ci], n)
            if n:
                bw_.put(bits, n)


def _emit_dc_refine(bw_, blocks_per_comp, al):
    nb = len(blocks_per_comp[0])
    for blk in range(nb):
        for blocks in blocks_per_comp:
            bw_.put((blocks[blk][0] >> al) & 1, 1)


def _emit_ac_first(bw_, blocks, ac_codes, ss, se, al):
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        bw_.sym(ac_codes, r << 4)
        if r:
            bw_.put(eobrun - (1 << r), r)
        eobrun = 0

    for zz in blocks:
        band = []
        for k in range(ss, se + 1):
            v = zz[k]
            band.append(int(v / (1 << al)) if al else v)  # PT trunc to 0
        last = max((i for i, v in enumerate(band) if v), default=-1)
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(last + 1):
            if band[i] == 0:
                run += 1
                continue
            while run > 15:
                bw_.sym(ac_codes, 0xF0)
                run -= 16
            n, bits = _mag(band[i])
            bw_.sym(ac_codes, (run << 4) | n)
            bw_.put(bits, n)
            run = 0
        if last < se - ss:
            eobrun += 1
    flush_eob()


def _emit_ac_refine(bw_, blocks, ac_codes, ss, se, al):
    """libjpeg encode_mcu_AC_refine: s=1 codes for newly-significant
    coefficients, correction bits buffered and flushed after each emitted
    symbol, EOB runs carry the buffered bits of the whole run."""
    eobrun = 0
    br_bits: list = []

    def flush_eob():
        nonlocal eobrun, br_bits
        if eobrun == 0 and not br_bits:
            return
        if eobrun == 0:
            eobrun = 1  # only correction bits pending -> EOB run of 1?
        r = eobrun.bit_length() - 1
        bw_.sym(ac_codes, r << 4)
        if r:
            bw_.put(eobrun - (1 << r), r)
        for b in br_bits:
            bw_.put(b, 1)
        eobrun = 0
        br_bits = []

    for zz in blocks:
        temp = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        signs = [1 if zz[k] > 0 else 0 for k in range(ss, se + 1)]
        run = 0
        pending: list = []
        emitted_any = False
        for i, v in enumerate(temp):
            if v == 0:
                run += 1
                continue
            if v > 1:  # already significant: correction bit
                pending.append(v & 1)
                continue
            # newly significant (v == 1); trailing corrections after the
            # LAST of these join the EOB run via `pending`
            if not emitted_any:
                flush_eob()  # close any cross-block EOB run first
                emitted_any = True
            while run > 15:
                bw_.sym(ac_codes, 0xF0)
                for b in pending:
                    bw_.put(b, 1)
                pending = []
                run -= 16
            bw_.sym(ac_codes, (run << 4) | 1)
            bw_.put(signs[i], 1)
            for b in pending:
                bw_.put(b, 1)
            pending = []
            run = 0
        if run > 0 or pending:
            eobrun += 1
            br_bits.extend(pending)
            if eobrun == 0x7FFF:
                flush_eob()
        elif not emitted_any:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(width, height, rgb, gray=False):
    ys, cbs, crs = [], [], []
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        ys.append(min(255.0, max(0.0, 0.299 * r + 0.587 * g + 0.114 * b)))
        cbs.append(min(255.0, max(0.0, 128 - 0.168736 * r
                                  - 0.331264 * g + 0.5 * b)))
        crs.append(min(255.0, max(0.0, 128 + 0.5 * r - 0.418688 * g
                                  - 0.081312 * b)))
    ql = [QL[ZIGZAG[k]] for k in range(64)]
    qc = [QC[ZIGZAG[k]] for k in range(64)]
    dc_l = _huff_codes(DC_L_COUNTS, DC_L_SYMS)
    dc_c = _huff_codes(DC_C_COUNTS, DC_C_SYMS)
    # progressive needs EOBn symbols (r<<4, r=1..14) that the baseline
    # Annex-K AC tables lack — real progressive encoders ship custom
    # tables; this flat 176-symbol length-8 table covers every (r, s)
    ac_p_syms = sorted({(r << 4) | v for r in range(16) for v in range(11)})
    ac_p_counts = [0] * 16
    ac_p_counts[7] = len(ac_p_syms)
    ac_l = ac_c = _huff_codes(ac_p_counts, ac_p_syms)

    if gray:
        planes = [(ys, ql, dc_l, ac_l, 1)]
    else:
        planes = [(ys, ql, dc_l, ac_l, 1), (cbs, qc, dc_c, ac_c, 2),
                  (crs, qc, dc_c, ac_c, 3)]
    blocks = []
    for plane, q, _dc, _ac, _cid in planes:
        bl, _, _ = _quant_blocks(plane, width, height, q)
        blocks.append(bl)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc))
    out += _seg(0xC4, bytes([0x00] + DC_L_COUNTS) + bytes(DC_L_SYMS))
    out += _seg(0xC4, bytes([0x10] + ac_p_counts) + bytes(ac_p_syms))
    if not gray:
        out += _seg(0xC4, bytes([0x01] + DC_C_COUNTS) + bytes(DC_C_SYMS))
        out += _seg(0xC4, bytes([0x11] + ac_p_counts) + bytes(ac_p_syms))
    sof = struct.pack(">BHHB", 8, height, width, len(planes))
    for _pl, _q, _dc, _ac, cid in planes:
        tq = 0 if cid == 1 else 1
        sof += bytes([cid, 0x11, tq])
    out += _seg(0xC2, sof)

    def sos(comp_ids, tables, ss, se, ah, al, body):
        hdr = bytes([len(comp_ids)])
        for cid, tt in zip(comp_ids, tables):
            hdr += bytes([cid, tt])
        hdr += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, hdr) + body

    # scan 1: DC first, all components, Al=1
    bw_ = _ProgBits()
    _emit_dc_first(bw_, blocks, [p[2] for p in planes], 1)
    bw_.pad()
    out += sos([p[4] for p in planes],
               [0x00 if p[4] == 1 else 0x11 for p in planes],
               0, 0, 0, 1, bw_.out)
    # scans 2..: AC first per component, two bands, Al=1
    for ci, (_pl, _q, _dc, _acc, cid) in enumerate(planes):
        codes = ac_l if cid == 1 else ac_c
        for (ss_, se_) in ((1, 5), (6, 63)):
            bw_ = _ProgBits()
            _emit_ac_first(bw_, blocks[ci], codes, ss_, se_, 1)
            bw_.pad()
            out += sos([cid], [0x10 if cid == 1 else 0x11],
                       ss_, se_, 0, 1, bw_.out)
    # DC refinement Ah=1 -> Al=0
    bw_ = _ProgBits()
    _emit_dc_refine(bw_, blocks, 0)
    bw_.pad()
    out += sos([p[4] for p in planes], [0x00] * len(planes), 0, 0, 1, 0,
               bw_.out)
    # AC refinement per component, full band, Ah=1 -> Al=0
    for ci, (_pl, _q, _dc, _acc, cid) in enumerate(planes):
        codes = ac_l if cid == 1 else ac_c
        bw_ = _ProgBits()
        _emit_ac_refine(bw_, blocks[ci], codes, 1, 63, 0)
        bw_.pad()
        out += sos([cid], [0x10 if cid == 1 else 0x11], 1, 63, 1, 0,
                   bw_.out)
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_equals_baseline():
    """The progressive scan script carries the SAME quantized
    coefficients as the baseline encoding, so decode must be IDENTICAL to
    the baseline decode of the same image."""
    w, h = 24, 17
    rgb = _gradient(w, h)
    base = decode_jpeg(encode_jpeg(w, h, rgb))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb))
    assert prog == base


def test_jpeg_progressive_gray():
    w, h = 16, 16
    rgb = bytes(v for y in range(h) for x in range(w)
                for v in ((x * 16 + y) % 256,) * 3)
    base = decode_jpeg(encode_jpeg(w, h, rgb, gray=True))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb, gray=True))
    assert prog == base


def test_jpeg_progressive_uniform_and_noise():
    import random

    w, h = 16, 8
    uni = bytes((120, 65, 200)) * (w * h)
    assert decode_jpeg(encode_jpeg_progressive(w, h, uni)) == \
        decode_jpeg(encode_jpeg(w, h, uni))
    random.seed(11)
    noise = bytes(random.randrange(256) for _ in range(w * h * 3))
    assert decode_jpeg(encode_jpeg_progressive(w, h, noise)) == \
        decode_jpeg(encode_jpeg(w, h, noise))


def test_jpeg_progressive_random_stress():
    """Randomized sizes + content: progressive must equal baseline on the
    same quantized coefficients every time (EOB-run / refinement-bit
    interplay is data-dependent, so breadth matters here)."""
    import random

    rnd = random.Random(1234)
    for trial in range(8):
        w = rnd.randrange(8, 41)
        h = rnd.randrange(8, 33)
        style = trial % 3
        if style == 0:
            rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
        elif style == 1:
            rgb = _gradient(w, h)
        else:  # blocky: exercises long zero runs + EOB runs
            rgb = bytes(((x // 8 + y // 8) % 2) * 255
                        for y in range(h) for x in range(w)
                        for _ in range(3))
        assert decode_jpeg(encode_jpeg_progressive(w, h, rgb)) == \
            decode_jpeg(encode_jpeg(w, h, rgb)), (w, h, style)


def test_multi_scan_baseline_gated_cleanly():
    """ADVICE r6: a baseline JPEG whose SOS covers only a subset of the
    frame components (legal multi-scan layout) must raise the module's
    explicit NotImplementedError gate, not misparse entropy data and die
    with a KeyError."""
    sof = struct.pack(">BHHB", 8, 8, 8, 3)
    for cid in (1, 2, 3):
        sof += struct.pack(">BBB", cid, 0x11, 0)
    sos = bytes((1, 1, 0x00, 0, 63, 0))  # ns=1: component 1 only
    payload = (b"\xFF\xD8"
               + b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
               + b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
               + b"\xFF\xD9")
    with pytest.raises(NotImplementedError, match="multi-scan baseline"):
        decode_jpeg(payload)
