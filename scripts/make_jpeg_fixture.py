"""Generate tests/fixtures/{ramp444.jpg,ramp420.jpg} — deterministic
baseline JFIF files for `pysparkenc.multimodal.decode_jpeg`.

This is a minimal *baseline sequential* JPEG encoder (SOI/APP0/DQT/
SOF0/DHT/SOS/EOI) written with stdlib + numpy only, using the PUBLIC
ITU-T T.81 Annex K example tables (quantization K.1/K.2, Huffman
K.3.3) — the same defaults libjpeg ships. Two fixtures:

- ramp444.jpg: 32x24 RGB, no chroma subsampling (1x1), exercises the
  plain one-block-per-MCU path.
- ramp420.jpg: 48x40 RGB, 2x2 (4:2:0) subsampling + a restart interval
  of 2 MCUs, exercising interleaved multi-block MCUs, chroma
  upsampling, edge MCU padding (48x40 is not a multiple of 16 in y),
  and RSTn handling.

Pixels are smooth linear ramps (no mod-256 wraps), so quantization
error stays small and the decode test can pin a tight tolerance.
Rerunning reproduces the committed bytes exactly (pure integer/float64
arithmetic, no RNG, no timestamps)."""

from __future__ import annotations

import os
import struct

import numpy as np

# ITU-T T.81 Annex K.1 / K.2 quantization tables (row-major).
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32).reshape(8, 8)

# Annex K.3.3 Huffman table specs: (BITS[1..16], HUFFVAL).
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

_D = None


def dct_matrix() -> np.ndarray:
    global _D
    if _D is None:
        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
        d[0, :] *= 1.0 / np.sqrt(2.0)
        _D = d
    return _D


def huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits for a signed value."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_block(bw: BitWriter, coeffs: np.ndarray, prev_dc: int,
                 dc_tab: dict, ac_tab: dict) -> int:
    zz = coeffs.reshape(64)[ZIGZAG]
    s, extra = magnitude(int(zz[0]) - prev_dc)
    c, ln = dc_tab[s]
    bw.put(c, ln)
    if s:
        bw.put(extra, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        s, extra = magnitude(v)
        c, ln = ac_tab[(run << 4) | s]
        bw.put(c, ln)
        bw.put(extra, s)
        run = 0
    if run:
        c, ln = ac_tab[0x00]  # EOB
        bw.put(c, ln)
    return int(zz[0])


def component_plane(rgb: np.ndarray, idx: int, h: int, v: int,
                    hmax: int, vmax: int) -> np.ndarray:
    """YCbCr plane for component idx, box-subsampled to its factors."""
    if rgb.ndim == 2:  # grayscale input: the single plane IS luma
        p = rgb.astype(np.float64)
        return p
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    if idx == 0:
        p = 0.299 * r + 0.587 * g + 0.114 * b
    elif idx == 1:
        p = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    else:
        p = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if h != hmax or v != vmax:
        fy, fx = vmax // v, hmax // h
        hh, ww = p.shape
        py = (hh + fy - 1) // fy * fy
        px = (ww + fx - 1) // fx * fx
        pad = np.pad(p, ((0, py - hh), (0, px - ww)), mode="edge")
        p = pad.reshape(py // fy, fy, px // fx, fx).mean(axis=(1, 3))
    return p


def blocks_of(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge mode), DCT, quantize -> int blocks."""
    hh, ww = plane.shape
    ph = (hh + 7) // 8 * 8
    pw = (ww + 7) // 8 * 8
    p = np.pad(plane, ((0, ph - hh), (0, pw - ww)), mode="edge") - 128.0
    nby, nbx = ph // 8, pw // 8
    blk = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    d = dct_matrix()
    f = np.einsum("ux,...xy,vy->...uv", d, blk, d)
    q = np.round(f / qt).astype(np.int64)
    return q  # (nby, nbx, 8, 8)


def encode_jpeg(rgb: np.ndarray, sampling: tuple, restart: int = 0) -> bytes:
    """Baseline JFIF encode. sampling = ((h,v) per component);
    a 2-D input array encodes as single-component grayscale."""
    hgt, wid = rgb.shape[:2]
    ncomp = 1 if rgb.ndim == 2 else 3
    sampling = sampling[:ncomp]
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    qts = (QT_LUMA, QT_CHROMA, QT_CHROMA)
    dc_tabs = (huff_codes(*DC_LUMA), huff_codes(*DC_CHROMA),
               huff_codes(*DC_CHROMA))
    ac_tabs = (huff_codes(*AC_LUMA), huff_codes(*AC_CHROMA),
               huff_codes(*AC_CHROMA))
    comp_blocks = []
    for i, (h, v) in enumerate(sampling):
        plane = component_plane(rgb, i, h, v, hmax, vmax)
        q = blocks_of(plane, qts[i])
        # pad block grid so every MCU is complete
        mcx = (wid + 8 * hmax - 1) // (8 * hmax)
        mcy = (hgt + 8 * vmax - 1) // (8 * vmax)
        need_y, need_x = mcy * v, mcx * h
        nby, nbx = q.shape[:2]
        if nby < need_y or nbx < need_x:
            qq = np.zeros((need_y, need_x, 8, 8), np.int64)
            qq[:nby, :nbx] = q
            if nbx < need_x:
                qq[:nby, nbx:] = q[:, nbx - 1:nbx]
            if nby < need_y:
                qq[nby:, :] = qq[nby - 1:nby, :]
            q = qq
        comp_blocks.append(q)
    mcx = (wid + 8 * hmax - 1) // (8 * hmax)
    mcy = (hgt + 8 * vmax - 1) // (8 * vmax)

    bw = BitWriter()
    prev = [0, 0, 0]
    scan = bytearray()
    n_mcu = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart and n_mcu and n_mcu % restart == 0:
                bw.flush()
                scan += bytes(bw.buf)
                bw = BitWriter()
                scan += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                prev = [0, 0, 0]
            for i, (h, v) in enumerate(sampling):
                for by in range(v):
                    for bx in range(h):
                        prev[i] = encode_block(
                            bw, comp_blocks[i][my * v + by, mx * h + bx],
                            prev[i], dc_tabs[i], ac_tabs[i])
            n_mcu += 1
    bw.flush()
    scan += bytes(bw.buf)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(QT_LUMA.reshape(64)[ZIGZAG].tolist()))
    if ncomp == 3:
        out += seg(0xDB, bytes([1])
                   + bytes(QT_CHROMA.reshape(64)[ZIGZAG].tolist()))
    sof = bytearray([8]) + struct.pack(">HH", hgt, wid) + bytes([ncomp])
    for i, (h, v) in enumerate(sampling):
        sof += bytes([i + 1, (h << 4) | v, 0 if i == 0 else 1])
    out += seg(0xC0, bytes(sof))
    tabs = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if ncomp == 3:
        tabs += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc_th, (bits, vals) in tabs:
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytearray([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def ramp(w: int, h: int) -> np.ndarray:
    """Smooth wrap-free RGB ramps (tight decode tolerance)."""
    x = np.arange(w).reshape(1, w)
    y = np.arange(h).reshape(h, 1)
    r = (x * 255) // max(w - 1, 1)
    g = (y * 255) // max(h - 1, 1)
    b = ((x + y) * 255) // max(w + h - 2, 1)
    return np.stack(np.broadcast_arrays(r, g, b), axis=-1).astype(np.uint8)


def main() -> None:
    fixdir = os.path.join(os.path.dirname(__file__), "..", "tests",
                          "fixtures")
    img444 = ramp(32, 24)
    img420 = ramp(48, 40)
    jobs = (
        ("ramp444.jpg", img444, ((1, 1), (1, 1), (1, 1)), 0),
        ("ramp420.jpg", img420, ((2, 2), (1, 1), (1, 1)), 2),
    )
    for name, img, sampling, restart in jobs:
        data = encode_jpeg(img, sampling, restart=restart)
        path = os.path.join(fixdir, name)
        with open(path, "wb") as f:
            f.write(data)
        # no .npy sidecar: ramp() is deterministic — tests recompute it
        print(name, len(data), "bytes")


if __name__ == "__main__":
    main()
