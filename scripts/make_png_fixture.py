"""Generate tests/fixtures/gradient.png — a deterministic 8-bit RGB PNG
whose scanlines deliberately cycle through ALL FIVE filter types
(None/Sub/Up/Average/Paeth), so the decoder's un-filtering is exercised
on every path. Pixels: r = (x*11)%256, g = (y*23)%256, b = (x*5+y*7)%256
over a 24x17 image. Pure stdlib (zlib, struct) — rerunning reproduces
the committed file byte-for-byte (zlib level 9 is deterministic)."""

from __future__ import annotations

import os
import struct
import zlib

W, H = 24, 17
CH = 3


def pixels() -> list[list[int]]:
    rows = []
    for y in range(H):
        row = []
        for x in range(W):
            row += [(x * 11) % 256, (y * 23) % 256, (x * 5 + y * 7) % 256]
        rows.append(row)
    return rows


def paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def filter_row(ftype: int, row: list[int], prev: list[int]) -> bytes:
    out = bytearray([ftype])
    for x, v in enumerate(row):
        a = row[x - CH] if x >= CH else 0
        b = prev[x]
        c = prev[x - CH] if x >= CH else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = paeth(a, b, c)
        out.append((v - pred) & 0xFF)
    return bytes(out)


def chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def main() -> None:
    rows = pixels()
    raw = bytearray()
    prev = [0] * (W * CH)
    for y, row in enumerate(rows):
        raw += filter_row(y % 5, row, prev)
        prev = row
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)  # 8-bit RGB
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "gradient.png"
    )
    with open(out, "wb") as fh:
        fh.write(png)
    print(f"wrote {out} ({len(png)} bytes)")


if __name__ == "__main__":
    main()
