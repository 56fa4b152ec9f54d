"""Low-level bit/varint primitives shared by every codec kernel.

These replace the reference's ~4600 lines of generated straight-line Go
pack/unpack functions (``/root/reference/encoding/bitpacking32.go``,
``bitpacking64.go``, generator ``bitpack-gen.go:138-164``) with two fully
vectorized numpy expressions over the whole value stream at once: values are
expanded to (or gathered from) a little-endian bit matrix and moved through
``np.packbits``/``np.unpackbits`` with ``bitorder="little"``, which is exactly
the Parquet bit-packed layout (value 0's least-significant bit occupies the
lowest bit of the first byte — verified against the golden vector in
``/root/reference/encoding/hybrid-encoder_test.go:126``).

No Spark imports here: kernels are unit-testable in isolation.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# varint / zigzag (Go encoding/binary compatible:
# /root/reference/encoding/helpers.go:83-95)
# ---------------------------------------------------------------------------

def write_uvarint(out: bytearray, x: int) -> None:
    """Append the unsigned LEB128 varint of ``x`` (Go binary.PutUvarint)."""
    if x < 0:
        raise ValueError("uvarint of negative value")
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def write_varint(out: bytearray, x: int) -> None:
    """Append the zigzag varint of signed ``x`` (Go binary.PutVarint)."""
    ux = (x << 1) & _M64
    if x < 0:
        ux ^= _M64
    write_uvarint(out, ux)


def read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """Read an unsigned varint at ``pos``; returns (value, new_pos).

    Raises EOFError on truncation (mirrors the reference decoder returning
    EOF from ``binary.ReadUvarint``).
    """
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise EOFError("truncated uvarint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("uvarint overflows 64 bits")


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Read a zigzag varint; returns (signed value, new_pos)."""
    ux, pos = read_uvarint(buf, pos)
    v = ux >> 1
    if ux & 1:
        v = ~v
    return v, pos


def zigzag64(x: int) -> int:
    ux = (x << 1) & _M64
    if x < 0:
        ux ^= _M64
    return ux


# ---------------------------------------------------------------------------
# variable-width bit packing (the E5 kernel of SURVEY.md §2.1)
# ---------------------------------------------------------------------------

def pack_varwidth(values: np.ndarray, widths: np.ndarray) -> bytes:
    """Bit-pack ``values[i]`` into ``widths[i]`` little-endian bits each.

    ``values`` is interpreted unsigned (cast to uint64); callers are
    responsible for total bit count alignment (all codec layouts emit whole
    bytes by construction: 8-value groups at constant width).  Trailing
    partial bytes are zero-padded by ``np.packbits``.
    """
    values = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    widths = np.asarray(widths, dtype=np.int64)
    if values.size == 0:
        return b""
    maxw = int(widths.max())
    if maxw == 0:
        return b""
    if maxw > 64:
        raise ValueError(f"bit width {maxw} > 64")
    shifts = np.arange(maxw, dtype=np.uint64)
    bits = ((values[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    mask = shifts.astype(np.int64) < widths[:, None]
    stream = bits[mask]
    return np.packbits(stream, bitorder="little").tobytes()


def unpack_varwidth(buf: bytes | memoryview, widths: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_varwidth`; returns uint64 values.

    Raises EOFError if ``buf`` holds fewer than ``sum(widths)`` bits.
    """
    widths = np.asarray(widths, dtype=np.int64)
    n = widths.size
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    total_bits = int(widths.sum())
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size * 8 < total_bits:
        raise EOFError("truncated bit-packed payload")
    bits = np.unpackbits(raw, bitorder="little", count=total_bits)
    maxw = int(widths.max())
    if maxw == 0:
        return np.zeros(n, dtype=np.uint64)
    shifts = np.arange(maxw, dtype=np.uint64)
    mask = shifts.astype(np.int64) < widths[:, None]
    mat = np.zeros((n, maxw), dtype=np.uint8)
    mat[mask] = bits
    return (mat.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)


def pack_const_width(values: np.ndarray, bit_width: int) -> bytes:
    """Pack at one constant width; input length must be a multiple of 8
    (callers pad to whole 8-value groups, matching the reference's
    group-of-8 layout)."""
    if bit_width == 0 or values.size == 0:
        return b""
    if values.size % 8:
        raise ValueError("pack_const_width requires multiple-of-8 input")
    vals = np.ascontiguousarray(values).astype("<u8", copy=False)
    if bit_width % 8 == 0:
        # byte-aligned widths: the packed stream IS the low bytes of each
        # value back-to-back — no bit shuffling at all (the dropped high
        # bytes are provably zero for valid input)
        nb = bit_width // 8
        return np.ascontiguousarray(
            vals.view(np.uint8).reshape(-1, 8)[:, :nb]
        ).tobytes()
    if bit_width in (1, 2, 4):
        # sub-byte divisors: k values per output byte via k-1 shift-ORs
        k = 8 // bit_width
        grp = vals.reshape(-1, k)
        acc = grp[:, 0].copy()
        for j in range(1, k):
            acc |= grp[:, j] << np.uint64(j * bit_width)
        return acc.astype(np.uint8).tobytes()
    # general path, mirror of unpack_const_width: uint64 -> (n, 8) LE
    # bytes -> per-row unpackbits -> keep bit_width bits -> one packbits
    # pass. Only the ceil(bit_width/8) low bytes can carry set bits for
    # valid input, so the unpack touches those alone — at width <= 8 that
    # is 8x less bit-matrix traffic than unpacking the full 8-byte rows
    # (identical output bytes: the dropped bits are provably zero).
    nb = (bit_width + 7) // 8
    rows = vals.view(np.uint8).reshape(-1, 8)[:, :nb]
    bits = np.unpackbits(
        np.ascontiguousarray(rows), axis=1, bitorder="little"
    )[:, :bit_width]
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_const_width(buf: bytes | memoryview, bit_width: int, n: int) -> np.ndarray:
    """Constant-width unpack without the (n, maxw) uint64 matrix of
    unpack_varwidth: bit-transpose via unpackbits -> per-row packbits ->
    zero-extended little-endian uint64 view. Peak memory n*bit_width bytes
    instead of n*maxw*8 — the varwidth path goes memory-bound on large
    chunks (a 1.1M-value dict-code stream decoded 6x slower through it)."""
    if bit_width == 0:
        return np.zeros(n, dtype=np.uint64)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    total_bits = n * bit_width
    if raw.size * 8 < total_bits:
        raise EOFError("truncated bit-packed payload")
    if bit_width % 8 == 0:
        # byte-aligned: zero-extend the packed bytes straight into the
        # uint64 lanes — no bit shuffling (inverse of the pack fast path)
        nb = bit_width // 8
        full = np.zeros((n, 8), dtype=np.uint8)
        full[:, :nb] = raw[: n * nb].reshape(n, nb)
        return full.view("<u8").ravel()
    if bit_width in (1, 2, 4):
        # sub-byte divisors: k values per byte via shift-and-mask
        k = 8 // bit_width
        nbytes = (n + k - 1) // k
        b = raw[:nbytes].astype(np.uint64)
        mask = np.uint64((1 << bit_width) - 1)
        out = np.empty((nbytes, k), dtype=np.uint64)
        for j in range(k):
            out[:, j] = (b >> np.uint64(j * bit_width)) & mask
        return out.ravel()[:n]
    bits = np.unpackbits(raw, bitorder="little", count=total_bits).reshape(
        n, bit_width
    )
    packed = np.packbits(bits, axis=1, bitorder="little")
    nb = packed.shape[1]
    full = np.zeros((n, 8), dtype=np.uint8)
    full[:, :nb] = packed
    return full.view("<u8").ravel()


def bit_length_u32(arr: np.ndarray) -> np.ndarray:
    """Vectorized bits.Len32 over a uint32 array."""
    arr = arr.astype(np.uint32, copy=False)
    out = np.zeros(arr.shape, dtype=np.int64)
    nz = arr > 0
    # log2 on float64 is exact for 32-bit ints
    out[nz] = np.floor(np.log2(arr[nz].astype(np.float64))).astype(np.int64) + 1
    return out


def bit_length_u64(arr: np.ndarray) -> np.ndarray:
    """Vectorized bits.Len64 over a uint64 array (exact, avoids float
    rounding by checking the neighborhood)."""
    arr = arr.astype(np.uint64, copy=False)
    out = np.zeros(arr.shape, dtype=np.int64)
    nz = arr > 0
    if nz.any():
        v = arr[nz]
        # float64 log2 can be off by one for values near 2^k with k>52;
        # compute candidate then correct.
        cand = np.floor(np.log2(v.astype(np.float64))).astype(np.int64) + 1
        cand = np.clip(cand, 1, 64)
        # correct down: value < 2^(cand-1) means cand too big
        too_big = v < (np.uint64(1) << np.minimum(cand - 1, 63).astype(np.uint64))
        cand[too_big] -= 1
        # correct up: value >= 2^cand means cand too small (cand<64)
        lt64 = cand < 64
        up = np.zeros_like(too_big)
        up[lt64] = v[lt64] >= (np.uint64(1) << cand[lt64].astype(np.uint64))
        cand[up] += 1
        out[nz] = cand
    return out
