"""ALP-style decimal-float codec (Adaptive Lossless floating-Point).

Real-world double columns are overwhelmingly decimals — prices, rates,
quantities — i.e. `round(v * 10^e)` is a small integer that reconstructs
`v` EXACTLY in IEEE754. This codec (after the ALP idea from the
DuckDB/CWI lightweight-compression line of work, same family as FSST)
finds the best exponent on a sample, stores the scaled integers
frame-of-reference bit-packed, and keeps the values that don't survive
the round-trip (true reals, NaN/Inf, -0.0) verbatim as positioned
exceptions — so decode is bit-identical for EVERY input, and the codec
simply loses the size race when data isn't decimal (random embeddings →
~100% exceptions → selector keeps PLAIN).

The reference library has no float compression beyond PLAIN
(``datastore/float.go:24``, ``double.go:24``); this is a north-star
addition like FSST/BSS. No Spark imports; pure numpy.

Wire format (little-endian):
  [e:u8][bit_width:u8][min:zigzag-varint][n_exc:uvarint]
  [packed ints: n values at bit_width bits, FOR-shifted by min]
  [exc positions: n_exc u32][exc payload: n_exc raw 4/8-byte values]

Exactness is judged on BITS (``view(uint64)``), not ==, so -0.0 and NaN
are exceptions rather than silent corruption.
"""

from __future__ import annotations

import numpy as np

from ._bits import (
    pack_const_width,
    read_uvarint,
    read_varint,
    unpack_const_width,
    write_uvarint,
    write_varint,
)

_MAX_E = 14          # 10^14: decimals with more digits don't fit cleanly
_MAX_BITS = 48       # wider scaled ints can't beat PLAIN anyway
_F = {"float64": ("<f8", "<u8", 8), "float32": ("<f4", "<u4", 4)}


def _bits_of(arr: np.ndarray, dtype: str) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=_F[dtype][0]).view(_F[dtype][1])


def alp_analyze(values: np.ndarray, dtype: str) -> tuple[int, np.ndarray] | None:
    """Pick the exponent maximizing exactly-representable values.

    Returns ``(e, exact_mask)`` or None when even the best exponent
    leaves more than 30% exceptions (the codec cannot win there).
    Exact means: ``i = rint(v * 10^e)`` is finite, |i| < 2^53, and
    ``(i / 10^e)`` (cast back for float32) reproduces v's BITS.
    """
    if values.size == 0:
        return 0, np.zeros(0, dtype=bool)
    v64 = values.astype(np.float64)
    vbits = _bits_of(values, dtype)
    best: tuple[int, int, np.ndarray] | None = None
    with np.errstate(invalid="ignore", over="ignore"):
        for e in range(_MAX_E + 1):
            scale = np.float64(10.0**e)
            scaled = v64 * scale
            i = np.rint(scaled)
            ok = np.isfinite(scaled) & (np.abs(i) < np.float64(2**53))
            # reconstruct through the INT64 domain exactly as decode does
            # (float -0.0 would survive a float-domain check but becomes
            # integer 0 on the wire — it must land in the exceptions)
            recon = np.where(ok, i, 0.0).astype(np.int64).astype(np.float64) / scale
            if dtype == "float32":
                recon = recon.astype(np.float32)
            exact = ok & (_bits_of(recon, dtype) == vbits)
            n_exact = int(exact.sum())
            if best is None or n_exact > best[1]:
                best = (e, n_exact, exact)
            if n_exact == values.size:
                break
    e, n_exact, exact = best
    if n_exact < 0.7 * values.size:
        return None
    # the packed-int span must stay narrow enough to be worth it
    if n_exact:
        ints = np.rint(v64[exact] * np.float64(10.0**e))
        span = int(ints.max() - ints.min()) if ints.size else 0
        if span and span.bit_length() > _MAX_BITS:
            return None
    return e, exact


def alp_encoded_size(values: np.ndarray, dtype: str) -> int | None:
    """Exact-framing size prediction for the selector (None = not viable)."""
    res = alp_analyze(values, dtype)
    if res is None:
        return None
    e, exact = res
    n = values.size
    n_exc = n - int(exact.sum())
    w = _F[dtype][2]
    if n_exc:
        ints = np.rint(values[exact].astype(np.float64) * np.float64(10.0**e))
    else:
        ints = np.rint(values.astype(np.float64) * np.float64(10.0**e))
    span = int(ints.max() - ints.min()) if ints.size else 0
    bw = span.bit_length()
    n8 = (n + 7) // 8 * 8
    return 2 + 10 + 5 + (n8 * bw + 7) // 8 + n_exc * (4 + w)


def alp_encode(values: np.ndarray, dtype: str) -> bytes:
    res = alp_analyze(values, dtype)
    if res is None:
        # caller (selector) should not have picked alp; honor the contract
        # anyway by encoding everything as exceptions
        e, exact = 0, np.zeros(values.size, dtype=bool)
    else:
        e, exact = res
    n = values.size
    v64 = values.astype(np.float64)
    scale = np.float64(10.0**e)
    with np.errstate(invalid="ignore", over="ignore"):
        i_all = np.rint(v64 * scale)
    exc_pos = np.flatnonzero(~exact).astype(np.uint32)
    ints = np.where(exact, i_all, 0.0)
    if exact.any():
        vmin = int(np.rint(v64[exact] * scale).min())
    else:
        vmin = 0
    ii = ints.astype(np.int64)
    ii[~exact] = vmin  # placeholder inside the frame
    shifted = (ii - vmin).astype(np.uint64)
    bw = int(shifted.max()).bit_length() if n else 0
    if n % 8:  # pack_const_width works in whole 8-value groups
        shifted = np.concatenate(
            [shifted, np.zeros(8 - n % 8, dtype=np.uint64)]
        )
    out = bytearray()
    out.append(e)
    out.append(bw)
    write_varint(out, vmin)
    write_uvarint(out, int(exc_pos.size))
    out += pack_const_width(shifted.astype(np.int64), bw)
    out += exc_pos.astype("<u4").tobytes()
    out += np.ascontiguousarray(values[~exact], dtype=_F[dtype][0]).tobytes()
    return bytes(out)


def alp_decode(buf: bytes | memoryview, dtype: str, n: int) -> np.ndarray:
    mv = memoryview(buf)
    e = mv[0]
    bw = mv[1]
    pos = 2
    vmin, pos = read_varint(mv, pos)
    n_exc, pos = read_uvarint(mv, pos)
    n8 = (n + 7) // 8 * 8  # encode pads to whole 8-value groups
    packed_len = (n8 * bw + 7) // 8
    ints = unpack_const_width(mv[pos : pos + packed_len], bw, n).astype(np.int64)
    pos += packed_len
    exc_pos = np.frombuffer(mv[pos : pos + 4 * n_exc], dtype="<u4")
    pos += 4 * n_exc
    w = _F[dtype][2]
    exc_vals = np.frombuffer(mv[pos : pos + w * n_exc], dtype=_F[dtype][0])
    out = (ints + vmin).astype(np.float64) / np.float64(10.0**e)
    if dtype == "float32":
        out = out.astype(np.float32)
    else:
        out = out.copy()
    if n_exc:
        out[exc_pos] = exc_vals
    return out
