"""INT96 PLAIN — the legacy 12-byte parquet timestamp encoding.

The reference ships it as an opaque 12-byte PLAIN pass-through
(``types/int96.go:13-75``, ``sizeInt96 = 12`` at ``:9``); the byte
layout itself is the parquet-format convention older writers used for
timestamps: 8 bytes little-endian nanoseconds-of-day followed by 4 bytes
little-endian Julian day number. We encode Spark's native representation
(int64 epoch-microseconds) into that exact layout and back, so chunks
are wire-compatible with what an INT96-era reader expects while the
engine keeps a single int64 timestamp dtype.

Never auto-selected: 12 bytes/value always loses to the 8-byte int64
codecs (delta/dict/FOR), matching its interop-only role — the
reference's own whitelist allows INT96 PLAIN and nothing else
(``datastore/int96.go:21``).
"""

from __future__ import annotations

import numpy as np

_US_PER_DAY = np.int64(86_400_000_000)
# days from Julian day 0 to 1970-01-01 (parquet-format.md INT96 convention)
_JULIAN_EPOCH_DAY = np.int64(2_440_588)


def int96_encode(micros: np.ndarray) -> bytes:
    """int64 epoch-micros -> concatenated 12-byte INT96 values."""
    m = micros.astype(np.int64, copy=False)
    # floor division keeps pre-1970 instants on the previous Julian day
    # with a non-negative nanos-of-day, as the layout requires
    day = m // _US_PER_DAY
    nanos = (m - day * _US_PER_DAY) * np.int64(1000)
    julian = (day + _JULIAN_EPOCH_DAY).astype(np.int32)
    out = np.empty((m.size, 12), dtype=np.uint8)
    out[:, :8] = nanos.astype("<i8").view(np.uint8).reshape(-1, 8)
    out[:, 8:] = julian.astype("<i4").view(np.uint8).reshape(-1, 4)
    return out.tobytes()


def int96_decode(data: bytes, n: int) -> np.ndarray:
    """Concatenated 12-byte INT96 values -> int64 epoch-micros."""
    if len(data) != n * 12:
        raise ValueError(
            f"int96 payload is {len(data)} bytes, want {n * 12} (n={n})"
        )
    raw = np.frombuffer(data, dtype=np.uint8).reshape(n, 12)
    nanos = np.ascontiguousarray(raw[:, :8]).view("<i8").reshape(n)
    julian = np.ascontiguousarray(raw[:, 8:]).view("<i4").reshape(n)
    day = julian.astype(np.int64) - _JULIAN_EPOCH_DAY
    return day * _US_PER_DAY + nanos // np.int64(1000)
