"""BYTE_STREAM_SPLIT for FLOAT/DOUBLE (and fixed-width ints).

The reference declares the encoding enum (``/root/reference/parquet/
parquet.go:355``) but never implements it; this is the standard Parquet
BYTE_STREAM_SPLIT layout: the i-th byte of every value is grouped into
stream i, so sign/exponent bytes (nearly constant across a chunk) become
long runs that block compression collapses. By itself the output is
exactly plain-size — it only ever wins *under* a block compressor, which
is how the codec selector treats it.

Vectorized: one reshape + transpose, no per-value work.
"""

from __future__ import annotations

import numpy as np

_DTYPE = {
    "int32": np.dtype("<i4"),
    "int64": np.dtype("<i8"),
    "float32": np.dtype("<f4"),
    "float64": np.dtype("<f8"),
}


def bss_encode(values: np.ndarray, dtype: str) -> bytes:
    dt = _DTYPE[dtype]
    arr = np.ascontiguousarray(values, dtype=dt)
    if arr.size == 0:
        return b""
    return arr.view(np.uint8).reshape(-1, dt.itemsize).T.tobytes()


def bss_decode(data: bytes, dtype: str, n: int) -> np.ndarray:
    dt = _DTYPE[dtype]
    if n == 0:
        return np.zeros(0, dtype=dt)
    if len(data) != n * dt.itemsize:
        raise ValueError(
            f"BYTE_STREAM_SPLIT payload is {len(data)} bytes, "
            f"expected {n * dt.itemsize}"
        )
    streams = np.frombuffer(data, dtype=np.uint8).reshape(dt.itemsize, n)
    return np.ascontiguousarray(streams.T).view(dt).reshape(n)
