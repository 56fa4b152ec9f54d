"""PLAIN codecs (Parquet enum 0) for every physical type we support.

Re-expresses ``/root/reference/types/int32.go:14-72``, ``int64.go:14-72``,
``float.go:14-79``, ``double.go:14-80``, ``boolean.go:13-127`` and
``byte-array.go:21-114`` as numpy buffer casts — the reference decodes
value-at-a-time through ``[]interface{}``; here the byte buffer *is* the
array (little-endian fixed width), so encode/decode are O(1) views plus one
copy.

- int32/int64: ``<i4``/``<i8`` LE bytes.
- float/double: IEEE-754 LE bit patterns (``math.Float32bits`` equivalent).
- boolean PLAIN: 1 bit per value, LSB-first within each byte
  (``types/boolean.go:92-127``) == ``np.packbits(bitorder="little")``.
- BYTE_ARRAY PLAIN: per value ``<4-byte LE length><bytes>``
  (``types/byte-array.go:47-67``).
- FIXED_LEN_BYTE_ARRAY PLAIN: raw concatenation, length from metadata
  (``types/byte-array.go:94-114``).
"""

from __future__ import annotations

import numpy as np

_DTYPES = {
    "int32": np.dtype("<i4"),
    "int64": np.dtype("<i8"),
    "float32": np.dtype("<f4"),
    "float64": np.dtype("<f8"),
}


def plain_encode_numeric(values: np.ndarray, dtype: str) -> bytes:
    dt = _DTYPES[dtype]
    return np.ascontiguousarray(values).astype(dt, copy=False).tobytes()


def plain_decode_numeric(buf: bytes | memoryview, dtype: str, n: int) -> np.ndarray:
    dt = _DTYPES[dtype]
    need = n * dt.itemsize
    if len(buf) < need:
        raise EOFError("truncated PLAIN payload")
    return np.frombuffer(buf, dtype=dt, count=n).copy()


def plain_encode_bool(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values).astype(np.uint8, copy=False)
    return np.packbits(v, bitorder="little").tobytes()


def plain_decode_bool(buf: bytes | memoryview, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size * 8 < n:
        raise EOFError("truncated boolean PLAIN payload")
    return np.unpackbits(raw, bitorder="little", count=n).astype(bool)


def plain_encode_bytes(offsets: np.ndarray, data: bytes) -> bytes:
    """Encode a binary column given Arrow-style offsets (int64, len n+1)
    into ``<len><bytes>`` framing with one vectorized interleave."""
    n = offsets.size - 1
    lens = np.diff(offsets).astype(np.int64)
    out = np.empty(int(lens.sum()) + 4 * n, dtype=np.uint8)
    # target positions: each value i starts at offsets[i] + 4*i
    starts = (offsets[:-1] + 4 * np.arange(n, dtype=np.int64)).astype(np.int64)
    # write lengths
    len_le = lens.astype("<u4").view(np.uint8).reshape(n, 4)
    for k in range(4):
        out[starts + k] = len_le[:, k]
    # write payloads: build a gather index
    src = np.frombuffer(data, dtype=np.uint8)
    # destination index for every payload byte
    dst_start = starts + 4
    idx = np.repeat(dst_start, lens) + _ramp(lens)
    out[idx] = src[: int(lens.sum())]
    return out.tobytes()


def plain_decode_bytes(
    buf: bytes | memoryview, n: int
) -> tuple[np.ndarray, bytes]:
    """Decode ``n`` length-prefixed values; returns (offsets int64 n+1, data)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    lens = np.empty(n, dtype=np.int64)
    pos = 0
    total = raw.size
    # lengths are data-dependent: walk scalar over values (cheap relative to
    # payload) — only used when PLAIN is actually selected for strings.
    starts = np.empty(n, dtype=np.int64)
    b = bytes(buf)
    for i in range(n):
        if pos + 4 > total:
            raise EOFError("truncated BYTE_ARRAY length")
        ln = int.from_bytes(b[pos : pos + 4], "little")
        pos += 4
        if pos + ln > total:
            raise EOFError("truncated BYTE_ARRAY payload")
        starts[i] = pos
        lens[i] = ln
        pos += ln
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    idx = np.repeat(starts, lens) + _ramp(lens)
    data = raw[idx].tobytes()
    return offsets, data


def _ramp(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]-1, 0..lens[1]-1, ...] without a Python loop."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lens)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    nz = lens > 0
    starts_of_runs = np.concatenate(([0], ends[:-1]))[nz]
    run_lens = lens[nz]
    out[starts_of_runs[1:]] = 1 - run_lens[:-1]
    return np.cumsum(out)
