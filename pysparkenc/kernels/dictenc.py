"""Dictionary encoding (Parquet ``RLE_DICTIONARY`` enum 8 / legacy
``PLAIN_DICTIONARY`` enum 2).

Re-expresses ``/root/reference/types/dict.go:14-117`` +
``datastore/dict.go:9-105``: the reference deduplicates value-at-a-time
through a Go hash map; here one ``pandas.factorize``/``np.unique`` call
yields the first-occurrence-ordered dictionary and the int32 code stream at
once.

Wire format (data page, ``types/dict.go:34-57``):
    <1 byte bit-width = bits.Len(len(dict))><hybrid-encoded codes>
Dictionary page: values PLAIN-encoded (``layout/page-dict.go:42-49`` accepts
only PLAIN), using the matching PLAIN codec from :mod:`.plain`.

Decode validates ``code < len(dict)`` exactly like ``types/dict.go:104-111``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .plain import (
    plain_decode_bytes,
    plain_decode_numeric,
    plain_encode_bytes,
    plain_encode_numeric,
)
from .rle import hybrid_decode, hybrid_encode, hybrid_encoded_size


def factorize_numeric(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codes int32, uniques) in first-occurrence order (DictStore order)."""
    codes, uniques = pd.factorize(values, use_na_sentinel=False)
    return codes.astype(np.int32), np.asarray(uniques)


def factorize_bytes(
    offsets: np.ndarray, data: bytes
) -> tuple[np.ndarray, np.ndarray, bytes]:
    """Factorize a binary column in offsets+data form.

    Returns (codes int32, dict_offsets int64, dict_data) with the
    dictionary in first-occurrence order (DictStore order). Runs through
    Arrow's hash kernel over a zero-copy LargeBinaryArray view — the
    previous np.split + per-value ``bytes`` path materialized n Python
    objects and dominated the string-encode profile.
    """
    n = offsets.size - 1
    if n == 0:
        return (np.empty(0, dtype=np.int32), np.zeros(1, dtype=np.int64), b"")
    import pyarrow as pa
    import pyarrow.compute as pc

    off = np.ascontiguousarray(offsets, dtype=np.int64)
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(off), pa.py_buffer(data)]
    )
    denc = pc.dictionary_encode(arr)  # dictionary = first-occurrence order
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int32)
    d = denc.dictionary
    dbufs = d.buffers()
    d_off = np.frombuffer(
        dbufs[1], dtype=np.int64, count=len(d) + 1, offset=d.offset * 8
    )
    base = int(d_off[0])
    dict_data = (
        bytes(memoryview(dbufs[2])[base : int(d_off[-1])])
        if dbufs[2] is not None
        else b""
    )
    return codes, (d_off - base).astype(np.int64), dict_data


def dict_index_bit_width(n_unique: int) -> int:
    """Bits needed for the largest code, ``(n_unique - 1).bit_length()``.

    Deliberate divergence from the reference, which sizes the code stream
    by the dictionary *count* (``bits.Len(uint(len(values)))``,
    ``types/dict.go:41``) and so wastes one bit per value whenever the
    count is an exact power of two (e.g. 2 values -> 2 bits instead of 1;
    parquet-mr uses max-code semantics). Our chunks are strictly <= the
    reference's, and decode always reads the width from the chunk header
    byte, so both conventions decode correctly.
    """
    return max(0, int(n_unique) - 1).bit_length()


def dict_encode_codes(codes: np.ndarray, n_unique: int) -> bytes:
    if n_unique == 0:
        raise ValueError("empty dictionary nothing to write")
    w = dict_index_bit_width(n_unique)
    # codes are in [0, n_unique) by construction (factorize) and w is
    # sized from n_unique -> skip the range scan and the int64 copy
    return bytes([w]) + hybrid_encode(codes, w, assume_fits=True)


def dict_decode_codes(buf: bytes | memoryview, n: int, n_unique: int) -> np.ndarray:
    buf = bytes(buf)
    if len(buf) < 1:
        raise EOFError("missing dictionary bit-width byte")
    w = buf[0]
    if w > 32:
        raise ValueError(f"invalid bit-width {w}")
    codes = hybrid_decode(buf[1:], w, n).astype(np.int64)
    if codes.size and codes.max() >= n_unique:
        raise ValueError(
            f"invalid index {int(codes.max())} for dictionary of {n_unique}"
        )
    return codes


def dict_codes_encoded_size(codes: np.ndarray, n_unique: int) -> int:
    w = dict_index_bit_width(n_unique)
    return 1 + hybrid_encoded_size(codes.astype(np.int64), w)


# -- dictionary page (PLAIN values) -----------------------------------------

def dict_page_encode_numeric(uniques: np.ndarray, dtype: str) -> bytes:
    return plain_encode_numeric(uniques, dtype)


def dict_page_decode_numeric(
    buf: bytes | memoryview, dtype: str, n_unique: int
) -> np.ndarray:
    return plain_decode_numeric(buf, dtype, n_unique)


def dict_page_encode_bytes(dict_offsets: np.ndarray, dict_data: bytes) -> bytes:
    return plain_encode_bytes(dict_offsets, dict_data)


def dict_page_decode_bytes(
    buf: bytes | memoryview, n_unique: int
) -> tuple[np.ndarray, bytes]:
    return plain_decode_bytes(buf, n_unique)
