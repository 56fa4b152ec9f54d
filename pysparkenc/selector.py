"""Per-chunk codec auto-selector (SURVEY.md §7.3).

The reference *promises* encoder auto-selection ("the column store ... will
choose an optimal way according to heuristics",
``/root/reference/datastore/column.go:38-41``) and tracks its inputs
(``datastore/dict.go:61-62,76``), but the decision point lives in the
never-written file writer — so this module implements the rule from first
principles: sample the chunk, predict each candidate codec's encoded size
*exactly* (every kernel ships an ``*_encoded_size`` that replays its own
framing arithmetic), and pick the argmin.

Candidate sets mirror the reference's per-type encoding whitelists:
- INT32/INT64: PLAIN, DELTA_BINARY_PACKED (``datastore/int32.go:25``,
  ``int64.go:24``) + dictionary (``allowDict``, ``datastore/column.go:55``)
  + FOR/RLE-hybrid (the hybrid is how the reference stores any bounded-range
  int stream, e.g. dict indices and levels);
- FLOAT/DOUBLE: PLAIN (``float.go:24``, ``double.go:24``) + dictionary
  + ALP (decimal scaled-int, kernels/alp.py) + BYTE_STREAM_SPLIT under
  block compression (both north-star additions — the reference never
  compresses floats);
- BOOLEAN: PLAIN, RLE (``datastore/boolean.go:15``; dict disallowed ``:24``);
- BYTE_ARRAY: PLAIN, DELTA_LENGTH, DELTA (``byte-array.go:19,36``)
  + dictionary + FSST (north-star addition).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .kernels.bytearray import (
    delta_ba_encoded_size,
    delta_length_encoded_size,
)
from .kernels.delta import delta_bp_encoded_size
from .kernels.dictenc import (
    dict_codes_encoded_size,
    dict_index_bit_width,
    dict_page_encode_bytes,
    dict_page_encode_numeric,
    factorize_bytes,
    factorize_numeric,
    sort_dict_bytes,
)
from .kernels.fsst import fsst_encoded_size_estimate
from .kernels.plain import _ramp
from .kernels.rle import hybrid_encoded_size

SAMPLE_VALUES = 1 << 16  # selector decisions made on at most 64Ki values

INT_CANDIDATES = ("plain", "delta_bp", "dict_rle", "for_rle")
FLOAT_CANDIDATES = ("plain", "dict_rle", "alp")
BOOL_CANDIDATES = ("bool_plain", "bool_rle")
BYTES_CANDIDATES = (
    "ba_plain", "ba_fixed", "ba_delta_len", "ba_delta", "dict_rle", "fsst"
)

_ITEM = {"int32": 4, "int64": 8, "float32": 4, "float64": 8}


@dataclass
class Choice:
    codec: str
    predicted: int
    sizes: dict[str, int] = field(default_factory=dict)
    for_offset: int = 0  # frame-of-reference shift for "for_rle"
    fsst_symbols: list[bytes] | None = None


def _sample(values: np.ndarray) -> tuple[np.ndarray, float]:
    n = values.shape[0]
    if n <= SAMPLE_VALUES:
        return values, 1.0
    step = n // SAMPLE_VALUES
    s = values[::step][:SAMPLE_VALUES]
    return s, n / s.shape[0]


def select_numeric(
    values: np.ndarray, dtype: str, compression: str | None = None
) -> Choice:
    w = _ITEM[dtype]
    n = values.size
    plain = n * w
    sizes: dict[str, int] = {"plain": plain}
    s, scale = _sample(values)
    is_int = dtype.startswith("int")

    if compression and dtype.startswith("float"):
        # BYTE_STREAM_SPLIT is plain-sized raw and only wins under block
        # compression. The zlib level-1 probe is used ONLY to break the
        # plain-vs-bss tie; every entry in `sizes` stays an *uncompressed*
        # size so the min() below compares commensurable numbers (a raw
        # dict_rle estimate vs a compressed plain estimate would misselect).
        import zlib

        from .kernels.bss import bss_encode

        raw = np.ascontiguousarray(s, dtype=f"<{'f4' if w == 4 else 'f8'}")
        plain_probe = len(zlib.compress(raw.tobytes(), 1))
        bss_probe = len(zlib.compress(bss_encode(s, dtype), 1))
        if bss_probe < plain_probe:
            sizes["bss"] = plain - 1  # same raw size; wins the tie vs plain

    if is_int:
        width = 32 if dtype == "int32" else 64
        sizes["delta_bp"] = int(delta_bp_encoded_size(s, width=width) * scale)
    else:
        # ALP: decimal doubles/floats as FOR-bitpacked scaled ints with
        # bit-exact exceptions — viable only when the sample is mostly
        # decimal (None otherwise, e.g. random embeddings)
        from .kernels.alp import alp_encoded_size

        asz = alp_encoded_size(s, dtype)
        if asz is not None:
            sizes["alp"] = int(asz * scale)

    # dictionary: only pursue when the sample looks low-cardinality
    uniq = np.unique(s)
    nu = uniq.size
    for_offset = 0
    if nu <= max(1, s.size // 4) and nu < (1 << 20):
        codes, uniques = factorize_numeric(s)
        # price the DELTA-dict page exactly (uniq is already sorted; the
        # encoder sorts the real dictionary the same way before packing)
        dict_page = len(dict_page_encode_numeric(uniq, dtype))
        sizes["dict_rle"] = int(
            dict_page + dict_codes_encoded_size(codes, uniques.size) * scale
        )

    if is_int and n:
        vmin = int(s.min())
        vmax = int(s.max())
        span = vmax - vmin
        if 0 <= span < (1 << 32):
            bw = int(span).bit_length()
            if bw <= 32:
                sizes["for_rle"] = int(
                    hybrid_encoded_size(s.astype(np.int64) - vmin, bw) * scale
                ) + 9  # offset stored in metadata
                for_offset = vmin

    codec = min(sizes, key=sizes.get)  # type: ignore[arg-type]
    return Choice(codec, sizes[codec], sizes, for_offset=for_offset)


def select_bool(values: np.ndarray) -> Choice:
    n = values.size
    sizes = {"bool_plain": (n + 7) // 8}
    s, scale = _sample(values.astype(np.int64))
    sizes["bool_rle"] = int((hybrid_encoded_size(s, 1) + 4) * scale)
    codec = min(sizes, key=sizes.get)  # type: ignore[arg-type]
    return Choice(codec, sizes[codec], sizes)


def select_bytes(
    offsets: np.ndarray, data: bytes,
    fsst_symbols: list[bytes] | None = None,
) -> Choice:
    n = offsets.size - 1
    total = len(data)
    sizes: dict[str, int] = {"ba_plain": total + 4 * n}
    lens_all = np.diff(offsets)
    if n and (lens_all == lens_all[0]).all():
        # FIXED_LEN_BYTE_ARRAY: equal widths need no offsets at all —
        # always beats ba_plain/delta_len on this shape; dictionary can
        # still win on heavy duplication
        sizes["ba_fixed"] = total
    # sample rows (not values) for the string codecs
    if n > 4096:
        step = n // 4096
        sel = np.arange(0, n, step)[:4096]
        lens = np.diff(offsets)
        sel_lens = lens[sel].astype(np.int64)
        s_off = np.zeros(sel.size + 1, dtype=np.int64)
        np.cumsum(sel_lens, out=s_off[1:])
        # vectorized gather of the sampled rows' bytes (the per-row
        # bytes() join was a Python loop over 4096 slices)
        raw = np.frombuffer(data, dtype=np.uint8)
        starts = np.asarray(offsets, dtype=np.int64)[sel]
        idx = np.repeat(starts, sel_lens) + _ramp(sel_lens)
        s_data = raw[idx].tobytes()
        scale = total / max(1, len(s_data))
        row_scale = n / sel.size
    else:
        sel = None
        s_off, s_data, scale, row_scale = offsets, data, 1.0, 1.0

    sizes["ba_delta_len"] = int(
        delta_length_encoded_size(s_off, len(s_data)) * scale
    )
    sizes["ba_delta"] = int(delta_ba_encoded_size(s_off, s_data) * scale)

    codes, d_off, d_data = factorize_bytes(s_off, s_data)
    nu = d_off.size - 1
    if nu <= max(1, (s_off.size - 1) // 2):
        # price the DELTA-dict page exactly on the sorted sample dict
        # (the encoder sorts the real dictionary the same way)
        _, p_off, p_data = sort_dict_bytes(codes, d_off, d_data)
        dict_page = len(dict_page_encode_bytes(p_off, p_data))
        sizes["dict_rle"] = int(
            (dict_page * (1 if sel is None else 1.0))
            + dict_codes_encoded_size(codes, nu) * row_scale
        )

    avg_len = total / max(1, n)
    best_so_far = min(sizes.values())
    # FSST training is the selector's priciest probe (the estimate
    # itself trains on a 512-row internal sample); skip it when an
    # earlier candidate already beats FSST's practical floor (~35% of
    # plain — symbol codes are >=1 byte per ~2.9 input bytes on text).
    # The avg-length cap only bounds the lock-step encoder's Python-level
    # loop (one iteration per symbol of the LONGEST string in the page,
    # vectorized across all strings) — FSST's compression itself is
    # length-independent, so document-sized text must stay eligible.
    # Also skip non-text payloads: every byte >= 0x80 costs a 2-byte
    # escape, so dense high-bit data (random binary, decimal128/UUID
    # FLBA payloads) can only expand — a 64 KiB-sample high-bit ratio
    # over 25% rules FSST out in microseconds instead of training on it
    if len(s_data):
        probe = np.frombuffer(s_data[:65536], dtype=np.uint8)
        high_bit_frac = float((probe >= 128).mean())
    else:
        high_bit_frac = 0.0
    if (
        avg_len <= 4096
        and best_so_far > 0.35 * sizes["ba_plain"]
        and high_bit_frac <= 0.25
    ):
        est, fsst_symbols = fsst_encoded_size_estimate(
            offsets, data, symbols=fsst_symbols
        )
        sizes["fsst"] = est
    else:
        fsst_symbols = None

    codec = min(sizes, key=sizes.get)  # type: ignore[arg-type]
    return Choice(codec, sizes[codec], sizes, fsst_symbols=fsst_symbols)
