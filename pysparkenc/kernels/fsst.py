"""FSST: Fast Static Symbol Table string compression.

Implemented from the published paper (Boncz, Neumann, Leis — "FSST: Fast
Random Access String Compression", VLDB 2020); the reference repo has **no**
FSST — BASELINE.json's north star adds it as a sibling string codec next to
DELTA_BYTE_ARRAY (see SURVEY.md §2.1 E15).

Design (paper-faithful, simplified):
- a static table of at most 254 symbols, each 1..8 bytes;
- code 255 is the escape marker: ``255, b`` emits literal byte ``b``;
- greedy longest-match encoding;
- table trained by a few generations of "encode the sample, count adjacent
  symbol concatenations, keep the highest apparent-gain symbols".

The encoder processes a whole string *column* in lock-step: every vector
step advances one symbol in **all** strings simultaneously (window gather
-> per-length uint64 key -> ``np.searchsorted`` against the sorted symbol
keys), so the Python-level loop runs ``O(max_symbols_per_string)`` times,
not ``O(total_bytes)`` — with rows longer than ``_PIECE_LEN`` split into
independently-encoded pieces so one huge row can't degrade the loop to
scalar speed or blow up the padding matrix. The decoder is a single flat
vectorized pass over the concatenated payload (escape/literal/code
classification by position parity inside maximal 0xFF runs), with no
Python-level loop at all.

Wire format:
    <uvarint n_symbols>
    n_symbols × (<1 byte len><symbol bytes>)
    <DELTA_BINARY_PACKED int32 stream of encoded lengths>
    <concatenated encoded strings>
"""

from __future__ import annotations

import numpy as np

from ._bits import read_uvarint, write_uvarint
from .delta import delta_bp_decode, delta_bp_encode
from .plain import _ramp

ESCAPE = 255
MAX_SYMBOLS = 254
MAX_SYMBOL_LEN = 8
_GENERATIONS = 3
_SAMPLE_BYTES = 1 << 13  # measured: 3 gens / 8K trains 40% faster than
# 5/16K with equal-or-better ratio on the documents corpus (more
# generations overfit the sample's rarer concatenations)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def train_symbols(sample: bytes) -> list[bytes]:
    """Train a symbol table on ``sample`` (a concatenation of sample
    strings is fine; symbols crossing string boundaries only cost a little
    compression, never correctness).

    Every distinct byte value seen in the sample is always kept as a
    single-byte symbol: an escaped literal costs 2 bytes, so dropping a
    live byte in favour of one more multi-byte symbol loses whenever that
    byte appears outside the sampled region (the paper's table keeps
    singles for the same reason).
    """
    if len(sample) > _SAMPLE_BYTES:
        # spread slices across the input instead of taking its head — a
        # sorted column's head is wildly unrepresentative of its tail
        n_slices = 64
        slice_len = _SAMPLE_BYTES // n_slices
        step = len(sample) // n_slices
        sample = b"".join(
            sample[i * step : i * step + slice_len] for i in range(n_slices)
        )
    if not sample:
        return []
    singles = [bytes([b]) for b in sorted(set(sample))]
    symbols: list[bytes] = list(singles)
    for _ in range(_GENERATIONS):
        counts: dict[bytes, int] = {}
        # greedy-encode the sample with the current table, counting emitted
        # symbols and adjacent concatenations
        table = {s: True for s in symbols}
        pos = 0
        prev: bytes | None = None
        n = len(sample)
        while pos < n:
            match = None
            for ln in range(min(MAX_SYMBOL_LEN, n - pos), 0, -1):
                cand = sample[pos : pos + ln]
                if cand in table:
                    match = cand
                    break
            if match is None:
                match = sample[pos : pos + 1]
            counts[match] = counts.get(match, 0) + 1
            if prev is not None:
                merged = (prev + match)[:MAX_SYMBOL_LEN]
                if len(merged) > len(prev):
                    counts[merged] = counts.get(merged, 0) + 1
            prev = match
            pos += len(match)
        # apparent gain: frequency × (length - 1 code byte); singles are
        # kept unconditionally below
        def gain(item: tuple[bytes, int]) -> int:
            s, c = item
            return c * (len(s) - 1)

        multi = [(s, c) for s, c in counts.items() if len(s) > 1]
        multi.sort(key=gain, reverse=True)
        slots = MAX_SYMBOLS - len(singles)
        symbols = singles + [s for s, _ in multi[:slots]]
    # deterministic order for the table (stable across runs)
    symbols.sort()
    return symbols[:MAX_SYMBOLS]


# ---------------------------------------------------------------------------
# vectorized column encode/decode
# ---------------------------------------------------------------------------

def _byte_matrix(offsets: np.ndarray, data: bytes, extra: int) -> tuple[np.ndarray, np.ndarray]:
    n = offsets.size - 1
    lens = np.diff(offsets).astype(np.int64)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, maxlen + extra), dtype=np.uint8)
    if maxlen:
        raw = np.frombuffer(data, dtype=np.uint8)
        col = np.arange(maxlen)
        valid = col < lens[:, None]
        mat[:, :maxlen][valid] = raw[(offsets[:-1, None] + col)[valid]]
    return mat, lens


def _symbol_keys(symbols: list[bytes]) -> tuple[dict[int, tuple[np.ndarray, np.ndarray]], np.ndarray, np.ndarray, bytes]:
    """Group symbols by length into (sorted big-endian uint64 keys, codes)."""
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    sym_lens = np.zeros(len(symbols), dtype=np.int64)
    tmp: dict[int, list[tuple[int, int]]] = {}
    for code, s in enumerate(symbols):
        sym_lens[code] = len(s)
        key = int.from_bytes(s.ljust(8, b"\0"), "big")
        tmp.setdefault(len(s), []).append((key, code))
    for ln, pairs in tmp.items():
        pairs.sort()
        keys = np.array([k for k, _ in pairs], dtype=np.uint64)
        codes = np.array([c for _, c in pairs], dtype=np.int64)
        by_len[ln] = (keys, codes)
    sym_offsets = np.zeros(len(symbols) + 1, dtype=np.int64)
    np.cumsum(sym_lens, out=sym_offsets[1:])
    sym_data = b"".join(symbols)
    return by_len, sym_lens, sym_offsets, sym_data


# rows longer than this are encoded as independent pieces: greedy
# longest-match is local, and codes are self-delimiting, so the
# concatenated piece encodings decode back to the row byte-identically
# (the only cost is the <=7-byte match a piece boundary might break).
# This bounds the lock-step matrix at O(total_bytes) and the Python-level
# loop at O(_PIECE_LEN) iterations no matter how long the longest row is.
_PIECE_LEN = 2048


def _split_long_rows(offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(piece_offsets, pieces_per_row): extra cut points every _PIECE_LEN
    bytes inside oversized rows. Pieces tile the data buffer exactly, so
    the lock-step encoder runs on the same buffer unchanged."""
    lens = np.diff(offsets)
    n_pieces = np.maximum(1, -(-lens // _PIECE_LEN))
    starts = np.repeat(offsets[:-1], n_pieces)
    within = _ramp(n_pieces) * _PIECE_LEN
    piece_offsets = np.concatenate(
        [starts + within, offsets[-1:]]
    ).astype(np.int64)
    return piece_offsets, n_pieces


def fsst_encode(offsets: np.ndarray, data: bytes, symbols: list[bytes] | None = None) -> bytes:
    n = offsets.size - 1
    if symbols is None:
        symbols = train_symbols(bytes(data))
    if n == 0:
        head0 = bytearray()
        write_uvarint(head0, len(symbols))
        for s in symbols:
            head0.append(len(s))
            head0 += s
        head0 += delta_bp_encode(np.zeros(0, dtype=np.int32), width=32)
        return bytes(head0)
    by_len, _, _, _ = _symbol_keys(symbols)

    row_offsets = np.asarray(offsets, dtype=np.int64)
    offsets, pieces_per_row = _split_long_rows(row_offsets)

    mat, lens = _byte_matrix(offsets, data, MAX_SYMBOL_LEN)
    n = offsets.size - 1
    # worst case every byte escapes -> 2 bytes out per byte in
    maxout = 2 * (int(lens.max()) if n else 0)
    out = np.zeros((n, max(maxout, 1)), dtype=np.uint8)
    pos = np.zeros(n, dtype=np.int64)
    opos = np.zeros(n, dtype=np.int64)
    rows = np.arange(n, dtype=np.int64)
    win_shift = (np.arange(8, dtype=np.uint64))[::-1] * np.uint64(8)

    active = pos < lens
    while active.any():
        idx = rows[active]
        p = pos[idx]
        # big-endian uint64 of the next 8 bytes
        win = mat[idx[:, None], p[:, None] + np.arange(8)]
        keys = (win.astype(np.uint64) << win_shift).sum(axis=1, dtype=np.uint64)
        remaining = lens[idx] - p
        best_len = np.zeros(idx.size, dtype=np.int64)
        best_code = np.zeros(idx.size, dtype=np.int64)
        for ln in sorted(by_len.keys(), reverse=True):
            skeys, scodes = by_len[ln]
            if ln < 8:
                mask_np = np.uint64(~((1 << (8 * (8 - ln))) - 1) & ((1 << 64) - 1))
                k = keys & mask_np
            else:
                k = keys
            j = np.searchsorted(skeys, k)
            found = (j < skeys.size) & (remaining >= ln) & (best_len == 0)
            jj = np.minimum(j, skeys.size - 1)
            found &= skeys[jj] == k
            best_len[found] = ln
            best_code[found] = scodes[jj[found]]
        matched = best_len > 0
        # matched: one code byte
        mi = idx[matched]
        out[mi, opos[mi]] = best_code[matched]
        opos[mi] += 1
        pos[mi] += best_len[matched]
        # unmatched: escape + literal
        ui = idx[~matched]
        out[ui, opos[ui]] = ESCAPE
        out[ui, opos[ui] + 1] = mat[ui, pos[ui]]
        opos[ui] += 2
        pos[ui] += 1
        active = pos < lens

    total = int(opos.sum())
    if total:
        gather = np.repeat(rows * out.shape[1], opos) + _ramp(opos)
        enc_data = out.reshape(-1)[gather].tobytes()
    else:
        enc_data = b""
    # piece encodings concatenate in row order; the wire length stream is
    # per ROW, so sum each row's pieces back together
    piece_ends = np.cumsum(pieces_per_row)
    c = np.zeros(opos.size + 1, dtype=np.int64)
    np.cumsum(opos, out=c[1:])
    enc_lens = np.diff(np.concatenate([[0], c[piece_ends]]))

    head = bytearray()
    write_uvarint(head, len(symbols))
    for s in symbols:
        head.append(len(s))
        head += s
    head += delta_bp_encode(enc_lens.astype(np.int32), width=32)
    return bytes(head) + enc_data


def fsst_decode(buf: bytes | memoryview, n: int) -> tuple[np.ndarray, bytes]:
    buf = bytes(buf)
    n_sym, pos = read_uvarint(buf, 0)
    if n_sym > MAX_SYMBOLS:
        raise ValueError(f"too many FSST symbols: {n_sym}")
    symbols: list[bytes] = []
    for _ in range(n_sym):
        if pos >= len(buf):
            raise EOFError("truncated FSST symbol table")
        ln = buf[pos]
        pos += 1
        if ln == 0 or ln > MAX_SYMBOL_LEN:
            raise ValueError(f"invalid FSST symbol length {ln}")
        if pos + ln > len(buf):
            raise EOFError("truncated FSST symbol")
        symbols.append(buf[pos : pos + ln])
        pos += ln
    enc_lens, consumed = delta_bp_decode(buf[pos:], width=32)
    pos += consumed
    if enc_lens.size != n:
        raise ValueError("FSST length stream mismatch")
    enc_lens = enc_lens.astype(np.int64)
    total = int(enc_lens.sum())
    if pos + total > len(buf):
        raise EOFError("truncated FSST payload")

    enc_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=enc_offsets[1:])
    if total == 0:
        return np.zeros(n + 1, dtype=np.int64), b""

    _, sym_lens, sym_offsets, sym_data = _symbol_keys(symbols)
    sym_raw = np.frombuffer(sym_data, dtype=np.uint8)

    # Single flat pass over the concatenated payload — no per-string
    # lock-step loop and no n × maxlen byte matrix, so cost is
    # O(total_bytes) regardless of how long the longest string is.
    # Escape/literal/code classification is position-parity inside
    # maximal 0xFF runs: every encoded segment starts at a code
    # position, and a run of k consecutive ESCAPE bytes (split at
    # string boundaries) alternates marker, literal, marker, … — so
    # even offsets within the run are escape markers, odd are escaped
    # literal 0xFF bytes, and every non-0xFF byte is a code unless it
    # immediately follows a marker.
    arr = np.frombuffer(buf, dtype=np.uint8, count=total, offset=pos)
    is_ff = arr == ESCAPE
    string_start = np.zeros(total, dtype=bool)
    seg_starts = enc_offsets[:-1][enc_lens > 0]
    string_start[seg_starts] = True
    prev_ff = np.empty(total, dtype=bool)
    prev_ff[0] = False
    prev_ff[1:] = is_ff[:-1]
    run_start = is_ff & (~prev_ff | string_start)

    is_marker = np.zeros(total, dtype=bool)
    ff_pos = np.flatnonzero(is_ff)
    if ff_pos.size:
        rs_pos = np.flatnonzero(run_start)
        rel = ff_pos - rs_pos[np.searchsorted(rs_pos, ff_pos, "right") - 1]
        markers = ff_pos[rel % 2 == 0]
        # each marker's literal must sit inside the SAME string segment
        seg_end = enc_offsets[
            np.searchsorted(enc_offsets, markers, "right")
        ]
        if (markers + 1 >= seg_end).any():
            raise EOFError("dangling FSST escape")
        is_marker[markers] = True

    is_literal = np.zeros(total, dtype=bool)
    if ff_pos.size:
        is_literal[markers + 1] = True
    code_pos = np.flatnonzero(~is_marker & ~is_literal)
    codes = arr[code_pos].astype(np.int64)
    if codes.size and codes.max() >= n_sym:
        raise ValueError("invalid FSST code")

    outlen = np.zeros(total, dtype=np.int64)
    outlen[is_literal] = 1
    outlen[code_pos] = sym_lens[codes]
    c = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(outlen, out=c[1:])
    out_offsets = c[enc_offsets]
    out = np.zeros(int(c[-1]), dtype=np.uint8)

    lit_pos = np.flatnonzero(is_literal)
    out[c[lit_pos]] = arr[lit_pos]
    sl = sym_lens[codes]
    if sl.size:
        dst = np.repeat(c[code_pos], sl) + _ramp(sl)
        src = np.repeat(sym_offsets[codes], sl) + _ramp(sl)
        out[dst] = sym_raw[src]
    return np.ascontiguousarray(out_offsets), out.tobytes()


def fsst_encoded_size_estimate(
    offsets: np.ndarray, data: bytes, sample_rows: int = 512,
    symbols: list[bytes] | None = None,
) -> tuple[int, list[bytes]]:
    """(estimated size for the full column, trained symbols) from a sample.

    ``symbols``: reuse an already-trained table instead of retraining —
    the estimate then prices exactly what the encode would emit with that
    table, so a caller caching symbols across pages of one column stays
    honest (training is ~4x the cost of the actual encode; see the
    per-task cache in chunk.encode_bytes)."""
    n = offsets.size - 1
    if n == 0:
        return 0, []
    step = max(1, n // sample_rows)
    sel = np.arange(0, n, step)[:sample_rows]
    lens = np.diff(offsets)
    sub_data = b"".join(bytes(data[offsets[i] : offsets[i + 1]]) for i in sel)
    if symbols is None:
        symbols = train_symbols(sub_data)
    sub_off = np.zeros(sel.size + 1, dtype=np.int64)
    np.cumsum(lens[sel], out=sub_off[1:])
    enc = fsst_encode(sub_off, sub_data, symbols)
    ratio = len(enc) / max(1, len(sub_data))
    return int(ratio * len(data)) + 64, symbols
