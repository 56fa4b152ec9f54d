"""RLE / bit-packed hybrid codec (Parquet encoding ``RLE``, enum 3).

Byte-identical re-implementation of the reference's greedy encoder
(``/root/reference/encoding/hybrid-encoder.go:17-237``) validated against its
golden vectors (``hybrid-encoder_test.go``), but vectorized: instead of the
reference's value-at-a-time state machine we

1. segment the stream into maximal runs with ``np.diff`` (one pass),
2. replay the greedy rule *only over runs of length >= 8* (the only places
   an RLE decision can occur — the 8-value buffer means a repeat count can
   only reach the ``rleThreshold=8`` when the buffer fill is 0 mod 8), and
3. bit-pack everything that stays in bit-packed runs with one vectorized
   ``pack_varwidth`` call over the concatenated survivors.

Greedy semantics reproduced exactly (hybrid-encoder.go:88-124,136-155):
- a value repeated >= 8 times becomes an RLE run ``<uvarint count<<1><value
  in ceil(bw/8) LE bytes>``; the repeat counter resets whenever a full
  8-value group is bit-packed (``:170``), so runs are only RLE-eligible from
  a group boundary;
- bit-packed runs hold whole 8-value groups, at most 63 groups (504 values)
  per header ``<uvarint (groups<<1)|1>`` (``:33-41``);
- the final partial group is zero-padded (``:141-149``).

Known divergence (deliberate): the reference never clears ``packBuffer``
after flushing a bit-packed run (``hybrid-encoder.go:177-194``), so its
output is corrupt whenever a single bit-packed run exceeds 504 values — its
own test only validates the first 504 values
(``hybrid-encoder_test.go:161``). We clear the buffer (parquet-mr
semantics), which keeps every golden vector byte-identical *and* makes
>504-value streams round-trip.

Decoder mirrors ``/root/reference/encoding/hybrid-decoder.go:13-187``
including its error set: empty runs rejected (``:120-131``), RLE value wider
than the declared bit width rejected (``:165-167``), truncation rejected.
"""

from __future__ import annotations

import struct

import numpy as np

from ._bits import (
    pack_const_width,
    read_uvarint,
    unpack_const_width,
    write_uvarint,
)
from .plain import _ramp

RLE_THRESHOLD = 8
MAX_GROUPS_PER_RUN = 63  # (2^6 - 1) groups => 504 values per 1-byte header


def _rle_value_bytes(value: int, bit_width: int) -> bytes:
    nbytes = (bit_width + 7) // 8
    if nbytes == 0:
        return b""
    return int(value).to_bytes(nbytes, "little", signed=False)


def hybrid_encode(
    values: np.ndarray, bit_width: int, *, assume_fits: bool = False
) -> bytes:
    """Encode int array (values must fit ``bit_width`` unsigned bits).

    ``assume_fits=True`` skips the min/max range validation — for
    callers whose values fit by construction (dictionary codes are in
    ``[0, n_unique)`` with the width sized from ``n_unique``), the two
    full-array reductions are pure overhead in the encode hot path."""
    if bit_width < 0 or bit_width > 32:
        raise ValueError(f"invalid bit width {bit_width}")
    values = np.ascontiguousarray(values)
    n = values.size
    if n == 0:
        return b""
    uvals = values
    if not assume_fits:
        lo, hi = int(uvals.min()), int(uvals.max())
        if lo < 0 or (bit_width < 64 and hi >> bit_width):
            raise ValueError("value does not fit declared bit width")

    # --- run segmentation ---------------------------------------------------
    change = np.flatnonzero(np.diff(uvals) != 0)
    run_starts = np.concatenate(([0], change + 1))
    run_ends = np.concatenate((change + 1, [n]))
    run_lens = run_ends - run_starts

    # --- greedy replay over RLE-eligible runs only ---------------------------
    # events: (packed_pos, count, value) — an RLE run emitted after
    # `packed_pos` values of the surviving bit-packed stream.
    events: list[tuple[int, int, int]] = []
    removed_intervals: list[tuple[int, int]] = []
    removed = 0
    long_idx = np.flatnonzero(run_lens >= RLE_THRESHOLD)
    for j in long_idx:
        s = int(run_starts[j])
        L = int(run_lens[j])
        v = int(uvals[s])
        packed_before = s - removed
        b0 = packed_before % 8
        if b0 == 0:
            # buffer empty at run start: count reaches 8 -> whole run is RLE
            events.append((packed_before, L, v))
            removed_intervals.append((s, s + L))
            removed += L
        else:
            c = 8 - b0  # values consumed filling the current group
            rem = L - c
            if rem >= RLE_THRESHOLD:
                events.append((packed_before + c, rem, v))
                removed_intervals.append((s + c, s + L))
                removed += rem
            # else: the whole run stays bit-packed

    # --- surviving values, zero-padded to whole groups ------------------------
    if removed:
        keep = np.ones(n, dtype=bool)
        for a, b in removed_intervals:
            keep[a:b] = False
        packed_vals = uvals[keep]
    else:
        packed_vals = uvals
    npacked = packed_vals.size
    pad = (-npacked) % 8
    if pad:
        packed_vals = np.concatenate(
            (packed_vals, np.zeros(pad, dtype=packed_vals.dtype))
        )
    total_groups = packed_vals.size // 8
    payload = pack_const_width(packed_vals.astype(np.uint64), bit_width)
    gbytes = bit_width  # bytes per 8-value group

    # --- assemble: bit-packed runs (<=63 groups) interleaved with RLE events --
    out = bytearray()

    def emit_groups(g0: int, g1: int) -> None:
        g = g0
        while g < g1:
            take = min(MAX_GROUPS_PER_RUN, g1 - g)
            write_uvarint(out, (take << 1) | 1)
            out.extend(payload[g * gbytes : (g + take) * gbytes])
            g += take

    cursor = 0
    for pos, cnt, val in events:
        gs = pos // 8
        emit_groups(cursor, gs)
        cursor = gs
        write_uvarint(out, cnt << 1)
        out += _rle_value_bytes(val, bit_width)
    emit_groups(cursor, total_groups)
    return bytes(out)


def hybrid_decode(buf: bytes | memoryview, bit_width: int, n: int) -> np.ndarray:
    """Decode ``n`` values; returns uint32 array.

    bit_width 0 means "infinite zeros" (hybrid-decoder.go:73-75).
    """
    if bit_width < 0 or bit_width > 32:
        raise ValueError(f"invalid bit width {bit_width}")
    if bit_width == 0:
        return np.zeros(n, dtype=np.uint32)
    buf = bytes(buf)
    pos = 0
    got = 0
    rle_nbytes = (bit_width + 7) // 8
    limit = (1 << bit_width) - 1

    # pass 1: walk headers only (cheap scalar loop over RUNS, not values)
    packed_segs: list[tuple[int, int, int, int]] = []  # (pos, nbytes, cnt, out0)
    rle_vals: list[int] = []
    rle_cnts: list[int] = []
    rle_out0: list[int] = []
    while got < n:
        header, pos = read_uvarint(buf, pos)
        if header & 1:
            groups = header >> 1
            if groups == 0:
                raise ValueError("rle: empty bit-packed run")
            nbytes = groups * bit_width
            avail = len(buf) - pos
            if avail <= 0:
                raise EOFError("truncated bit-packed run")
            # the reference zero-fills a short final read (Go Read
            # partial-fill into a zeroed buffer, hybrid-decoder.go:138-149
            # — exercised by hybrid-decoder_test.go:11-35)
            packed_segs.append((pos, min(nbytes, avail), groups * 8, got))
            pos += nbytes
            got += groups * 8
        else:
            count = header >> 1
            if count == 0:
                raise ValueError("rle: empty RLE run")
            if pos + rle_nbytes > len(buf):
                raise EOFError("truncated RLE run value")
            value = int.from_bytes(buf[pos : pos + rle_nbytes], "little")
            pos += rle_nbytes
            if value > limit:
                raise ValueError("rle: RLE run value is too large")
            rle_vals.append(value)
            rle_cnts.append(count)
            rle_out0.append(got)
            got += count

    out = np.zeros(got, dtype=np.uint32)

    # pass 2a: ONE unpack over every bit-packed payload (same width), then
    # scatter each segment to its output window
    if packed_segs:
        joined = b"".join(
            buf[p : p + nb].ljust(((cnt // 8) * bit_width), b"\x00")
            for p, nb, cnt, _ in packed_segs
        )
        total_cnt = sum(cnt for _, _, cnt, _ in packed_segs)
        vals = unpack_const_width(joined, bit_width, total_cnt)
        src = 0
        for _, _, cnt, out0 in packed_segs:
            out[out0 : out0 + cnt] = vals[src : src + cnt]
            src += cnt

    # pass 2b: all RLE runs in one repeat + one fancy-index assignment
    if rle_vals:
        cnts = np.asarray(rle_cnts, dtype=np.int64)
        starts = np.asarray(rle_out0, dtype=np.int64)
        idx = np.repeat(starts, cnts) + _ramp(cnts)
        out[idx] = np.repeat(
            np.asarray(rle_vals, dtype=np.uint32), cnts
        )

    return out[:n]


def hybrid_encode_with_size(values: np.ndarray, bit_width: int) -> bytes:
    """4-byte LE length prefix + hybrid stream (the ``InitSize`` framing,
    hybrid-decoder.go:57-68; used by boolean RLE and level streams)."""
    body = hybrid_encode(values, bit_width)
    return struct.pack("<I", len(body)) + body


def hybrid_decode_with_size(
    buf: bytes | memoryview, bit_width: int, n: int
) -> tuple[np.ndarray, int]:
    """Decode a length-prefixed hybrid stream; returns (values, bytes_read)."""
    if bit_width == 0:
        return np.zeros(n, dtype=np.uint32), 0
    buf = bytes(buf)
    if len(buf) < 4:
        raise EOFError("truncated size prefix")
    (size,) = struct.unpack_from("<I", buf, 0)
    if 4 + size > len(buf):
        raise EOFError("truncated sized hybrid stream")
    return hybrid_decode(buf[4 : 4 + size], bit_width, n), 4 + size


def hybrid_encoded_size(values: np.ndarray, bit_width: int) -> int:
    """Exact encoded size in bytes without materializing the buffer.

    Used by the codec auto-selector (SURVEY.md §7.3) — replays the same
    run-level greedy rule arithmetic.
    """
    n = values.size
    if n == 0 or bit_width == 0:
        # bw=0 still writes RLE headers; approximate cheaply
        pass
    uvals = np.ascontiguousarray(values).astype(np.int64, copy=False)
    if n == 0:
        return 0
    change = np.flatnonzero(np.diff(uvals) != 0)
    run_starts = np.concatenate(([0], change + 1))
    run_ends = np.concatenate((change + 1, [n]))
    run_lens = run_ends - run_starts

    def uvarint_len(x: int) -> int:
        return max(1, (x.bit_length() + 6) // 7)

    rle_nbytes = (bit_width + 7) // 8
    size = 0
    removed = 0
    events = 0
    event_positions: list[int] = []
    for j in np.flatnonzero(run_lens >= RLE_THRESHOLD):
        s = int(run_starts[j])
        L = int(run_lens[j])
        packed_before = s - removed
        b0 = packed_before % 8
        if b0 == 0:
            size += uvarint_len(L << 1) + rle_nbytes
            removed += L
            event_positions.append(packed_before)
            events += 1
        else:
            c = 8 - b0
            rem = L - c
            if rem >= RLE_THRESHOLD:
                size += uvarint_len(rem << 1) + rle_nbytes
                removed += rem
                event_positions.append(packed_before + c)
                events += 1
    npacked = n - removed
    total_groups = (npacked + 7) // 8
    # headers: between consecutive event positions, groups split into <=63 runs
    cursor = 0
    for pos in event_positions + [total_groups * 8]:
        gs = pos // 8
        span = gs - cursor
        if span > 0:
            nruns = (span + MAX_GROUPS_PER_RUN - 1) // MAX_GROUPS_PER_RUN
            size += nruns  # 1-byte headers (<=127)
        cursor = gs
    size += total_groups * bit_width
    return size
