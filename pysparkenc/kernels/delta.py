"""DELTA_BINARY_PACKED codec for int32/int64 (Parquet enums 5).

Byte-identical, vectorized re-implementation of
``/root/reference/encoding/delta-binary-packed-encoder.go:96-384`` /
``delta-binary-packed-decoder.go:11-322``, validated against the reference's
golden vector (``delta-binary-packed-encoder_test.go:118-137``:
``[7,5,3,1,2,3,4,5]`` -> ``80 01 04 08 0e 03 02 00 00 00 c0 3f 00*6``).

Wire format:
  header  = <uvarint blockSize><uvarint miniblockCount><uvarint valueCount>
            <zigzag-varint firstValue>
  per block (only blocks holding >=1 delta are written):
            <zigzag-varint minDelta>
            <miniblockCount bytes of per-miniblock bit widths (0-padded)>
            <each non-empty miniblock bit-packed at its width, zero-padded
             to the full miniblock value count>

Semantics replicated exactly:
- deltas are computed in the value dtype with two's-complement wraparound,
  and rebased by subtracting the block minimum, again with wraparound
  (encoder comment at ``delta-binary-packed-encoder.go:173-178``);
- per-miniblock width = ``bits.Len`` of the max *unsigned* rebased delta
  (``:195-208``);
- a quirk kept for byte-identity: the int64 encoder initializes its minimum
  tracker to ``math.MaxInt32`` (``delta-binary-packed-encoder.go:277``), so
  for int64 blocks the effective ``minDelta`` is
  ``min(min(deltas), 2^31-1)``;
- partial final miniblocks are packed at full miniblock width with zero
  padding *after* rebasing (``:196-217``);
- a final block is only flushed if it holds at least one delta (``:68-73``).

Decoder rejects the reference's malformed-input set
(``delta-binary-packed-decoder.go:29-94``): block size not a positive
multiple of 128, miniblock count not a positive divisor with a
multiple-of-32 quotient, bit width > 32 (int32) / > 64 (int64), truncation.
"""

from __future__ import annotations

import numpy as np

from ._bits import (
    bit_length_u32,
    bit_length_u64,
    pack_varwidth,
    read_uvarint,
    read_varint,
    unpack_const_width,
    unpack_varwidth,
    write_uvarint,
    write_varint,
)

DEFAULT_BLOCK_SIZE = 128
DEFAULT_MINIBLOCK_COUNT = 4
_MAX_INT32 = (1 << 31) - 1


def _check_params(block_size: int, miniblock_count: int) -> int:
    if block_size <= 0 or block_size % 128 != 0:
        raise ValueError(f"invalid block size {block_size}")
    if miniblock_count <= 0 or block_size % miniblock_count != 0:
        raise ValueError(f"invalid miniblock count {miniblock_count}")
    mb_values = block_size // miniblock_count
    if mb_values % 32 != 0:
        raise ValueError(
            f"invalid miniblock count {miniblock_count}: "
            "miniblock value count must be a multiple of 32"
        )
    return mb_values


def delta_bp_encode(
    values: np.ndarray,
    *,
    width: int = 32,
    block_size: int = DEFAULT_BLOCK_SIZE,
    miniblock_count: int = DEFAULT_MINIBLOCK_COUNT,
) -> bytes:
    """Encode an int32 (width=32) or int64 (width=64) array."""
    mb_values = _check_params(block_size, miniblock_count)
    if width == 32:
        sdtype, udtype = np.int32, np.uint32
        bitlen = bit_length_u32
    elif width == 64:
        sdtype, udtype = np.int64, np.uint64
        bitlen = bit_length_u64
    else:
        raise ValueError("width must be 32 or 64")

    vals = np.ascontiguousarray(values).astype(sdtype, copy=False)
    n = vals.size

    out = bytearray()
    write_uvarint(out, block_size)
    write_uvarint(out, miniblock_count)
    write_uvarint(out, n)
    first = int(vals[0]) if n else 0
    write_varint(out, first)
    if n <= 1:
        return bytes(out)

    # wraparound deltas in the value dtype (reference AddInt32 :149-151)
    with np.errstate(over="ignore"):
        deltas = (vals[1:].astype(udtype) - vals[:-1].astype(udtype)).astype(
            sdtype
        )
    nd = deltas.size

    # ---- all blocks vectorized at once (the per-block Python loop cost
    # ~40us/block in call overhead; a 600k-value chunk has ~4700 blocks) --
    nblocks = (nd + block_size - 1) // block_size

    # per-block min over real deltas only (pad tail with +max)
    pad_min = np.full(nblocks * block_size, np.iinfo(sdtype).max, dtype=sdtype)
    pad_min[:nd] = deltas
    mins = pad_min.reshape(nblocks, block_size).min(axis=1).astype(np.int64)
    if width == 64:
        # int64 quirk: tracker initialized to MaxInt32 (:277)
        np.minimum(mins, _MAX_INT32, out=mins)

    # rebase the whole delta stream by its block's min, wraparound; pad
    # with 0 (bits.Len(0)=0, padding can't raise a miniblock max — same
    # padding the reference applies after rebasing, :196-217)
    with np.errstate(over="ignore"):
        if width == 64:
            mins_u = mins.astype(udtype)  # two's-complement wrap IS the mask
        else:
            mins_u = (mins & ((1 << width) - 1)).astype(udtype)
        rebased = (
            deltas.astype(udtype) - np.repeat(mins_u, block_size)[:nd]
        ).astype(udtype)
    pad0 = np.zeros(nblocks * block_size, dtype=udtype)
    pad0[:nd] = rebased
    bws_all = bitlen(pad0.reshape(-1, mb_values).max(axis=1)).reshape(
        nblocks, miniblock_count
    )

    # one packing pass over every miniblock at its own width; miniblock
    # payloads are 32*bw bits = whole bytes, so block boundaries in the
    # combined stream are byte-aligned and sliceable
    per_value_widths = np.repeat(bws_all.ravel(), mb_values)
    packed = pack_varwidth(pad0, per_value_widths)
    block_bytes = (bws_all.sum(axis=1).astype(np.int64) * mb_values) // 8
    offs = np.zeros(nblocks + 1, dtype=np.int64)
    np.cumsum(block_bytes, out=offs[1:])

    widths_u8 = bws_all.astype(np.uint8)
    for b in range(nblocks):
        write_varint(out, int(mins[b]))
        out += widths_u8[b].tobytes()
        out += packed[offs[b] : offs[b + 1]]
    return bytes(out)


def delta_bp_decode(
    buf: bytes | memoryview, *, width: int = 32
) -> tuple[np.ndarray, int]:
    """Decode a full stream; returns (values, bytes_consumed)."""
    if width == 32:
        sdtype, udtype = np.int32, np.uint32
        max_bw = 32
    elif width == 64:
        sdtype, udtype = np.int64, np.uint64
        max_bw = 64
    else:
        raise ValueError("width must be 32 or 64")
    buf = bytes(buf)
    pos = 0
    block_size, pos = read_uvarint(buf, pos)
    miniblock_count, pos = read_uvarint(buf, pos)
    mb_values = _check_params(block_size, miniblock_count)
    n, pos = read_uvarint(buf, pos)
    first, pos = read_varint(buf, pos)
    if n == 0:
        return np.zeros(0, dtype=sdtype), pos
    out = np.empty(n, dtype=sdtype)
    out[0] = sdtype(first)
    nd = n - 1
    if nd == 0:
        return out, pos
    # pass 1: walk block headers, index every miniblock segment
    # (cheap scalar loop over BLOCKS; the value work is all in pass 2)
    got = 0
    block_mins: list[int] = []
    mb_by_width: dict[int, tuple[list[int], list[int]]] = {}  # w -> (pos, out0)
    mb_cursor = 0  # output slot in units of miniblocks
    while got < nd:
        min_delta, pos = read_varint(buf, pos)
        block_mins.append(min_delta)
        if pos + miniblock_count > len(buf):
            raise EOFError("truncated miniblock width list")
        bws = np.frombuffer(buf, dtype=np.uint8, count=miniblock_count,
                            offset=pos)
        pos += miniblock_count
        if (bws > max_bw).any():
            raise ValueError(f"invalid bit width > {max_bw}")
        remaining = nd - got
        nmb = min(miniblock_count, (remaining + mb_values - 1) // mb_values)
        for k in range(nmb):
            w = int(bws[k])
            nbytes = (w * mb_values) // 8
            if pos + nbytes > len(buf):
                raise EOFError("truncated miniblock payload")
            if w:
                lst = mb_by_width.setdefault(w, ([], []))
                lst[0].append(pos)
                lst[1].append(mb_cursor + k)
            pos += nbytes
        got += min(remaining, nmb * mb_values)
        mb_cursor += miniblock_count

    # pass 2: ONE constant-width unpack per distinct width, scattered into
    # a padded rebased buffer (zero-width miniblocks stay zero)
    rebased = np.zeros(mb_cursor * mb_values, dtype=np.uint64)
    seg_ramp = np.arange(mb_values, dtype=np.int64)
    for w, (poss, out0s) in mb_by_width.items():
        nbytes = (w * mb_values) // 8
        joined = b"".join(buf[p : p + nbytes] for p in poss)
        vals = unpack_const_width(joined, w, len(poss) * mb_values)
        idx = (
            np.asarray(out0s, dtype=np.int64)[:, None] * mb_values + seg_ramp
        ).ravel()
        rebased[idx] = vals

    nblocks = len(block_mins)
    mins = np.asarray(block_mins, dtype=np.int64)
    with np.errstate(over="ignore"):
        if width == 64:
            mins_u = mins.astype(udtype)
        else:
            mins_u = (mins & ((1 << width) - 1)).astype(udtype)
        deltas = (
            rebased[: nblocks * block_size][:nd].astype(udtype)
            + np.repeat(mins_u, block_size)[:nd]
        ).astype(sdtype)
        out[1:] = (
            np.cumsum(deltas.astype(udtype), dtype=udtype)
            + udtype(first & ((1 << width) - 1))
        ).astype(sdtype)
    return out, pos


def delta_bp_encoded_size(
    values: np.ndarray,
    *,
    width: int = 32,
    block_size: int = DEFAULT_BLOCK_SIZE,
    miniblock_count: int = DEFAULT_MINIBLOCK_COUNT,
) -> int:
    """Exact encoded size in one vectorized pass (codec selector input)."""
    mb_values = block_size // miniblock_count
    if width == 32:
        sdtype, udtype, bitlen = np.int32, np.uint32, bit_length_u32
    else:
        sdtype, udtype, bitlen = np.int64, np.uint64, bit_length_u64
    vals = np.ascontiguousarray(values).astype(sdtype, copy=False)
    n = vals.size

    def uvarint_len(x: int) -> int:
        return max(1, (x.bit_length() + 6) // 7)

    from ._bits import zigzag64

    size = (
        uvarint_len(block_size)
        + uvarint_len(miniblock_count)
        + uvarint_len(n)
        + uvarint_len(zigzag64(int(vals[0]) if n else 0))
    )
    if n <= 1:
        return size
    with np.errstate(over="ignore"):
        deltas = (vals[1:].astype(udtype) - vals[:-1].astype(udtype)).astype(sdtype)
    nd = deltas.size
    nblocks = (nd + block_size - 1) // block_size

    # per-block min over real deltas only: pad the tail with +max so the
    # padding never wins the min (fully vectorized; replaces a per-block
    # Python loop that dominated selector time on large chunks)
    pad_min = np.full(nblocks * block_size, np.iinfo(sdtype).max, dtype=sdtype)
    pad_min[:nd] = deltas
    mins = pad_min.reshape(nblocks, block_size).min(axis=1).astype(np.int64)
    if width == 64:
        np.minimum(mins, _MAX_INT32, out=mins)

    # min-delta zigzag-varint header lengths, vectorized (mirrors
    # _bits.zigzag64: unsigned (x<<1), XOR all-ones when negative)
    with np.errstate(over="ignore"):
        zzu = mins.astype(np.uint64) << np.uint64(1)
    zzu = np.where(mins < 0, zzu ^ np.uint64(0xFFFFFFFFFFFFFFFF), zzu)
    nbits = bit_length_u64(zzu)
    size += int(np.maximum(1, (nbits + 6) // 7).sum())
    size += nblocks * miniblock_count  # per-miniblock width bytes

    # rebase all deltas by their block's min, pad with 0 (never wins max)
    with np.errstate(over="ignore"):
        if width == 64:
            mins_u = mins.astype(udtype)  # two's-complement wrap IS the mask
        else:
            mins_u = (mins & ((1 << width) - 1)).astype(udtype)
        block_min = np.repeat(mins_u, block_size)[:nd]
        rebased = (deltas.astype(udtype) - block_min).astype(udtype)
    pad0 = np.zeros(nblocks * block_size, dtype=udtype)
    pad0[:nd] = rebased
    bws = bitlen(pad0.reshape(-1, mb_values).max(axis=1))
    size += int(bws.astype(np.int64).sum()) * mb_values // 8
    return size
