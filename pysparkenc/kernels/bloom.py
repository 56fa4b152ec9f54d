"""Split-block bloom filters (SBBF) for chunk-level membership pruning.

The block structure follows the Apache Parquet bloom-filter spec — the
same SPLIT-BLOCK algorithm the reference carries in its thrift metadata
(`parquet/parquet.go:4953` SplitBlockAlgorithm, `:5008-5024`
BloomFilterAlgorithm BLOCK) but, like the reference's unimplemented
writer, never builds: 256-bit blocks of eight 32-bit words, one bit per
word per key, block chosen by the multiply-shift of the hash's high
word, in-block bits by the spec's eight odd salt constants. With k=8
this hits ~1% false positives at ~10.5 bits/key while every probe
touches exactly one 32-byte block (one cache line).

Hashing diverges deliberately: the parquet spec mandates XXH64 for
cross-implementation file compatibility, but these filters live inside
pysparkenc's own chunk metadata — nothing external ever probes them —
so keys are hashed with the splitmix64 finalizer (numerics) and a
segmented polynomial + splitmix64 (byte strings), both fully
vectorizable in numpy with no per-row Python. The membership contract
is the only contract: ``bloom_check`` has NO false negatives for any
key inserted by ``bloom_build``.

Why blooms when chunks already carry min/max stats and dict pages:
stats prune *ranges* and dict pages only exist when the dictionary
codec won. A high-cardinality column (doc ids, UUID/digest FLBA,
user keys) encodes as delta/plain, and after a shuffle its per-chunk
[min,max] spans nearly the whole key space — equality probes then prune
nothing. The bloom answers exactly that case with ~1 byte/value of
metadata and no payload decode.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# the eight salt constants from the parquet SBBF spec (public)
_SALT = np.array(
    [
        0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
        0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
    ],
    dtype=np.uint32,
)

_MAGIC = b"SB01"
_MAX_BLOCKS = 2048  # 64 KiB cap per chunk filter
_POLY_P = np.uint64(0x100000001B3)  # FNV-1a prime as polynomial base


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_numeric(values: np.ndarray, dtype: str) -> np.ndarray:
    """uint64 key hashes for a numeric chunk's values (or probe values).

    Integers hash their int64 value (so an int32 chunk and an int64
    probe of the same number collide, as equality requires). Floats hash
    their canonicalized float64 bit pattern: -0.0 folds to +0.0 (SQL
    equality treats them equal) and every NaN folds to one quiet NaN
    (Spark treats NaN = NaN as true).
    """
    if dtype in ("int32", "int64"):
        v = np.ascontiguousarray(values, dtype=np.int64)
        return _splitmix64(v.view(np.uint64))
    v = np.ascontiguousarray(values, dtype=np.float64)
    v = np.where(v == 0.0, 0.0, v)  # -0.0 -> +0.0
    bits = v.view(np.uint64)
    bits = np.where(np.isnan(v), np.uint64(0x7FF8000000000000), bits)
    return _splitmix64(bits)


def hash_bytes(offsets: np.ndarray, data: bytes) -> np.ndarray:
    """uint64 key hashes for variable-length byte strings, vectorized.

    Per segment: a polynomial over the bytes in uint64 modular
    arithmetic, weight P^(reverse position) so every byte contributes
    position-dependently, evaluated as one global cumulative sum and a
    gather at the segment boundaries (no per-row loop); the raw
    polynomial and the length are then mixed through splitmix64.
    """
    off = np.asarray(offsets, dtype=np.int64)
    n = off.size - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.diff(off)
    total = int(off[-1] - off[0])
    if total == 0:
        return _splitmix64(lens.astype(np.uint64))
    buf = np.frombuffer(data, dtype=np.uint8, count=int(off[-1]))[
        int(off[0]):
    ].astype(np.uint64)
    base = off - off[0]
    # position from the segment's end: weight[i] = P ** (len - 1 - pos)
    max_len = int(lens.max())
    pow_table = np.empty(max_len, dtype=np.uint64)
    if max_len:
        with np.errstate(over="ignore"):  # mod-2^64 arithmetic is the point
            pow_table[0] = np.uint64(1)
            for i in range(1, max_len):
                pow_table[i] = pow_table[i - 1] * _POLY_P
    seg_id = np.repeat(np.arange(n, dtype=np.int64), lens)
    pos_in_seg = np.arange(total, dtype=np.int64) - np.repeat(base[:-1], lens)
    rev_pos = lens[seg_id] - 1 - pos_in_seg
    terms = buf * pow_table[rev_pos]
    csum = np.zeros(total + 1, dtype=np.uint64)
    np.cumsum(terms, out=csum[1:])
    raw = csum[base[1:]] - csum[base[:-1]]
    return _splitmix64(raw ^ _splitmix64(lens.astype(np.uint64)))


def _block_and_masks(hashes: np.ndarray, nblocks: int):
    h = hashes.astype(np.uint64)
    blk = ((h >> np.uint64(32)) * np.uint64(nblocks)) >> np.uint64(32)
    low = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    x = low[:, None] * _SALT[None, :]  # uint32 wraparound multiply
    masks = (np.uint32(1) << (x >> np.uint32(27))).astype(np.uint32)
    return blk.astype(np.int64), masks


def nblocks_for(ndv: int, fpp: float = 0.01) -> int:
    """Blocks needed for ``ndv`` distinct keys at the target false-positive
    rate, from the standard k=8 bloom sizing m = -k*n / ln(1 - fpp^(1/k)),
    clamped to [1, 2048] blocks (32 B .. 64 KiB)."""
    ndv = max(1, int(ndv))
    bits = -8.0 * ndv / math.log(1.0 - min(0.5, max(1e-6, fpp)) ** 0.125)
    return max(1, min(_MAX_BLOCKS, math.ceil(bits / 256.0)))


def bloom_build(hashes: np.ndarray, ndv: int, fpp: float = 0.01) -> bytes:
    """Serialize an SBBF containing every key hash: magic + uint32 nblocks
    + nblocks*8 little-endian uint32 words."""
    nblocks = nblocks_for(ndv, fpp)
    words = np.zeros((nblocks, 8), dtype=np.uint32)
    if hashes.size:
        blk, masks = _block_and_masks(hashes, nblocks)
        np.bitwise_or.at(words, blk, masks)
    return _MAGIC + struct.pack("<I", nblocks) + words.astype("<u4").tobytes()


def bloom_check(filter_bytes: bytes, hashes: np.ndarray) -> np.ndarray:
    """Membership per probe hash: True = maybe present (FPP applies),
    False = definitely absent. Raises on a corrupt/foreign buffer."""
    if len(filter_bytes) < 8 or filter_bytes[:4] != _MAGIC:
        raise ValueError("not a pysparkenc SBBF buffer")
    (nblocks,) = struct.unpack_from("<I", filter_bytes, 4)
    if len(filter_bytes) != 8 + nblocks * 32:
        raise ValueError("SBBF buffer length mismatch")
    words = np.frombuffer(filter_bytes, dtype="<u4", offset=8).reshape(
        nblocks, 8
    )
    if hashes.size == 0:
        return np.empty(0, dtype=bool)
    blk, masks = _block_and_masks(hashes, nblocks)
    return ((words[blk] & masks) == masks).all(axis=1)
