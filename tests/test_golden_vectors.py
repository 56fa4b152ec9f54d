"""Golden wire-format vectors from the reference's test suite
(FIXTURES.md §B) — our encoders must be byte-identical, our decoders must
accept the reference's bytes.

Sources: /root/reference/encoding/hybrid-encoder_test.go,
hybrid-decoder_test.go, delta-binary-packed-encoder_test.go,
delta-binary-packed-decoder_test.go, bitpacking32_test.go.
"""

from __future__ import annotations

import numpy as np
import pytest

from pysparkenc.kernels._bits import (
    pack_const_width,
    read_uvarint,
    unpack_const_width,
    write_uvarint,
    write_varint,
)
from pysparkenc.kernels.delta import delta_bp_decode, delta_bp_encode
from pysparkenc.kernels.rle import (
    hybrid_decode,
    hybrid_encode,
    hybrid_encoded_size,
)


def uvarint_bytes(x: int) -> bytes:
    out = bytearray()
    write_uvarint(out, x)
    return bytes(out)


# -- hybrid golden vectors (hybrid-encoder_test.go) ---------------------------

def test_hybrid_rle_only():
    # :15-54 — bw=3, 100×4 then 100×5
    vals = np.array([4] * 100 + [5] * 100, dtype=np.int32)
    enc = hybrid_encode(vals, 3)
    assert enc == uvarint_bytes(200) + b"\x04" + uvarint_bytes(200) + b"\x05"
    assert hybrid_encoded_size(vals, 3) == len(enc)
    assert (hybrid_decode(enc, 3, 200) == vals).all()


def test_hybrid_repeated_zeros():
    # :56-78 — bw=3, 10 zeros
    vals = np.zeros(10, dtype=np.int32)
    enc = hybrid_encode(vals, 3)
    assert enc == uvarint_bytes(20) + b"\x00"
    assert (hybrid_decode(enc, 3, 10) == 0).all()


def test_hybrid_bit_width_zero():
    # :80-101 — bw=0, header only, no payload
    vals = np.zeros(10, dtype=np.int32)
    enc = hybrid_encode(vals, 0)
    assert enc == uvarint_bytes(20)
    assert (hybrid_decode(enc, 0, 10) == 0).all()


def test_hybrid_bitpacking_only():
    # :103-133 — bw=3, i%3 for 100 values -> header 27 + exact 39 bytes
    vals = np.array([i % 3 for i in range(100)], dtype=np.int32)
    enc = hybrid_encode(vals, 3)
    expected_payload = bytes(
        [136, 16, 33, 66, 132, 8, 17, 34, 68] * 4 + [136, 0, 0]
    )
    assert enc == uvarint_bytes(27) + expected_payload
    assert hybrid_encoded_size(vals, 3) == len(enc)
    assert (hybrid_decode(enc, 3, 100) == vals).all()


def test_hybrid_bitpacking_overflow_504():
    # :135-164 — 1000 values -> first run capped at 63 groups (header 127)
    vals = np.array([i % 3 for i in range(1000)], dtype=np.int32)
    enc = hybrid_encode(vals, 3)
    h, pos = read_uvarint(enc, 0)
    assert h == ((504 // 8) << 1) | 1 == 127
    # first 504 values decode from the first run
    first = unpack_const_width(enc[pos : pos + 63 * 3], 3, 504)
    assert (first == vals[:504].astype(np.uint64)).all()
    # and unlike the reference (packBuffer never cleared,
    # hybrid-encoder.go:177-194), the whole stream round-trips
    assert (hybrid_decode(enc, 3, 1000) == vals).all()
    assert hybrid_encoded_size(vals, 3) == len(enc)


def test_hybrid_transition_bitpack_to_rle():
    # :166-218
    vals = np.array([0, 1, 0, 1, 0, 2, 2, 2] + [2] * 100, dtype=np.int32)
    enc = hybrid_encode(vals, 3)
    expected = (
        uvarint_bytes(3)
        + pack_const_width(
            np.array([0, 1, 0, 1, 0, 2, 2, 2], dtype=np.uint64), 3
        )
        + uvarint_bytes(200)
        + b"\x02"
    )
    assert enc == expected
    assert (hybrid_decode(enc, 3, 108) == vals).all()
    assert hybrid_encoded_size(vals, 3) == len(enc)


def test_hybrid_padding_partial_group():
    # :220-245 — bw=5, values 1..9 -> 2 groups, zero padded
    vals = np.arange(1, 10, dtype=np.int32)
    enc = hybrid_encode(vals, 5)
    padded = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 0, 0, 0, 0, 0, 0], dtype=np.uint64)
    assert enc == uvarint_bytes(5) + pack_const_width(padded, 5)
    assert (hybrid_decode(enc, 5, 9) == vals).all()


def test_hybrid_switching_modes():
    # :247-322 — bw=9: RLE(25,17), bitpack 16, RLE(19,6), RLE(8,5)
    vals = np.array(
        [17] * 25 + [7] * 7 + [8, 9, 10] + [6] * 25 + [5] * 8, dtype=np.int32
    )
    enc = hybrid_encode(vals, 9)
    packed = np.array(
        [7, 7, 7, 7, 7, 7, 7, 8, 9, 10, 6, 6, 6, 6, 6, 6], dtype=np.uint64
    )
    expected = (
        uvarint_bytes(50)
        + (17).to_bytes(2, "little")
        + uvarint_bytes(5)
        + pack_const_width(packed, 9)
        + uvarint_bytes(38)
        + (6).to_bytes(2, "little")
        + uvarint_bytes(16)
        + (5).to_bytes(2, "little")
    )
    assert enc == expected
    assert (hybrid_decode(enc, 9, vals.size) == vals).all()
    assert hybrid_encoded_size(vals, 9) == len(enc)


def test_hybrid_decoder_group_boundary():
    # hybrid-decoder_test.go:11-35 — [(1<<1)|1, 0b00111001] bw=2 -> [1,2,3]
    buf = bytes([(1 << 1) | 1, 0b00111001])
    assert (hybrid_decode(buf, 2, 3) == np.array([1, 2, 3])).all()


def test_hybrid_decoder_rejects_bad_input():
    # FIXTURES.md §C
    with pytest.raises(ValueError):
        hybrid_decode(bytes([0 << 1]), 3, 1)  # empty RLE run
    with pytest.raises(ValueError):
        hybrid_decode(bytes([(0 << 1) | 1]), 3, 1)  # empty bit-packed run
    with pytest.raises(ValueError):
        hybrid_decode(bytes([2 << 1, 0xFF]), 3, 2)  # RLE value too large
    with pytest.raises(EOFError):
        hybrid_decode(bytes([100 << 1]), 3, 100)  # truncated RLE value
    with pytest.raises(EOFError):
        hybrid_decode(bytes([(2 << 1) | 1]), 3, 16)  # empty payload
    # a short (but non-empty) final read zero-fills, like the reference's
    # single Go Read call into a zeroed buffer (hybrid-decoder.go:138-149)
    vals = hybrid_decode(bytes([(2 << 1) | 1, 0x49]), 3, 16)
    assert (vals[:2] == [1, 1]).all() and (vals[3:] == 0).all()


# -- delta binary packed golden vectors ---------------------------------------

GOLDEN_DELTA_INPUT = np.array([7, 5, 3, 1, 2, 3, 4, 5])
GOLDEN_DELTA_BYTES = bytes(
    [128, 1, 4, 8, 14, 3, 2, 0, 0, 0, 192, 63, 0, 0, 0, 0, 0, 0]
)


def test_delta_bp32_golden():
    # delta-binary-packed-encoder_test.go:118-137
    enc = delta_bp_encode(
        GOLDEN_DELTA_INPUT.astype(np.int32), width=32,
        block_size=128, miniblock_count=4,
    )
    assert enc == GOLDEN_DELTA_BYTES


def test_delta_bp64_golden():
    # :274-296 — identical bytes for int64
    enc = delta_bp_encode(
        GOLDEN_DELTA_INPUT.astype(np.int64), width=64,
        block_size=128, miniblock_count=4,
    )
    assert enc == GOLDEN_DELTA_BYTES


def test_delta_decode_golden():
    # delta-binary-packed-decoder_test.go:120-153
    vals, consumed = delta_bp_decode(GOLDEN_DELTA_BYTES, width=32)
    assert consumed == len(GOLDEN_DELTA_BYTES)
    assert (vals == GOLDEN_DELTA_INPUT).all()
    vals64, _ = delta_bp_decode(GOLDEN_DELTA_BYTES, width=64)
    assert (vals64 == GOLDEN_DELTA_INPUT).all()


def test_delta_decode_empty_stream():
    # :141-153 — header with count 0 -> no values
    vals, _ = delta_bp_decode(bytes([128, 1, 4, 0, 0]), width=32)
    assert vals.size == 0


@pytest.mark.parametrize("block_size", [0, 127, 129])
def test_delta_invalid_block_size(block_size):
    # :58-75
    with pytest.raises(ValueError):
        delta_bp_encode(np.arange(4, dtype=np.int32), width=32,
                        block_size=block_size, miniblock_count=4)
    buf = bytearray()
    write_uvarint(buf, block_size)
    write_uvarint(buf, 4)
    write_uvarint(buf, 4)
    write_varint(buf, 0)
    with pytest.raises(ValueError):
        delta_bp_decode(bytes(buf), width=32)


@pytest.mark.parametrize("mb_count", [0, 3, 256])
def test_delta_invalid_miniblock_count(mb_count):
    # :77-95
    with pytest.raises(ValueError):
        delta_bp_encode(np.arange(4, dtype=np.int32), width=32,
                        block_size=128, miniblock_count=mb_count)


def test_delta_rejects_too_wide_bitwidth():
    # decoder :78-88 — width byte > 32 rejected for int32
    buf = bytearray(bytes([128, 1, 33, 0]))  # block 128, mb 1, count 33, first 0
    buf += bytes([0])  # minDelta 0
    buf += bytes([40])  # bogus 40-bit width
    buf += bytes(128 * 40 // 8)
    with pytest.raises(ValueError):
        delta_bp_decode(bytes(buf), width=32)


def test_delta_truncation_rejected():
    with pytest.raises(EOFError):
        delta_bp_decode(GOLDEN_DELTA_BYTES[:-4], width=32)


# -- bit-pack width tables (bitpacking32_test.go) ------------------------------

def test_bitpack_width1():
    assert (
        unpack_const_width(bytes([0x4D]), 1, 8)
        == np.array([1, 0, 1, 1, 0, 0, 1, 0])
    ).all()


def test_bitpack_width2():
    assert (
        unpack_const_width(bytes([0xA4, 0x41]), 2, 8)
        == np.array([0, 1, 2, 2, 1, 0, 0, 1])
    ).all()


def test_bitpack_width3():
    assert (
        unpack_const_width(bytes([0x88, 0xC6, 0xFA]), 3, 8)
        == np.arange(8)
    ).all()


@pytest.mark.parametrize("width", list(range(0, 65)))
def test_bitpack_roundtrip_every_width(width):
    rng = np.random.default_rng(42 + width)
    if width == 0:
        vals = np.zeros(64, dtype=np.uint64)
    elif width == 64:
        vals = rng.integers(0, 1 << 63, size=64, dtype=np.uint64) * 2 + rng.integers(0, 2, 64).astype(np.uint64)
    else:
        vals = rng.integers(0, 1 << width, size=64, dtype=np.uint64)
    packed = pack_const_width(vals, width)
    assert len(packed) == 64 * width // 8
    out = unpack_const_width(packed, width, 64)
    assert (out == vals).all()
