"""Hypothesis property tests: decode(encode(x)) == x for every codec ×
dtype × distribution (re-expresses the reference's fuzz targets,
``/root/reference/encoding/delta-binary-packed-decoder_fuzz.go:8-37``, and
the adversarial profiles of FIXTURES.md §A)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pysparkenc.kernels.bytearray import (
    delta_ba_decode,
    delta_ba_encode,
    delta_ba_encoded_size,
    delta_length_decode,
    delta_length_encode,
    delta_length_encoded_size,
)
from pysparkenc.kernels.delta import (
    delta_bp_decode,
    delta_bp_encode,
    delta_bp_encoded_size,
)
from pysparkenc.kernels.dictenc import (
    dict_codes_encoded_size,
    dict_decode_codes,
    dict_encode_codes,
    dict_page_decode_bytes,
    dict_page_decode_numeric,
    dict_page_encode_bytes,
    dict_page_encode_numeric,
    factorize_bytes,
    factorize_numeric,
)
from pysparkenc.kernels.fsst import fsst_decode, fsst_encode, train_symbols
from pysparkenc.kernels.plain import (
    plain_decode_bool,
    plain_decode_bytes,
    plain_decode_numeric,
    plain_encode_bool,
    plain_encode_bytes,
    plain_encode_numeric,
)
from pysparkenc.kernels.rle import (
    hybrid_decode,
    hybrid_decode_with_size,
    hybrid_encode,
    hybrid_encode_with_size,
    hybrid_encoded_size,
)

I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def to_offsets(strings: list[bytes]) -> tuple[np.ndarray, bytes]:
    lens = np.array([len(s) for s in strings], dtype=np.int64)
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    return offsets, b"".join(strings)


# -- RLE hybrid ---------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**9 - 1), min_size=1, max_size=1200),
)
def test_hybrid_roundtrip_random(xs):
    vals = np.array(xs, dtype=np.int64)
    enc = hybrid_encode(vals, 9)
    assert hybrid_encoded_size(vals, 9) == len(enc)
    assert (hybrid_decode(enc, 9, vals.size) == vals).all()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(1, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_hybrid_roundtrip_runs(run_spec):
    # run-heavy streams exercising the 8-repeat threshold at every alignment
    xs = []
    for v, ln in run_spec:
        xs.extend([v] * ln)
    vals = np.array(xs, dtype=np.int64)
    enc = hybrid_encode(vals, 3)
    assert hybrid_encoded_size(vals, 3) == len(enc)
    assert (hybrid_decode(enc, 3, vals.size) == vals).all()


def test_hybrid_run_edges_7_8_and_504():
    # FIXTURES.md §A profile 5: runs of exactly 7 and 8, 504+ runs
    xs = [1] * 7 + [2] * 8 + [3] * 7 + [4] * 504 + [5] * 505 + [6, 7] * 300
    vals = np.array(xs, dtype=np.int64)
    enc = hybrid_encode(vals, 3)
    assert hybrid_encoded_size(vals, 3) == len(enc)
    assert (hybrid_decode(enc, 3, vals.size) == vals).all()


def test_hybrid_sized_framing():
    vals = np.array([0, 1] * 50, dtype=np.int64)
    enc = hybrid_encode_with_size(vals, 1)
    out, consumed = hybrid_decode_with_size(enc, 1, vals.size)
    assert consumed == len(enc)
    assert (out == vals).all()


# -- delta binary packed -------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.lists(I32, min_size=1, max_size=700))
def test_delta32_roundtrip_random(xs):
    vals = np.array(xs, dtype=np.int32)
    enc = delta_bp_encode(vals, width=32)
    assert delta_bp_encoded_size(vals, width=32) == len(enc)
    out, consumed = delta_bp_decode(enc, width=32)
    assert consumed == len(enc)
    assert (out == vals).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(I64, min_size=1, max_size=400))
def test_delta64_roundtrip_random(xs):
    vals = np.array(xs, dtype=np.int64)
    enc = delta_bp_encode(vals, width=64)
    assert delta_bp_encoded_size(vals, width=64) == len(enc)
    out, consumed = delta_bp_decode(enc, width=64)
    assert consumed == len(enc)
    assert (out == vals).all()


def test_delta_overflow_adversarial():
    # FIXTURES.md §A profile 5: min-delta wraparound (encoder comment
    # delta-binary-packed-encoder.go:173-178)
    vals = np.array(
        [-(2**31), 2**31 - 1, -(2**31), 2**31 - 1, 0, -1, 1, -(2**31)],
        dtype=np.int32,
    )
    enc = delta_bp_encode(vals, width=32)
    out, _ = delta_bp_decode(enc, width=32)
    assert (out == vals).all()
    vals64 = np.array([-(2**63), 2**63 - 1, 0, -1, 2**62, -(2**62)], dtype=np.int64)
    enc64 = delta_bp_encode(vals64, width=64)
    out64, _ = delta_bp_decode(enc64, width=64)
    assert (out64 == vals64).all()


def test_delta_multi_block():
    rng = np.random.default_rng(7)
    vals = np.cumsum(rng.integers(0, 100, size=1000)).astype(np.int32)
    enc = delta_bp_encode(vals, width=32)
    assert delta_bp_encoded_size(vals, width=32) == len(enc)
    out, _ = delta_bp_decode(enc, width=32)
    assert (out == vals).all()
    # sorted data should compress well below PLAIN
    assert len(enc) < vals.size * 4 // 2


def test_delta_single_value_and_block_multiple():
    for n in (1, 2, 128, 129, 257):
        vals = np.arange(n, dtype=np.int32) * 3 + 5
        enc = delta_bp_encode(vals, width=32)
        out, _ = delta_bp_decode(enc, width=32)
        assert (out == vals).all(), n


# -- PLAIN ---------------------------------------------------------------------

@pytest.mark.parametrize("dtype", ["int32", "int64", "float32", "float64"])
def test_plain_numeric_roundtrip(dtype):
    rng = np.random.default_rng(3)
    if dtype.startswith("int"):
        vals = rng.integers(-(2**31), 2**31, size=333).astype(dtype)
    else:
        vals = rng.normal(size=333).astype(dtype)
    enc = plain_encode_numeric(vals, dtype)
    out = plain_decode_numeric(enc, dtype, vals.size)
    assert (out == vals).all()
    assert len(enc) == vals.size * np.dtype(dtype).itemsize


def test_plain_bool_roundtrip():
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 2, size=107).astype(bool)
    enc = plain_encode_bool(vals)
    assert len(enc) == (107 + 7) // 8
    assert (plain_decode_bool(enc, 107) == vals).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=80))
def test_plain_bytes_roundtrip(strings):
    offsets, data = to_offsets(strings)
    enc = plain_encode_bytes(offsets, data)
    out_off, out_data = plain_decode_bytes(enc, len(strings))
    assert (out_off == offsets).all()
    assert out_data == data


# -- dictionary ------------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=500))
def test_dict_numeric_roundtrip(xs):
    vals = np.array(xs, dtype=np.int32)
    codes, uniques = factorize_numeric(vals)
    page = dict_page_encode_numeric(uniques, "int32")
    body = dict_encode_codes(codes, uniques.size)
    assert dict_codes_encoded_size(codes, uniques.size) == len(body)
    u2 = dict_page_decode_numeric(page, "int32", uniques.size)
    c2 = dict_decode_codes(body, vals.size, uniques.size)
    assert (u2[c2] == vals).all()


def test_dict_rejects_out_of_range_index():
    codes = np.array([0, 1, 2, 3], dtype=np.int32)
    body = dict_encode_codes(codes, 4)
    with pytest.raises(ValueError):
        dict_decode_codes(body, 4, 3)  # dict smaller than max code


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=12), min_size=1, max_size=120))
def test_dict_bytes_roundtrip(strings):
    offsets, data = to_offsets(strings)
    codes, d_off, d_data = factorize_bytes(offsets, data)
    page = dict_page_encode_bytes(d_off, d_data)
    body = dict_encode_codes(codes, d_off.size - 1)
    o2, dd2 = dict_page_decode_bytes(page, d_off.size - 1)
    c2 = dict_decode_codes(body, len(strings), d_off.size - 1)
    rebuilt = [bytes(dd2[o2[c] : o2[c + 1]]) for c in c2]
    assert rebuilt == strings


# -- byte array codecs ------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=30), min_size=1, max_size=100))
def test_delta_length_roundtrip(strings):
    offsets, data = to_offsets(strings)
    enc = delta_length_encode(offsets, data)
    assert delta_length_encoded_size(offsets, len(data)) == len(enc)
    out_off, out_data = delta_length_decode(enc, len(strings))
    assert (out_off == offsets).all()
    assert out_data == data


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=30), min_size=1, max_size=100))
def test_delta_ba_roundtrip(strings):
    offsets, data = to_offsets(strings)
    enc = delta_ba_encode(offsets, data)
    assert delta_ba_encoded_size(offsets, data) == len(enc)
    out_off, out_data = delta_ba_decode(enc, len(strings))
    assert (out_off == offsets).all()
    assert out_data == data


def test_delta_ba_front_coding_wins_on_sorted_ids():
    # FIXTURES.md §A: doc_id strings are shared-prefix heavy
    strings = [f"web-{i:012d}".encode() for i in range(2000)]
    offsets, data = to_offsets(strings)
    enc = delta_ba_encode(offsets, data)
    assert len(enc) < len(data) // 2
    out_off, out_data = delta_ba_decode(enc, len(strings))
    assert out_data == data and (out_off == offsets).all()


# -- FSST -------------------------------------------------------------------------

@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=24), min_size=1, max_size=60))
def test_fsst_roundtrip_random(strings):
    offsets, data = to_offsets(strings)
    enc = fsst_encode(offsets, data)
    out_off, out_data = fsst_decode(enc, len(strings))
    assert (out_off == offsets).all()
    assert out_data == data


def test_fsst_compresses_repetitive_text():
    strings = [f"web-{i % 97:06d}-training-corpus".encode() for i in range(1500)]
    offsets, data = to_offsets(strings)
    symbols = train_symbols(data[: 1 << 14])
    enc = fsst_encode(offsets, data, symbols)
    assert len(enc) < len(data) // 2  # must beat PLAIN by 2x on this input
    out_off, out_data = fsst_decode(enc, len(strings))
    assert out_data == data and (out_off == offsets).all()


def test_fsst_handles_escape_byte_in_data():
    strings = [bytes([255, 255, 0, 1]), b"\xff", b"", b"abc\xffdef"]
    offsets, data = to_offsets(strings)
    enc = fsst_encode(offsets, data)
    out_off, out_data = fsst_decode(enc, len(strings))
    assert out_data == data and (out_off == offsets).all()


def test_fsst_long_rows_roundtrip_via_piece_split():
    """Rows past _PIECE_LEN are encoded as independent pieces (codes are
    self-delimiting, so concatenated piece encodings decode back to the
    row); boundary lengths and escape-byte runs crossing cut points must
    all round-trip, and the piece seams must stay invisible on the wire
    (per-ROW length stream)."""
    from pysparkenc.kernels.fsst import _PIECE_LEN

    rng = np.random.default_rng(3)
    words = [f"word{i} ".encode() for i in range(30)]
    strings = [
        b"",
        b"\xff" * (_PIECE_LEN + 3),            # escape run across the seam
        b"x" * (_PIECE_LEN - 1),
        b"y" * _PIECE_LEN,
        b"z" * (_PIECE_LEN + 1),
        b"".join(rng.choice(words, 3 * _PIECE_LEN // 6).tolist()),  # ~3 pieces
        bytes(rng.integers(0, 256, 2 * _PIECE_LEN + 17, dtype=np.uint8)),
        b"short",
    ]
    offsets, data = to_offsets(strings)
    enc = fsst_encode(offsets, data)
    out_off, out_data = fsst_decode(enc, len(strings))
    assert (out_off == offsets).all()
    assert out_data == data


def test_selector_tries_fsst_on_document_length_text():
    """Document-sized rows (~300 B, well past the old 256 B cap) must stay
    FSST-eligible: the length cap only bounds the encoder's lock-step
    loop, not FSST's effectiveness, and a word-based text column sees
    ~5x while every offset/dict codec sits near 1x."""
    from pysparkenc.selector import select_bytes

    rng = np.random.default_rng(7)
    vocab = [f"tok{i}".encode() for i in range(40)]
    strings = [
        b" ".join(rng.choice(vocab, size=60).tolist()) for _ in range(800)
    ]
    offsets, data = to_offsets(strings)
    assert len(data) / len(strings) > 256  # the shape the old gate skipped
    choice = select_bytes(offsets, data)
    assert choice.codec == "fsst"
    assert choice.predicted < 0.5 * (len(data) + 4 * len(strings))
