"""ALP decimal-float codec: bit-exact round-trips (incl. -0.0/NaN/Inf
exceptions), selector viability, size wins on decimal columns.

No reference contract exists (the reference has no float compression
beyond PLAIN, datastore/float.go:24), so correctness = bit-identity +
the size win the codec exists for.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pysparkenc import chunk as chunklib
from pysparkenc.kernels.alp import (
    alp_decode,
    alp_encode,
    alp_encoded_size,
)
from pysparkenc.selector import select_numeric

U = {"float64": np.uint64, "float32": np.uint32}


def _bits_equal(a, b, dtype):
    return np.array_equal(a.view(U[dtype]), b.view(U[dtype]))


def _as_dict(ck):
    return {f: getattr(ck, f) for f in ck.__dataclass_fields__}


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_prices_roundtrip_and_shrink(dtype):
    rng = np.random.default_rng(7)
    # float32 can't hold 7-digit decimals exactly; keep its range small
    hi = 100_000 if dtype == "float64" else 500
    v = np.round(rng.uniform(1, hi, 50_000), 2).astype(dtype)
    enc = alp_encode(v, dtype)
    assert _bits_equal(alp_decode(enc, dtype, v.size), v, dtype)
    assert len(enc) < 0.6 * v.nbytes  # a real size win, not a tie


def test_specials_are_bit_exact_exceptions():
    v = np.round(np.random.default_rng(1).uniform(0, 10, 500), 3)
    v[::25] = np.nan
    v[1::25] = np.inf
    v[2::25] = -np.inf
    v[3::25] = -0.0
    v[4::25] = np.pi
    out = alp_decode(alp_encode(v, "float64"), "float64", v.size)
    assert _bits_equal(out, v, "float64")
    # the negative zero really came back negative
    assert np.signbit(out[3])


def test_random_floats_not_viable_and_selector_keeps_plain():
    g = np.random.default_rng(2).standard_normal(8_192)
    assert alp_encoded_size(g, "float64") is None
    assert select_numeric(g, "float64").codec == "plain"


def test_selector_picks_alp_on_decimals():
    v = np.round(np.random.default_rng(3).uniform(0, 1e6, 8_192), 2)
    ch = select_numeric(v, "float64")
    assert ch.codec == "alp"
    assert ch.sizes["alp"] < ch.sizes["plain"]


def test_chunk_layer_roundtrip_forced_and_auto():
    v = np.round(np.random.default_rng(4).uniform(-50, 50, 4_096), 1)
    for codec in ("alp", None):
        ck = chunklib.encode_numeric("x", v, "float64", codec)
        got = chunklib.decode_numeric(_as_dict(ck))
        assert _bits_equal(got, v, "float64")
    assert chunklib.encode_numeric("x", v, "float64", None).codec == "alp"


def test_truncated_payload_rejected():
    v = np.round(np.random.default_rng(5).uniform(0, 100, 1_000), 2)
    enc = alp_encode(v, "float64")
    with pytest.raises(Exception):
        alp_decode(enc[: len(enc) // 2], "float64", v.size)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(-10**6, 10**6).map(lambda i: i / 100.0),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=0,
        max_size=400,
    )
)
def test_hypothesis_bit_exact(xs):
    v = np.array(xs, dtype=np.float64)
    out = alp_decode(alp_encode(v, "float64"), "float64", v.size)
    assert _bits_equal(out, v, "float64")
