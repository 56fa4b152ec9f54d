"""BYTE_STREAM_SPLIT codec: round-trips, corruption rejection, and the
compression-aware selector picking it for float chunks.

(The reference defines the enum, parquet/parquet.go:355, but never
implements the codec — there is no byte-level reference contract, so
correctness = self round-trip + the size win it exists for.)
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pysparkenc import chunk as chunklib
from pysparkenc.kernels.bss import bss_decode, bss_encode
from pysparkenc.selector import select_numeric


@pytest.mark.parametrize("dtype", ["int32", "int64", "float32", "float64"])
def test_roundtrip_all_dtypes(dtype):
    rng = np.random.default_rng(3)
    if dtype.startswith("f"):
        vals = (rng.normal(100, 5, 10_000)).astype(dtype)
    else:
        vals = rng.integers(-1000, 1000, 10_000).astype(dtype)
    out = bss_decode(bss_encode(vals, dtype), dtype, vals.size)
    assert out.dtype == vals.dtype
    assert np.array_equal(out, vals)


def test_empty_and_single():
    assert bss_decode(bss_encode(np.zeros(0, np.float32), "float32"),
                      "float32", 0).size == 0
    one = np.array([3.14], np.float64)
    assert np.array_equal(bss_decode(bss_encode(one, "float64"), "float64", 1), one)


def test_nan_inf_negzero_bit_identical():
    vals = np.array([np.nan, np.inf, -np.inf, -0.0, 0.0, 1e-45], np.float32)
    out = bss_decode(bss_encode(vals, "float32"), "float32", vals.size)
    assert out.tobytes() == vals.tobytes()  # bit-identity incl. NaN payload


def test_truncated_payload_raises():
    vals = np.arange(100, dtype=np.float32)
    data = bss_encode(vals, "float32")
    with pytest.raises(ValueError, match="BYTE_STREAM_SPLIT"):
        bss_decode(data[:-3], "float32", 100)


@given(
    st.lists(st.floats(allow_nan=False, width=32), min_size=0, max_size=500)
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.float32)
    out = bss_decode(bss_encode(vals, "float32"), "float32", vals.size)
    assert out.tobytes() == vals.tobytes()


def test_selector_prefers_bss_under_compression():
    # similar-magnitude DOUBLES: exponent/sign bytes nearly constant ->
    # bss + gzip crushes them; without compression bss must NOT be chosen.
    # (float64 gaussians also defeat ALP: no exponent reconstructs the
    # full 52-bit mantissa, so bss has no lightweight competitor here.)
    rng = np.random.default_rng(1)
    vals = rng.normal(1000.0, 1.0, 50_000)
    plain_choice = select_numeric(vals, "float64", compression=None)
    assert plain_choice.codec != "bss"
    comp_choice = select_numeric(vals, "float64", compression="gzip")
    assert comp_choice.codec == "bss"


def test_alp_beats_bss_on_fixed_magnitude_float32():
    # float32 at one magnitude holds ~24 information bits; ALP at a high
    # exponent stores them bit-exactly in fewer than 32 packed bits, so
    # it beats both plain AND the bss+compression route outright
    rng = np.random.default_rng(1)
    vals = (rng.normal(1000.0, 1.0, 50_000)).astype(np.float32)
    ch = select_numeric(vals, "float32", compression="gzip")
    assert ch.codec == "alp"
    assert ch.sizes["alp"] < vals.nbytes


def test_chunk_roundtrip_with_compression():
    rng = np.random.default_rng(5)
    vals = (rng.normal(7.0, 0.5, 30_000)).astype(np.float64)
    ck = chunklib.compress_chunk(
        chunklib.encode_numeric("x", vals, "float64", compression="gzip"),
        "gzip",
    )
    assert ck.codec == "bss"
    # the claim that justifies bss: under the same block compressor it
    # beats the plain layout (sign/exponent streams become long runs)
    import zlib

    plain_gz = len(zlib.compress(vals.astype("<f8").tobytes(), 6))
    assert ck.enc_bytes < plain_gz
    assert ck.enc_bytes < vals.nbytes
    d = {f: getattr(ck, f) for f in ck.__dataclass_fields__}
    out = chunklib.decode_numeric(d)
    assert out.tobytes() == vals.tobytes()
