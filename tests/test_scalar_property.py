"""Property tests for the engine's scalar encode/decode pair.

`_encode_scalar_chunk` / `_decode_scalar_array` carry every leaf value in
the system (top-level columns, struct leaves, list elements, map
keys/values); this fuzzes them directly over Arrow arrays — no Spark
session, so hypothesis can run hundreds of cases: random logical type,
random values, random validity mask, all codecs auto-selected.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from pysparkenc import engine as E


def _ck_dict(ck) -> dict:
    d = dict(ck.__dict__)
    return d


_SCALARS = st.sampled_from(
    ["int32", "int64", "float64", "bool", "string", "binary", "date_day",
     "decimal(12,3)"]
)


def _values_for(logical: str, n: int, rnd: np.random.Generator):
    if logical == "int32":
        return pa.array(rnd.integers(-(2**31), 2**31, n, dtype=np.int64)
                        .astype(np.int32))
    if logical == "int64":
        return pa.array(rnd.integers(-(2**62), 2**62, n, dtype=np.int64))
    if logical == "float64":
        return pa.array(rnd.normal(size=n))
    if logical == "bool":
        return pa.array(rnd.integers(0, 2, n).astype(bool))
    if logical == "string":
        return pa.array(
            ["s" * int(k) + str(k) for k in rnd.integers(0, 20, n)],
            pa.string(),
        )
    if logical == "binary":
        return pa.array(
            [bytes(rnd.integers(0, 256, int(k), dtype=np.uint8).tobytes())
             for k in rnd.integers(0, 12, n)],
            pa.binary(),
        )
    if logical == "date_day":
        days = rnd.integers(-3000, 40000, n)
        return pa.array(
            [dt.date(1970, 1, 1) + dt.timedelta(days=int(d)) for d in days],
            pa.date32(),
        )
    if logical.startswith("decimal("):
        vals = rnd.integers(-(10**11), 10**11, n, dtype=np.int64)
        return pa.array(
            [Decimal(int(v)) / 1000 for v in vals], pa.decimal128(12, 3)
        )
    raise AssertionError(logical)


@settings(max_examples=150, deadline=None)
@given(
    logical=_SCALARS,
    n=st.integers(min_value=1, max_value=300),
    seed=st.integers(min_value=0, max_value=2**31),
    null_frac=st.sampled_from([0.0, 0.1, 0.9, 1.0]),
)
def test_scalar_roundtrip_with_validity(logical, n, seed, null_frac):
    rnd = np.random.default_rng(seed)
    full = _values_for(logical, n, rnd)
    valid = rnd.random(n) >= null_frac
    if null_frac == 0.0:
        v = None
        compact = full
    else:
        v = valid
        compact = full.filter(pa.array(valid))
    ck = E._encode_scalar_chunk("c", compact, logical, None, None)
    got = E._decode_scalar_array(_ck_dict(ck), logical, n, v)
    if v is None:
        assert got.to_pylist() == full.to_pylist()
    else:
        want = [
            full[i].as_py() if valid[i] else None for i in range(n)
        ]
        assert got.to_pylist() == want
