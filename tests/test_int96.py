"""INT96 legacy timestamp codec (types/int96.go:13-75): 12-byte layout
golden bytes, kernel roundtrips incl. pre-1970, and the engine-level
forced-codec path on a real timestamp column."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pysparkenc.kernels.int96 import int96_decode, int96_encode


def test_layout_golden_epoch():
    # 1970-01-01T00:00:00 -> julian day 2440588, nanos 0
    data = int96_encode(np.array([0], dtype=np.int64))
    assert len(data) == 12
    nanos, julian = struct.unpack("<qi", data)
    assert (nanos, julian) == (0, 2_440_588)


def test_layout_golden_known_instant():
    # 2020-01-01T00:00:00Z = 18262 days past epoch; +1.5s of day
    micros = 18262 * 86_400_000_000 + 1_500_000
    data = int96_encode(np.array([micros], dtype=np.int64))
    nanos, julian = struct.unpack("<qi", data)
    assert julian == 2_440_588 + 18262
    assert nanos == 1_500_000_000


def test_pre_epoch_floor_division():
    # 1969-12-31T23:59:59 must land on the PREVIOUS julian day with
    # non-negative nanos-of-day, not a negative nanos value
    micros = -1_000_000
    data = int96_encode(np.array([micros], dtype=np.int64))
    nanos, julian = struct.unpack("<qi", data)
    assert julian == 2_440_587
    assert nanos == 86_400_000_000_000 - 1_000_000_000
    assert int96_decode(data, 1)[0] == micros


def test_roundtrip_random():
    rng = np.random.default_rng(7)
    micros = rng.integers(-(2**52), 2**52, size=4096, dtype=np.int64)
    out = int96_decode(int96_encode(micros), micros.size)
    np.testing.assert_array_equal(out, micros)


def test_truncated_payload_raises():
    data = int96_encode(np.arange(10, dtype=np.int64) * 1_000_000)
    with pytest.raises(ValueError):
        int96_decode(data[:-1], 10)
    with pytest.raises(ValueError):
        int96_decode(data, 11)


def test_engine_forced_int96_on_timestamp(spark):
    from pyspark.sql import functions as F

    from pysparkenc.engine import decode_table, encode_table

    df = spark.range(0, 500).select(
        F.col("id"),
        F.timestamp_micros(
            (F.col("id") * 7_919_000_000 - F.lit(2) * 86_400_000_000)
        ).alias("ts"),
    )
    chunks = encode_table(df, codec={"ts": "int96"})
    got = {r["id"]: r["ts"] for r in decode_table(chunks, df.schema).collect()}
    want = {r["id"]: r["ts"] for r in df.collect()}
    assert got == want
    codecs = {
        r["codec"]
        for r in chunks.where(F.col("col") == "ts").select("codec").collect()
    }
    assert codecs == {"int96"}


def test_never_auto_selected(spark):
    from pyspark.sql import functions as F

    from pysparkenc.engine import encode_table

    df = spark.range(0, 2000).select(
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts")
    )
    chunks = encode_table(df)
    codecs = {
        r["codec"]
        for r in chunks.where(F.col("col") == "ts").select("codec").collect()
    }
    assert "int96" not in codecs
