"""FIXED_LEN_BYTE_ARRAY codec (reference types/byte-array.go:94-114):
equal-width binary stored back-to-back with no offsets."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pysparkenc import chunk as chunklib
from pysparkenc.engine import decode_table, encode_table, footer
from pysparkenc.selector import select_bytes


def _offsets(vals: list[bytes]) -> tuple[np.ndarray, bytes]:
    lens = np.array([len(v) for v in vals], dtype=np.int64)
    off = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    return off, b"".join(vals)


def test_flba_roundtrip_and_size():
    vals = [hashlib.md5(str(i).encode()).digest() for i in range(500)]
    off, data = _offsets(vals)
    ck = chunklib.encode_bytes("digest", off, data, "ba_fixed")
    assert ck.enc_bytes == 500 * 16  # zero offset overhead
    got_off, got_data = chunklib.decode_bytes(
        {**ck.__dict__, "data": ck.data}
    )
    assert got_data == data and (got_off == off).all()


def test_flba_selector_picks_it_for_digests():
    vals = [hashlib.md5(str(i).encode()).digest() for i in range(2000)]
    off, data = _offsets(vals)
    choice = select_bytes(off, data)
    assert choice.codec == "ba_fixed"
    # but duplication should still favor the dictionary
    dup = [vals[0]] * 2000
    off2, data2 = _offsets(dup)
    assert select_bytes(off2, data2).codec == "dict_rle"


def test_flba_rejects_ragged_and_truncated():
    off, data = _offsets([b"aaaa", b"bbb"])
    with pytest.raises(ValueError, match="equal-length"):
        chunklib.encode_bytes("x", off, data, "ba_fixed")
    vals = [b"12345678"] * 4
    off, data = _offsets(vals)
    ck = chunklib.encode_bytes("x", off, data, "ba_fixed")
    import zlib

    bad = ck.data[:-3]
    with pytest.raises(ValueError):
        chunklib.decode_bytes(
            {**ck.__dict__, "data": bad, "crc32": zlib.crc32(bad)}
        )


def test_flba_through_engine(spark):
    df = spark.createDataFrame(
        [(i, hashlib.sha256(str(i).encode()).digest()[:16]) for i in range(300)],
        "id long, uuid binary",
    )
    chunks = encode_table(df, num_partitions=2)
    meta = footer(chunks).where(F.col("col") == "uuid").collect()
    assert all(r["codec"] == "ba_fixed" for r in meta)
    got = {r["id"]: bytes(r["uuid"]) for r in decode_table(chunks, df.schema).collect()}
    want = {r["id"]: bytes(r["uuid"]) for r in df.collect()}
    assert got == want


def test_flba_nullable_through_engine(spark):
    df = spark.createDataFrame(
        [
            (i, None if i % 5 == 0 else hashlib.md5(str(i).encode()).digest())
            for i in range(200)
        ],
        "id long, d binary",
    )
    got = {
        r["id"]: (bytes(r["d"]) if r["d"] is not None else None)
        for r in decode_table(
            encode_table(df, num_partitions=1), df.schema
        ).collect()
    }
    want = {
        r["id"]: (bytes(r["d"]) if r["d"] is not None else None)
        for r in df.collect()
    }
    assert got == want


def test_selector_skips_fsst_training_on_high_bit_binary():
    # dense high-bit payloads (decimal128/UUID FLBA, random binary) can
    # only expand under FSST's escape coding — the selector must rule it
    # out from a byte-histogram probe, not pay for symbol training
    rng = np.random.RandomState(0)
    vals = rng.randint(1, 10**7, 2048).astype(np.int64) * 10**16
    words = np.zeros((2048, 16), dtype=np.uint8)
    for i, v in enumerate(vals.tolist()):
        words[i] = np.frombuffer(
            int(v).to_bytes(16, "little", signed=True), dtype=np.uint8
        )
    off = np.arange(2049, dtype=np.int64) * 16
    choice = select_bytes(off, words.tobytes())
    assert "fsst" not in choice.sizes
    # ...while shuffled ASCII text with no shared prefix still probes it
    import random

    random.seed(1)
    w = ["query", "scan", "slow", "sort", "value", "alpha", "beta", "join"]
    texts = [
        (" ".join(random.choices(w, k=12)) + f" {random.randint(0, 10**9)}").encode()
        for _ in range(2048)
    ]
    off2, data2 = _offsets(texts)
    choice2 = select_bytes(off2, data2)
    assert choice2.codec == "fsst"
