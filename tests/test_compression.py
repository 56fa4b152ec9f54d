"""Block-compression layer (reference's compression/ package re-expressed).

The reference applies BlockCompressor codecs to already-encoded page
payloads (compression/compressor.go:3-6, registry file-reader.go:316-325);
here compression wraps encoded chunk payloads and must (a) round-trip
bit-identically through every codec, (b) never be kept when it grows the
chunk, (c) reject unknown codec names like the reference's unregistered-
codec error path.
"""

from __future__ import annotations

import numpy as np
import pytest

from pysparkenc import chunk as chunklib
from pysparkenc import compress as blockcomp


def _as_dict(ck):
    return {f: getattr(ck, f) for f in ck.__dataclass_fields__}


@pytest.mark.parametrize("codec", ["plain", "delta_bp", "dict_rle", "for_rle"])
def test_numeric_gzip_roundtrip(codec):
    rng = np.random.default_rng(7)
    vals = np.repeat(rng.integers(0, 60, 300), 25).astype(np.int32)
    ck = chunklib.compress_chunk(
        chunklib.encode_numeric("c", vals, "int32", codec), "gzip"
    )
    out = chunklib.decode_numeric(_as_dict(ck))
    assert np.array_equal(out, vals)


@pytest.mark.parametrize(
    "codec", ["ba_plain", "ba_delta_len", "ba_delta", "dict_rle", "fsst"]
)
def test_bytes_gzip_roundtrip(codec):
    strs = [f"prefix-{i % 9}-suffix-{i % 3}" for i in range(400)]
    data = "".join(strs).encode()
    lens = np.array([len(s) for s in strs])
    offsets = np.zeros(len(strs) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    ck = chunklib.compress_chunk(
        chunklib.encode_bytes("s", offsets, data, codec), "gzip"
    )
    off2, data2 = chunklib.decode_bytes(_as_dict(ck))
    assert data2 == data
    assert np.array_equal(off2, offsets)


def test_incompressible_payload_kept_raw():
    rng = np.random.default_rng(11)
    vals = rng.integers(-(2**31), 2**31, 20_000).astype(np.int32)
    raw = chunklib.encode_numeric("r", vals, "int32", "plain")
    ck = chunklib.compress_chunk(
        chunklib.encode_numeric("r", vals, "int32", "plain"), "gzip"
    )
    assert "comp" not in (ck.extra or "")
    assert ck.enc_bytes == raw.enc_bytes


def test_unknown_codec_rejected():
    with pytest.raises(ValueError, match="not available"):
        blockcomp.compress("lzo", b"x")
    with pytest.raises(ValueError, match="not available"):
        blockcomp.decompress("lzo", b"x")


def test_crc_covers_stored_bytes():
    vals = np.repeat(np.arange(100, dtype=np.int32), 50)
    ck = chunklib.compress_chunk(
        chunklib.encode_numeric("c", vals, "int32", "for_rle"), "gzip"
    )
    d = _as_dict(ck)
    d["data"] = d["data"][:-1] + bytes([d["data"][-1] ^ 0xFF])
    with pytest.raises(ValueError, match="crc32"):
        chunklib.decode_numeric(d)


def test_engine_roundtrip_with_compression(spark):
    from pysparkenc.engine import decode_table, encode_table
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 400, seed=3)
    chunks = encode_table(
        df, partition_by=("source", "doc_id"), num_partitions=4,
        compression="gzip",
    )
    rows = chunks.collect()
    assert any('"comp": "gzip"' in (r["extra"] or "") for r in rows)
    decoded = decode_table(
        spark.createDataFrame(rows, schema=chunks.schema), df.schema
    )
    orig = {r["doc_id"]: r["tokens"] for r in df.collect()}
    got = {r["doc_id"]: r["tokens"] for r in decoded.collect()}
    assert got == orig
