"""audit_chunks: the distributed store fsck.

The reference's thrift models a page CRC32 (parquet/parquet.go:5767-5799)
that its reader never computes; here a flipped byte, a truncated payload,
a tampered footer stat, or a malformed bloom must each flag exactly the
chunk it lives in, and an intact store must audit fully ``ok``.
"""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from pysparkenc.engine import CHUNK_SCHEMA, audit_chunks, encode_table


@pytest.fixture(scope="module")
def chunk_rows(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(
        5000
    )
    rows = []
    for df in (docs, li):
        rows += [r.asDict() for r in encode_table(df).collect()]
    return rows


def _audit(spark, rows):
    df = spark.createDataFrame(rows, CHUNK_SCHEMA)
    rep = audit_chunks(df)
    return {
        (r["part_id"], r["chunk_id"], r["col"]): (r["status"], r["error"])
        for r in rep.collect()
    }


def test_intact_store_audits_ok(spark, chunk_rows):
    report = _audit(spark, chunk_rows)
    assert len(report) == len(chunk_rows)
    bad = {k: v for k, v in report.items() if v[0] != "ok"}
    assert not bad, bad


def _tamper(rows, idx, **changes):
    out = [dict(r) for r in rows]
    out[idx] = {**out[idx], **changes}
    return out, (out[idx]["part_id"], out[idx]["chunk_id"], out[idx]["col"])


def test_flipped_payload_byte_is_caught(spark, chunk_rows):
    i = max(range(len(chunk_rows)), key=lambda j: len(chunk_rows[j]["data"]))
    data = bytearray(chunk_rows[i]["data"])
    data[len(data) // 2] ^= 0x40
    rows, key = _tamper(chunk_rows, i, data=bytes(data))
    report = _audit(spark, rows)
    status, err = report[key]
    assert status == "corrupt" and "crc32" in err
    assert sum(1 for s, _ in report.values() if s == "corrupt") == 1


def test_truncation_with_fixed_crc_is_caught(spark, chunk_rows):
    # recomputing the crc over the truncated bytes defeats the crc check;
    # the kernel decode must still reject the short payload
    i = max(range(len(chunk_rows)), key=lambda j: len(chunk_rows[j]["data"]))
    cut = chunk_rows[i]["data"][: len(chunk_rows[i]["data"]) // 2]
    aux = chunk_rows[i]["aux"] or b""
    fixed = zlib.crc32(aux, zlib.crc32(cut)) if aux else zlib.crc32(cut)
    rows, key = _tamper(chunk_rows, i, data=cut, crc32=fixed)
    report = _audit(spark, rows)
    assert report[key][0] == "corrupt"


def test_flipped_dict_page_byte_is_caught(spark, chunk_rows):
    # the chunk crc chains the dictionary page: a flipped aux byte must
    # fail fast, never silently decode remapped values
    i = max(range(len(chunk_rows)), key=lambda j: len(chunk_rows[j]["aux"] or b""))
    aux = bytearray(chunk_rows[i]["aux"] or b"")
    assert aux, "fixture must contain at least one dict chunk"
    aux[len(aux) // 2] ^= 0x10
    rows, key = _tamper(chunk_rows, i, aux=bytes(aux))
    report = _audit(spark, rows)
    status, err = report[key]
    assert status == "corrupt" and "crc32" in err


def test_tampered_footer_stat_is_caught(spark, chunk_rows):
    i = next(
        j
        for j, r in enumerate(chunk_rows)
        if r["dtype"] in ("int32", "int64") and r["num_max"] is not None
        and r["n_values"]
    )
    rows, key = _tamper(chunk_rows, i, num_max=chunk_rows[i]["num_max"] - 1)
    report = _audit(spark, rows)
    status, err = report[key]
    assert status == "corrupt" and "num_max" in err


def test_malformed_bloom_is_caught(spark, chunk_rows):
    i = 0
    rows, key = _tamper(chunk_rows, i, bloom=b"\x00" * 33)
    report = _audit(spark, rows)
    status, err = report[key]
    assert status == "corrupt" and "bloom" in err


def test_audit_reaches_datasource_store(spark, tmp_path):
    from pysparkenc.datasource import register

    register(spark)
    store = str(tmp_path / "store")
    spark.range(10_000).select(
        F.col("id"), F.concat(F.lit("row-"), F.col("id")).alias("s")
    ).write.format("pysparkenc").mode("overwrite").save(store)
    report = audit_chunks(spark.read.parquet(store + "/chunks"))
    counts = {r["status"]: r["count"]
              for r in report.groupBy("status").count().collect()}
    assert counts.get("corrupt", 0) == 0 and counts["ok"] > 0
