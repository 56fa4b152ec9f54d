"""Struct shredding to dotted leaf columns + reassembly.

Mirrors the reference's tree-shredding naming scheme
(schema/column.go:75-77 dotted paths; schema/column.go:259-304 recursion):
``person.addr.city`` leaf chunks, ``person#def`` struct-validity chunks,
StructArray reassembly bottom-up on decode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkenc.engine import (
    decode_table,
    encode_table,
    footer,
    output_schema_of_chunks,
)


def _mk_nested(spark, n=120):
    rows = []
    for i in range(n):
        inner = None if i % 11 == 0 else (f"city{i % 5}", None if i % 3 == 0 else i * 2)
        rows.append((i, None if i % 7 == 0 else (f"name{i}", i % 4, inner), float(i)))
    return spark.createDataFrame(
        rows,
        "id long, person struct<name:string, grade:int, "
        "addr:struct<city:string, zip:long>>, score double",
    )


def test_struct_roundtrip_nulls_at_every_level(spark):
    df = _mk_nested(spark)
    dec = decode_table(encode_table(df, num_partitions=3), df.schema)
    got = {r["id"]: (r["person"], r["score"]) for r in dec.collect()}
    want = {r["id"]: (r["person"], r["score"]) for r in df.collect()}
    assert got == want


def test_struct_chunk_naming(spark):
    df = _mk_nested(spark, 40)
    chunks = encode_table(df, num_partitions=1)
    cols = {r["col"] for r in chunks.select("col").distinct().collect()}
    assert {"person.name", "person.grade", "person.addr.city",
            "person.addr.zip", "person#def", "person.addr#def"} <= cols
    # no chunk for the struct container itself, only leaves + validity
    assert "person" not in cols and "person.addr" not in cols


def test_struct_schema_recovery(spark):
    df = _mk_nested(spark, 60)
    chunks = encode_table(df, num_partitions=2)
    rec = output_schema_of_chunks(chunks)
    assert rec["person"].dataType.simpleString() == (
        "struct<name:string,grade:int,addr:struct<city:string,zip:bigint>>"
    )
    assert rec["person"].nullable
    got = {r["id"]: r["person"] for r in decode_table(chunks).collect()}
    want = {r["id"]: r["person"] for r in df.collect()}
    assert got == want


def test_struct_non_null_has_no_def_chunk(spark):
    df = spark.createDataFrame(
        [(i, (i * 2, f"s{i}")) for i in range(50)],
        "id long, pair struct<a:long, b:string>",
    )
    chunks = encode_table(df, num_partitions=1)
    cols = {r["col"] for r in chunks.select("col").distinct().collect()}
    assert cols == {"id", "pair.a", "pair.b"}
    got = {r["id"]: r["pair"] for r in decode_table(chunks, df.schema).collect()}
    want = {r["id"]: r["pair"] for r in df.collect()}
    assert got == want


def test_struct_with_list_and_logical_leaves(spark):
    import datetime as dt
    from decimal import Decimal

    rows = [
        (
            i,
            (
                [j for j in range(i % 4)],
                dt.date(2020, 1, 1) + dt.timedelta(days=i),
                Decimal(i) / 100,
            ),
        )
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows,
        "id long, rec struct<xs:array<int>, d:date, p:decimal(10,2)>",
    )
    dec = decode_table(encode_table(df, num_partitions=2), df.schema)
    got = {r["id"]: r["rec"] for r in dec.collect()}
    want = {r["id"]: r["rec"] for r in df.collect()}
    assert got == want


def test_struct_all_null_struct_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)],
        "id long, s struct<a:long, b:string>",
    )
    dec = decode_table(encode_table(df, num_partitions=1), df.schema)
    assert {r["id"]: r["s"] for r in dec.collect()} == {1: None, 2: None}


def test_empty_struct_rejected(spark):
    df = spark.createDataFrame([(1, ())], "id long, s struct<>")
    with pytest.raises(TypeError, match="empty struct"):
        encode_table(df, num_partitions=1).collect()


def test_struct_validity_uses_bool_codecs(spark):
    df = _mk_nested(spark, 100)
    chunks = encode_table(df, num_partitions=1)
    defs = footer(chunks).where(F.col("col").endswith("#def"))
    codecs = {r["codec"] for r in defs.select("codec").distinct().collect()}
    assert codecs <= {"bool_plain", "bool_rle"}
