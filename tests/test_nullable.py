"""Nullable-column round-trips: the Spark-side re-expression of the
reference's definition-level machinery (datastore/column.go:136-142 — a
def-level below max means NULL). Flat columns carry a `{col}#def` validity
chunk through the boolean codecs; values are compacted to non-nulls."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pysparkenc.engine import (
    decode_table,
    encode_table,
    footer,
    output_schema_of_chunks,
)


def _roundtrip_map(spark, df, key, num_partitions=4, **kw):
    chunks = encode_table(df, num_partitions=num_partitions, **kw)
    dec = decode_table(chunks, df.schema)
    cols = [c for c in df.columns if c != key]
    want = {r[key]: tuple(r[c] for c in cols) for r in df.collect()}
    got = {r[key]: tuple(r[c] for c in cols) for r in dec.collect()}
    return want, got, chunks


def test_nullable_every_flat_type(spark):
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                None if i % 3 == 0 else f"s{i % 17}",
                None if i % 5 == 0 else i * 11,
                None if i % 7 == 0 else float(i) / 3.0,
                None if i % 2 == 0 else (i % 4 == 0),
            )
        )
    df = spark.createDataFrame(
        rows, "id long, s string, x long, f double, b boolean"
    )
    want, got, chunks = _roundtrip_map(spark, df, "id")
    assert got == want

    # the validity chunks are real rows with the boolean codecs
    defs = footer(chunks).where(F.col("col").endswith("#def"))
    assert defs.count() > 0
    codecs = {r["codec"] for r in defs.select("codec").distinct().collect()}
    assert codecs <= {"bool_plain", "bool_rle"}

    # null_count is threaded through the value chunk metadata
    nc = (
        footer(chunks)
        .where(F.col("col") == "s")
        .agg(F.sum("null_count").alias("nc"))
        .collect()[0]["nc"]
    )
    assert nc == sum(1 for i in range(200) if i % 3 == 0)


def test_nullable_schema_recovery(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, None), (3, "c", 7)],
        "id long, s string, x long",
    )
    chunks = encode_table(df, num_partitions=1)
    rec = output_schema_of_chunks(chunks)
    by_name = {f.name: f for f in rec.fields}
    assert not by_name["id"].nullable
    assert by_name["s"].nullable and by_name["x"].nullable
    got = {r["id"]: (r["s"], r["x"]) for r in decode_table(chunks).collect()}
    assert got == {1: ("a", 5), 2: (None, None), 3: ("c", 7)}


def test_nullable_lists_and_all_null(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3], None), (2, None, None), (3, [], None), (4, [9], None)],
        "id long, xs array<int>, dead string",
    )
    chunks = encode_table(df, num_partitions=1)
    got = {
        r["id"]: (r["xs"], r["dead"])
        for r in decode_table(chunks, df.schema).collect()
    }
    assert got == {
        1: ([1, 2, 3], None),
        2: (None, None),
        3: ([], None),
        4: ([9], None),
    }


def test_nullable_floats_with_nan(spark):
    """NaN and NULL are distinct and both survive the round-trip."""
    rows = [(1, float("nan")), (2, None), (3, 2.5)]
    df = spark.createDataFrame(rows, "id long, x double")
    dec = decode_table(encode_table(df, num_partitions=1), df.schema)
    got = {r["id"]: r["x"] for r in dec.collect()}
    assert math.isnan(got[1]) and got[2] is None and got[3] == 2.5


def test_nullable_with_block_compression(spark):
    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else "x" * (i % 50)) for i in range(500)],
        "id long, s string",
    )
    chunks = encode_table(df, num_partitions=2, compression="gzip")
    got = {r["id"]: r["s"] for r in decode_table(chunks, df.schema).collect()}
    want = {r["id"]: r["s"] for r in df.collect()}
    assert got == want


def test_nullable_partition_key(spark):
    """A nullable leading partition key must neither raise nor drop rows."""
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"src{i % 2}", i * 2) for i in range(60)],
        "id long, src string, x long",
    )
    chunks = encode_table(df, partition_by=("src", "id"), num_partitions=4)
    dec = decode_table(chunks, df.schema)
    assert dec.count() == 60
    got = {r["id"]: (r["src"], r["x"]) for r in dec.collect()}
    want = {r["id"]: (r["src"], r["x"]) for r in df.collect()}
    assert got == want
