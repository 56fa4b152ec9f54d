"""Repeated-group nesting (the reference's full Dremel tree,
schema/column.go:259-304 / datastore/column.go:127-177) and wide
DECIMAL(p>18) — the r2 verdict's top-two coverage gaps.

Every case drives the whole engine: recursive shredding to chunk rows,
codec auto-selection per leaf stream, decode reassembly, exact equality.
"""

from __future__ import annotations

import datetime as dte
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from pysparkenc.engine import (
    decode_table,
    encode_table,
    output_schema_of_chunks,
)


def _rt(spark, df, key="id", num_partitions=2, **kw):
    chunks = encode_table(df, num_partitions=num_partitions, **kw)
    dec = decode_table(chunks, df.schema)
    cols = [c for c in df.columns if c != key]
    want = {r[key]: tuple(r[c] for c in cols) for r in df.collect()}
    got = {r[key]: tuple(r[c] for c in cols) for r in dec.collect()}
    return want, got, chunks


def test_array_of_struct_roundtrip(spark):
    """The #1 user-visible r2 gap: spans: array<struct<start,end,label>>."""
    rows = []
    for i in range(200):
        if i % 11 == 0:
            spans = None
        else:
            spans = [
                None
                if j % 5 == 4
                else (j, j + i, None if j % 3 == 0 else f"lab{j % 7}")
                for j in range(i % 6)
            ]
        rows.append((i, spans))
    df = spark.createDataFrame(
        rows, "id long, spans array<struct<start:int,end:int,label:string>>"
    )
    want, got, chunks = _rt(spark, df)
    assert got == want
    cols = {r["col"] for r in chunks.select("col").distinct().collect()}
    # lengths at the list path, element struct validity, dotted leaves
    assert {"spans", "spans#item#def", "spans#item.start",
            "spans#item.end", "spans#item.label"} <= cols


def test_array_of_array_roundtrip(spark):
    rows = []
    for i in range(150):
        if i % 13 == 0:
            m = None
        else:
            m = [
                None if j % 4 == 3
                else [None if k % 5 == 2 else k * j for k in range(j % 4)]
                for j in range(i % 5)
            ]
        rows.append((i, m))
    df = spark.createDataFrame(rows, "id long, m array<array<int>>")
    want, got, chunks = _rt(spark, df)
    assert got == want
    cols = {r["col"] for r in chunks.select("col").distinct().collect()}
    # two nested length chunks over one flat int stream
    assert {"m", "m#item", "m#item#item"} <= cols


def test_map_with_nested_values(spark):
    rows = []
    for i in range(120):
        m = {
            f"k{j}": (None if j % 3 == 2 else list(range(j % 4)))
            for j in range(i % 4)
        }
        rows.append((i, m if i % 9 else None))
    df = spark.createDataFrame(rows, "id long, m map<string,array<int>>")
    want, got, _ = _rt(spark, df)
    assert got == want


def test_deep_mixed_nesting(spark):
    """struct<tags:array<string>, kids:array<struct<v:int, ws:array<int>>>>
    — three levels of repetition/definition interleaved."""
    rows = []
    for i in range(100):
        if i % 10 == 0:
            s = None
        else:
            kids = [
                None if j % 6 == 5
                else (j * i, [k for k in range(j % 3)])
                for j in range(i % 4)
            ]
            s = ([f"t{i % 5}", None][: i % 3], kids)
        rows.append((i, s))
    df = spark.createDataFrame(
        rows,
        "id long, s struct<tags:array<string>,"
        "kids:array<struct<v:int,ws:array<int>>>>",
    )
    want, got, _ = _rt(spark, df)
    assert got == want


def test_array_of_map(spark):
    rows = [
        (i, [{f"k{j}": float(j)} if j % 2 else None for j in range(i % 3)])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "id long, ms array<map<string,double>>")
    want, got, _ = _rt(spark, df)
    assert got == want


def test_nested_schema_recovery(spark):
    df = spark.createDataFrame(
        [(1, [(2, "x")], [[1], None], {"k": [1, 2]})],
        "id long, sp array<struct<a:int,b:string>>, "
        "mm array<array<int>>, mv map<string,array<int>>",
    )
    chunks = encode_table(df, num_partitions=1)
    rec = output_schema_of_chunks(chunks)
    assert rec["sp"].dataType.simpleString() == "array<struct<a:int,b:string>>"
    assert rec["mm"].dataType.simpleString() == "array<array<int>>"
    assert rec["mv"].dataType.simpleString() == "map<string,array<int>>"
    got = decode_table(chunks).collect()[0]
    assert got["sp"] == [(2, "x")] and got["mm"] == [[1], None]
    assert got["mv"] == {"k": [1, 2]}


def test_nested_paged_slicing(spark):
    """rows_per_chunk page slicing through non-zero Arrow offsets on
    repeated groups."""
    rows = [
        (i, [(j, [f"w{k}" for k in range(j % 3)]) for j in range(i % 5)])
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "id long, xs array<struct<n:int,ws:array<string>>>"
    )
    chunks = encode_table(df, num_partitions=1, rows_per_chunk=64)
    got = {r["id"]: r["xs"] for r in decode_table(chunks, df.schema).collect()}
    for r in df.collect():
        assert got[r["id"]] == r["xs"]


def test_nested_projection_pushdown(spark):
    """Decoding only the nested column filters the chunk scan to its
    subtree chunk names."""
    from pyspark.sql.types import StructType

    df = spark.createDataFrame(
        [(i, f"pad{i}" * 50, [(i, f"l{i}")]) for i in range(50)],
        "id long, pad string, sp array<struct<a:int,b:string>>",
    )
    chunks = encode_table(df, num_partitions=1)
    proj = StructType([df.schema["id"], df.schema["sp"]])
    out = decode_table(chunks, proj)
    got = {r["id"]: r["sp"] for r in out.collect()}
    assert got == {r["id"]: r["sp"] for r in df.collect()}


# ---------------------------------------------------------------------------
# DECIMAL(p > 18): 16-byte FLBA-backed decimal128
# ---------------------------------------------------------------------------

def test_wide_decimal_roundtrip(spark):
    rows = []
    for i in range(300):
        v = (
            None
            if i % 17 == 0
            else Decimal(i * 10**25 + i * i) / Decimal(10**4) * (-1 if i % 2 else 1)
        )
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, p decimal(38,4)")
    want, got, chunks = _rt(spark, df)
    assert got == want
    codecs = {
        r["codec"]
        for r in chunks.where(F.col("col") == "p").select("codec").collect()
    }
    # equal 16-byte widths: the selector lands on the zero-offset fixed
    # codec (or dict on tiny duplicate-heavy pages)
    assert codecs <= {"ba_fixed", "dict_rle"}


def test_wide_decimal_extremes(spark):
    s = str(10**38 - 1)
    big = Decimal(s[:-2] + "." + s[-2:])  # 36 integer digits, 2 fractional
    df = spark.createDataFrame(
        [(1, big), (2, big.copy_negate()), (3, Decimal(0)), (4, None)],
        "id long, p decimal(38,2)",
    )
    want, got, _ = _rt(spark, df, num_partitions=1)
    assert got == want


def test_wide_decimal_in_nested(spark):
    rows = [
        (i, [Decimal(i * 10**20 + j) / 100 for j in range(i % 4)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, ps array<decimal(30,2)>")
    want, got, _ = _rt(spark, df, num_partitions=1)
    assert got == want


def test_decimal_precision_boundary(spark):
    """p=18 stays int64-backed, p=19 switches to the FLBA path; both
    round-trip."""
    rows = [
        (i, Decimal(i * 10**14) / 100, Decimal(i * 10**15) / 100)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, a decimal(18,2), b decimal(19,2)")
    want, got, chunks = _rt(spark, df, num_partitions=1)
    assert got == want
    dtypes = {
        r["col"]: r["dtype"]
        for r in chunks.select("col", "dtype").distinct().collect()
    }
    assert dtypes["a"] == "int64" and dtypes["b"] == "bytes"
