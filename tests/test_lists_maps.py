"""Generalized list + map encoding.

Lists take any element type — scalars (string/binary/bool/date/decimal/
timestamp as well as numerics) and, via the recursive shredder, structs,
lists, and maps — with nullable elements (`{col}#item#def` validity
chunk). Maps shred to `{col}` (entry counts, logical map<k,v>) plus
`{col}#key` / `{col}#val` subtrees — the same recursive chunk grammar as
struct leaves."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from pysparkenc.engine import (
    decode_table,
    encode_table,
    footer,
    output_schema_of_chunks,
)


def _rt(spark, df, key="id", num_partitions=2, **kw):
    chunks = encode_table(df, num_partitions=num_partitions, **kw)
    dec = decode_table(chunks, df.schema)
    cols = [c for c in df.columns if c != key]
    want = {r[key]: tuple(r[c] for c in cols) for r in df.collect()}
    got = {r[key]: tuple(r[c] for c in cols) for r in dec.collect()}
    return want, got, chunks


def test_list_null_elements_roundtrip_exactly(spark):
    """[1, None, 3] used to silently become float NaN via to_numpy."""
    df = spark.createDataFrame(
        [(1, [1, None, 3]), (2, [None]), (3, []), (4, None), (5, [7, 8])],
        "id long, xs array<int>",
    )
    want, got, chunks = _rt(spark, df, num_partitions=1)
    assert got == want
    cols = {r["col"] for r in chunks.select("col").distinct().collect()}
    assert "xs#item#def" in cols  # element-validity chunk exists


def test_list_of_strings_and_binary(spark):
    rows = [
        (i, [f"word{j}-{i % 7}" for j in range(i % 5)],
         [str(j).encode() * 3 for j in range(i % 3)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, ws array<string>, bs array<binary>")
    want, got, _ = _rt(spark, df)
    assert got == want


def test_list_of_logical_scalars(spark):
    rows = [
        (
            i,
            [dt.date(2022, 1, 1) + dt.timedelta(days=j) for j in range(i % 4)],
            [Decimal(j * 7) / 100 for j in range(i % 3)],
            [i % 2 == 0, None, True][: i % 4],
        )
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "id long, ds array<date>, ps array<decimal(10,2)>, bs array<boolean>"
    )
    want, got, _ = _rt(spark, df)
    assert got == want


def test_map_roundtrip_with_null_values_and_rows(spark):
    rows = []
    for i in range(150):
        m = (
            None
            if i % 9 == 0
            else {f"k{j}": (None if j % 3 == 0 else j * 1.5) for j in range(i % 4)}
        )
        rows.append((i, m))
    df = spark.createDataFrame(rows, "id long, m map<string,double>")
    want, got, chunks = _rt(spark, df)
    assert got == want
    cols = {r["col"] for r in chunks.select("col").distinct().collect()}
    assert {"m", "m#key", "m#val", "m#val#def", "m#def"} <= cols


def test_map_decimal_keys_parse(spark):
    """decimal(p,s) keys exercise the paren-aware map logical parser."""
    df = spark.createDataFrame(
        [(1, {Decimal("1.50"): "a", Decimal("2.25"): "b"}), (2, {})],
        "id long, m map<decimal(10,2),string>",
    )
    want, got, chunks = _rt(spark, df, num_partitions=1)
    assert got == want
    lg = chunks.where(F.col("col") == "m").select("logical").first()["logical"]
    assert lg == "map<decimal(10,2),string>"


def test_map_schema_recovery(spark):
    df = spark.createDataFrame(
        [(1, {"a": 2}), (2, None)], "id long, m map<string,long>"
    )
    chunks = encode_table(df, num_partitions=1)
    rec = output_schema_of_chunks(chunks)
    assert rec["m"].dataType.simpleString() == "map<string,bigint>"
    got = {r["id"]: r["m"] for r in decode_table(chunks).collect()}
    assert got == {1: {"a": 2}, 2: None}


def test_map_inside_struct(spark):
    df = spark.createDataFrame(
        [(1, ({"x": 1}, [5, None]))],
        "id long, s struct<m:map<string,int>, xs:array<int>>",
    )
    want, got, _ = _rt(spark, df, num_partitions=1)
    assert got == want


def test_unsupported_type_rejected_eagerly(spark):
    """Schema validation happens on the driver before any job runs."""
    df = spark.createDataFrame([], "id long, v void")
    with pytest.raises(TypeError, match="unsupported column type"):
        encode_table(df, num_partitions=1)


def test_all_map_table_partitions_without_hash(spark):
    """The hash-partition fallback must not try xxhash64 over MAP columns."""
    df = spark.createDataFrame(
        [({"a": i},) for i in range(40)], "m map<string,long>"
    )
    dec = decode_table(encode_table(df, num_partitions=3), df.schema)
    assert sorted(r["m"]["a"] for r in dec.collect()) == list(range(40))


def test_string_list_values_use_byte_codecs(spark):
    """Flattened string elements ride the byte-array codec suite."""
    df = spark.createDataFrame(
        [(i, [f"tok{j % 11}" for j in range(40)]) for i in range(100)],
        "id long, ws array<string>",
    )
    chunks = encode_table(df, num_partitions=1)
    meta = footer(chunks).where(F.col("col") == "ws#item").collect()
    assert all(
        r["codec"] in ("ba_plain", "ba_delta_len", "ba_delta", "dict_rle", "fsst")
        for r in meta
    )
    # heavy duplication -> the dictionary should win
    assert any(r["codec"] == "dict_rle" for r in meta)


def test_empty_table_with_new_types_roundtrips(spark):
    """0-row tables with struct/map/date/decimal columns must encode to
    zero chunk rows and decode back empty with the right schema."""
    import datetime as dt  # noqa: F401

    df = spark.createDataFrame(
        [],
        "id long, s struct<a:int,b:string>, m map<string,double>, "
        "d date, p decimal(10,2), ws array<string>",
    )
    chunks = encode_table(df, num_partitions=2)
    dec = decode_table(chunks, df.schema)
    assert dec.count() == 0
    assert dec.schema == df.schema


def test_single_row_with_new_types(spark):
    from decimal import Decimal as D
    import datetime as dt

    row = (1, (2, "x"), {"k": 1.5}, dt.date(2024, 1, 1), D("9.99"), ["a", None])
    df = spark.createDataFrame(
        [row],
        "id long, s struct<a:int,b:string>, m map<string,double>, "
        "d date, p decimal(10,2), ws array<string>",
    )
    got = decode_table(encode_table(df, num_partitions=1), df.schema).collect()[0]
    assert (got["id"], got["s"], got["m"], got["d"], got["p"], got["ws"]) == row


def test_rows_per_chunk_slicing_all_types(spark):
    """Sub-batch page slicing (rows_per_chunk) must round-trip every type
    through non-zero Arrow slice offsets: structs, maps, lists with null
    elements, decimals, dates, strings."""
    from decimal import Decimal as D
    import datetime as dt

    rows = []
    for i in range(300):
        rows.append((
            i,
            None if i % 7 == 0 else (i % 5, f"s{i%11}"),
            {f"k{j}": (None if j % 2 else float(j)) for j in range(i % 3)},
            [j if j % 3 else None for j in range(i % 4)],
            dt.date(2020, 1, 1) + dt.timedelta(days=i),
            D(i) / 100,
            f"txt-{i:05d}",
        ))
    df = spark.createDataFrame(
        rows,
        "id long, s struct<a:int,b:string>, m map<string,double>, "
        "xs array<int>, d date, p decimal(10,2), t string",
    )
    chunks = encode_table(df, num_partitions=1, rows_per_chunk=64)
    n_groups = chunks.select("part_id", "chunk_id").distinct().count()
    assert n_groups >= 300 // 64  # slicing actually happened
    got = {r["id"]: r for r in decode_table(chunks, df.schema).collect()}
    for r in df.collect():
        g = got[r["id"]]
        assert (g["s"], g["m"], g["xs"], g["d"], g["p"], g["t"]) == (
            r["s"], r["m"], r["xs"], r["d"], r["p"], r["t"])
