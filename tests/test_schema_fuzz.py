"""Random-schema roundtrip fuzz for the recursive shredder.

The reference shreds arbitrary schema trees (schema/column.go:259-304,
reassembly datastore/column.go:127-177); this pins the same generality
here: seeded random nested schemas (struct/array/map over mixed scalar
leaves, nullable at every level) -> random data with nulls at every
level -> encode_table/decode_table -> exact Python-side comparison.

Seeds are fixed so failures reproduce; one Spark session serves all
schemas to keep runtime bounded.
"""

from __future__ import annotations

import datetime
import random
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from pysparkenc.engine import decode_table, encode_table

_LEAVES = [
    T.IntegerType(),
    T.LongType(),
    T.DoubleType(),
    T.StringType(),
    T.BooleanType(),
    T.DateType(),
    T.BinaryType(),
    T.DecimalType(12, 2),
    T.DecimalType(30, 4),
]


def _rand_type(rng: random.Random, depth: int) -> T.DataType:
    if depth <= 0 or rng.random() < 0.45:
        return rng.choice(_LEAVES)
    kind = rng.choice(["struct", "array", "map"])
    if kind == "struct":
        n = rng.randint(1, 3)
        return T.StructType(
            [
                T.StructField(f"f{i}", _rand_type(rng, depth - 1), True)
                for i in range(n)
            ]
        )
    if kind == "array":
        return T.ArrayType(_rand_type(rng, depth - 1), containsNull=True)
    return T.MapType(T.StringType(), _rand_type(rng, depth - 1),
                     valueContainsNull=True)


def _rand_value(rng: random.Random, dt: T.DataType, null_p: float = 0.15):
    if rng.random() < null_p:
        return None
    if isinstance(dt, T.IntegerType):
        return rng.randint(-(2**31), 2**31 - 1)
    if isinstance(dt, T.LongType):
        return rng.randint(-(2**63), 2**63 - 1)
    if isinstance(dt, T.DoubleType):
        # avoid NaN (NaN != NaN breaks exact comparison); keep inf + subnorms
        return rng.choice(
            [0.0, -0.0, 1e-300, -1e308, float("inf"), rng.random() * 1e6]
        )
    if isinstance(dt, T.StringType):
        n = rng.randint(0, 12)
        return "".join(rng.choice("abé中 xyz0") for _ in range(n))
    if isinstance(dt, T.BooleanType):
        return rng.random() < 0.5
    if isinstance(dt, T.DateType):
        return datetime.date(1970, 1, 1) + datetime.timedelta(
            days=rng.randint(-20000, 20000)
        )
    if isinstance(dt, T.BinaryType):
        return bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 10)))
    if isinstance(dt, T.DecimalType):
        unscaled = rng.randint(-(10**dt.precision) + 1, 10**dt.precision - 1)
        return Decimal(unscaled).scaleb(-dt.scale)
    if isinstance(dt, T.StructType):
        # struct value itself may be null (handled above); fields recurse
        return tuple(_rand_value(rng, f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return [
            _rand_value(rng, dt.elementType)
            for _ in range(rng.randint(0, 4))
        ]
    if isinstance(dt, T.MapType):
        return {
            f"k{i}": _rand_value(rng, dt.valueType)
            for i in range(rng.randint(0, 3))
        }
    raise AssertionError(dt)


def _canon(v):
    """Normalize for comparison: Row -> tuple, bytearray -> bytes,
    -0.0 -> 0.0 (IEEE equality already treats them equal; dict order of
    maps is not guaranteed by Spark, so compare sorted items)."""
    from pyspark.sql import Row

    if isinstance(v, Row):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


@pytest.mark.parametrize("seed", [11, 23, 37, 51, 68, 79])
def test_random_schema_roundtrip(spark, seed):
    rng = random.Random(seed)
    n_cols = rng.randint(1, 3)
    schema = T.StructType(
        [T.StructField("rid", T.LongType(), False)]
        + [
            T.StructField(f"c{i}", _rand_type(rng, 3), True)
            for i in range(n_cols)
        ]
    )
    rows = [
        tuple([i] + [_rand_value(rng, f.dataType) for f in schema.fields[1:]])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, schema)
    chunks = encode_table(df, partition_by=None, num_partitions=3)
    back = decode_table(chunks, df.schema)
    want = {r["rid"]: _canon(tuple(r)) for r in df.collect()}
    got = {r["rid"]: _canon(tuple(r)) for r in back.collect()}
    assert got == want, f"schema={schema.simpleString()}"
