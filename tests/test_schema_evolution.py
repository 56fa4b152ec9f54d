"""Schema evolution on decode: chunk groups written before a column
existed read as typed nulls (the parquet/iceberg reader contract), and a
projection of ONLY the evolved column still returns every row — old
groups ride on a payload-free anchor chunk for their row count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pysparkenc.engine import decode_table, encode_table


@pytest.fixture(scope="module")
def evolved(spark):
    old = spark.range(300).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("name"),
    )
    new = spark.range(300, 500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("name"),
        (F.col("id") * 2).cast("int").alias("score"),
        F.array(F.col("id").cast("int")).alias("tags"),
    )
    # two independent encode jobs appended into one store: disjoint
    # part_id ranges, exactly what lineage/datasource appends produce
    c_old = encode_table(old, rows_per_chunk=128, partition_by=None)
    c_new = encode_table(new, rows_per_chunk=128, partition_by=None)
    c_new = c_new.withColumn("part_id", F.col("part_id") + 1000)
    evolved_schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("name", StringType(), False),
            StructField("score", IntegerType(), True),
            StructField("tags", ArrayType(IntegerType(), False), True),
        ]
    )
    merged = c_old.unionByName(c_new, allowMissingColumns=True).persist()
    merged.count()
    yield merged, evolved_schema
    merged.unpersist()


def test_old_groups_read_evolved_columns_as_nulls(spark, evolved):
    merged, schema = evolved
    out = decode_table(merged, schema)
    assert out.count() == 500
    assert out.where(F.col("score").isNull()).count() == 300
    assert out.where(F.col("tags").isNull()).count() == 300
    # new rows carry real values
    row = out.where(F.col("k") == 400).first()
    assert row.score == 800 and list(row.tags) == [400]
    # pre-existing columns are intact across both eras
    assert out.where(F.col("name") == "v7").count() == 1


def test_projection_of_only_evolved_column_keeps_all_rows(spark, evolved):
    merged, schema = evolved
    proj = StructType([StructField("score", IntegerType(), True)])
    out = decode_table(merged, proj)
    assert out.count() == 500  # anchor carries the 300 pre-evolution rows
    assert out.where(F.col("score").isNull()).count() == 300
    assert out.agg(F.sum("score")).first()[0] == sum(
        2 * k for k in range(300, 500)
    )


def test_evolved_struct_subtree_reads_null(spark):
    old = spark.range(100).select(F.col("id").alias("k"))
    new = spark.range(100, 150).select(
        F.col("id").alias("k"),
        F.struct(
            F.col("id").cast("int").alias("a"),
            F.lit("x").alias("b"),
        ).alias("meta"),
    )
    c = encode_table(old, partition_by=None).unionByName(
        encode_table(new, partition_by=None).withColumn(
            "part_id", F.col("part_id") + 1000
        ),
        allowMissingColumns=True,
    )
    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("a", IntegerType(), True),
                        StructField("b", StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    out = decode_table(c, schema)
    assert out.count() == 150
    assert out.where(F.col("meta").isNull()).count() == 100
    assert out.where(F.col("k") == 120).first().meta.a == 120


# ---------------------------------------------------------------------------
# WRITE-side evolution through encode_with_lineage (r5)
# ---------------------------------------------------------------------------

def test_lineage_append_adds_column_and_records_schemas(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from pysparkenc.lineage import (
        encode_with_lineage,
        read_store,
        run_schemas,
    )
    from pysparkenc.synth import make_tokens_table

    store = str(tmp_path / "store")
    df = make_tokens_table(spark, 60, seed=31)
    old = df.where(F.col("n_tok") % 2 == 0)
    new = df.where(F.col("n_tok") % 2 == 1).withColumn(
        "quality", (F.col("n_tok") * 2).cast("int")
    )
    encode_with_lineage(old, store, num_partitions=2)
    encode_with_lineage(new, store, num_partitions=2, resume=False)
    # union schema derived from chunk metadata; old rows carry nulls
    got = read_store(spark, store)
    assert "quality" in got.columns
    assert got.count() == 60
    assert got.where(F.col("quality").isNull()).count() == old.count()
    exp = old.withColumn("quality", F.lit(None).cast("int")).unionByName(new)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # per-run schema records
    rs = run_schemas(store)
    assert set(rs) == {1, 2}
    assert "quality" not in [f.name for f in rs[1].fields]
    assert "quality" in [f.name for f in rs[2].fields]
    # a type CHANGE on a shared column is refused before any write
    bad = df.withColumn("n_tok", F.col("n_tok").cast("double"))
    with pytest.raises(TypeError, match="cannot change"):
        encode_with_lineage(bad, store, num_partitions=1, resume=False)


def test_lineage_append_may_omit_columns(spark, tmp_path):
    """A later run may also DROP a column: its groups decode the
    missing column as typed nulls under the union schema, same anchor
    rule as adding."""
    from pyspark.sql import functions as F

    from pysparkenc.lineage import encode_with_lineage, read_store
    from pysparkenc.synth import make_tokens_table

    store = str(tmp_path / "store")
    df = make_tokens_table(spark, 40, seed=33)
    encode_with_lineage(df, store, num_partitions=2)
    narrow = make_tokens_table(spark, 10, seed=34).withColumn(
        "doc_id", F.concat(F.lit("n-"), F.col("doc_id"))
    ).drop("source")
    encode_with_lineage(narrow, store, num_partitions=1, resume=False)
    got = read_store(spark, store)
    assert got.count() == 50
    assert got.where(F.col("source").isNull()).count() == 10


# -------------------------------------------------------------- r5 fixes


def test_disjoint_column_runs_recover_nullable_schema(spark, tmp_path):
    """Two runs with FULLY DISJOINT column sets: schema recovery must
    mark BOTH columns nullable. The old per-column-max group count
    declared whichever column had the most groups non-nullable, and
    Catalyst then folded `b IS NULL` to false — silently wrong reads."""
    from pysparkenc.datasource import register
    from pysparkenc.lineage import encode_with_lineage, read_store

    path = str(tmp_path / "disjoint")
    encode_with_lineage(
        spark.range(10).select(F.col("id").alias("a")), path,
        num_partitions=2,
    )
    encode_with_lineage(
        spark.range(5).select((F.col("id") * 100).alias("b")), path,
        num_partitions=2, resume=False,
    )
    out = read_store(spark, path)
    assert {f.name: f.nullable for f in out.schema.fields} == {
        "a": True, "b": True,
    }
    assert out.count() == 15
    assert out.where(F.col("b").isNull()).count() == 10
    assert out.where(F.col("a").isNull()).count() == 5

    register(spark)
    ds = spark.read.format("pysparkenc").load(path)
    assert {f.name: f.nullable for f in ds.schema.fields} == {
        "a": True, "b": True,
    }
    assert ds.count() == 15
    assert ds.where(F.col("b").isNull()).count() == 10


def test_assemble_schema_exact_group_total():
    from pysparkenc.engine import assemble_schema_from_meta

    meta = [
        {"col": "a", "logical": "int64", "nc": 0, "ng": 5},
        {"col": "b", "logical": "int64", "nc": 0, "ng": 8},
    ]
    s = assemble_schema_from_meta(meta, total_groups=13)
    assert [(f.name, f.nullable) for f in s.fields] == [
        ("a", True), ("b", True),
    ]
    # when every group carries every column, non-nullable survives
    meta2 = [
        {"col": "a", "logical": "int64", "nc": 0, "ng": 8},
        {"col": "b", "logical": "int64", "nc": 0, "ng": 8},
    ]
    s2 = assemble_schema_from_meta(meta2, total_groups=8)
    assert [(f.name, f.nullable) for f in s2.fields] == [
        ("a", False), ("b", False),
    ]


def test_datasource_explicit_late_column_schema_keeps_old_rows(
    spark, tmp_path
):
    """Reading an evolved lineage store through the data source with an
    explicit schema of ONLY the late column must still return every
    row (old groups as nulls) — the anchor rule, mirrored from
    decode_table into the data source's per-file parquet filter."""
    from pysparkenc.datasource import register
    from pysparkenc.lineage import encode_with_lineage

    path = str(tmp_path / "late")
    encode_with_lineage(
        spark.range(10).select(F.col("id").alias("doc_id")), path,
        num_partitions=2,
    )
    encode_with_lineage(
        spark.range(5).select(
            (F.col("id") + 100).alias("doc_id"),
            (F.col("id") * 2).alias("quality"),
        ),
        path, num_partitions=2, resume=False,
    )
    register(spark)
    ds = spark.read.format("pysparkenc").schema("quality long").load(path)
    assert ds.count() == 15
    assert ds.where(F.col("quality").isNull()).count() == 10
    got = sorted(
        r["quality"] for r in ds.where(F.col("quality").isNotNull()).collect()
    )
    assert got == [0, 2, 4, 6, 8]
