"""distinct_values: exact DISTINCT answered from dictionary pages.

The decisive test nulls out the dict chunks' code-stream payloads and
still gets the right answer — proof the fast path reads footer
metadata + aux dict pages only.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkenc.engine import distinct_values, encode_table


def _vals(df, col):
    return sorted(
        (r[col] for r in df.collect()),
        key=lambda v: (v is None, str(v)),
    )


def test_distinct_string_from_dict_pages_only(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_returnflag", "l_linestatus"
    )
    chunks = encode_table(df, partition_by=("l_returnflag", "l_orderkey"),
                          num_partitions=4)
    chunks.cache().count()
    try:
        for col in ("l_returnflag", "l_linestatus"):
            want = _vals(df.select(col).distinct(), col)
            got = _vals(distinct_values(chunks, col, df.schema), col)
            assert got == want
        # the proof: blank the CODE STREAM of every dict chunk — the
        # answer must not change (dict pages live in aux, not data)
        blanked = chunks.withColumn(
            "data",
            F.when(F.col("codec") == "dict_rle",
                   F.lit(None).cast("binary")).otherwise(F.col("data")),
        )
        got = _vals(distinct_values(blanked, "l_returnflag", df.schema),
                    "l_returnflag")
        assert got == _vals(df.select("l_returnflag").distinct(),
                            "l_returnflag")
    finally:
        chunks.unpersist()


def test_distinct_mixed_codecs_union(spark):
    """Some partitions dict-encode (low cardinality), others don't
    (unique-ish values): the union of dict pages + fallback decode must
    equal the full distinct set."""
    df = spark.sql("""
        SELECT id,
          CASE WHEN id < 5000 THEN concat('low-', id % 7)
               ELSE concat('high-', id) END AS v,
          CAST(id < 5000 AS INT) AS part
        FROM range(10000)
    """)
    chunks = encode_table(df, part_id_col="part", num_partitions=2)
    chunks.cache().count()
    try:
        codecs = {
            r["codec"]
            for r in chunks.where(F.col("col") == "v")
            .select("codec").distinct().collect()
        }
        assert "dict_rle" in codecs and len(codecs) > 1  # genuinely mixed
        want = _vals(df.select("v").distinct(), "v")
        got = _vals(distinct_values(chunks, "v", df.schema), "v")
        assert got == want
    finally:
        chunks.unpersist()


def test_distinct_includes_null_and_converted_types(spark):
    df = spark.sql("""
        SELECT id,
          CASE WHEN id % 10 = 0 THEN NULL
               ELSE concat('s', id % 5) END AS s,
          CAST(CAST(id % 4 AS DECIMAL(10,2)) / 4 AS DECIMAL(10,2)) AS d,
          timestamp_micros((id % 3) * 1000000) AS ts
        FROM range(2000)
    """)
    chunks = encode_table(df, num_partitions=2)
    chunks.cache().count()
    try:
        for col in ("s", "d", "ts"):
            want = _vals(df.select(col).distinct(), col)
            got = _vals(distinct_values(chunks, col, df.schema), col)
            assert got == want, col
        # NULL present exactly once
        s_vals = distinct_values(chunks, "s", df.schema).collect()
        assert sum(1 for r in s_vals if r["s"] is None) == 1
    finally:
        chunks.unpersist()


def test_distinct_rejects_nested(spark):
    df = spark.sql(
        "SELECT id, array(id, id + 1) AS arr FROM range(10)"
    )
    chunks = encode_table(df, num_partitions=1)
    with pytest.raises(TypeError, match="flat scalar"):
        distinct_values(chunks, "arr", df.schema)


def test_distinct_schema_evolution_null(spark, tmp_path):
    """Chunk groups written before the column existed decode as NULL —
    the fast path must contribute that NULL too (it has no chunk rows
    for the column in those groups at all)."""
    from pysparkenc.lineage import encode_with_lineage, read_committed_chunks

    store = str(tmp_path / "store")
    old = spark.sql("SELECT id FROM range(100)")
    encode_with_lineage(old, store, num_partitions=1)
    new = spark.sql(
        "SELECT id, concat('v', id % 3) AS tag FROM range(100, 200)"
    )
    encode_with_lineage(new, store, num_partitions=1, resume=False)
    chunks = read_committed_chunks(spark, store)
    got = _vals(distinct_values(chunks, "tag"), "tag")
    assert got == ["v0", "v1", "v2", None] or got[-1] is None
    assert None in got and {"v0", "v1", "v2"} <= set(v for v in got if v)


def test_stats_distinct_bad_column_exit2(spark, tmp_path, capsys):
    import json as _json

    from pysparkenc.cli import main
    from pysparkenc.synth import make_tokens_table

    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    make_tokens_table(spark, 50, seed=61).write.parquet(src)
    assert main(["encode", "--input", src, "--output", enc]) == 0
    capsys.readouterr()
    assert main(["stats", "--input", enc, "--distinct", "nope"]) == 2
    err = capsys.readouterr().err.strip().splitlines()[-1]
    assert "error" in _json.loads(err)
    # nested column: tokens is array<int> -> TypeError path
    assert main(["stats", "--input", enc, "--distinct", "tokens"]) == 2
