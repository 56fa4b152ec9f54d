"""Dictionary-page predicate pushdown (prune_chunks_equals): an equality
probe tested against each chunk's dict page drops groups whose dictionary
provably lacks the value — strictly stronger than min/max overlap (the
reference's stats-only SkipRowGroup, file-reader.go:110-112, cannot do
this because its dict pages are decode-internal)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pysparkenc.engine import (
    decode_table_where_equals,
    encode_table,
    prune_chunks_equals,
)


def _langs_df(spark):
    # 4 single-lang partitions; lang is low-cardinality -> dict_rle
    rows = [(i, ["de", "en", "fr", "pt"][i // 250], i % 97) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, lang string, v long")


def test_dict_probe_drops_non_matching_groups(spark):
    # page-scale granularity: the striped plan spreads every lang across
    # every partition (balance), auto-clustering then makes each PAGE
    # lang-homogeneous — pruning drops page groups, not partitions
    df = _langs_df(spark)
    chunks = encode_table(
        df, partition_by=("lang", "id"), rows_per_chunk=64
    ).persist()
    chunks.count()
    lang_codecs = {
        r["codec"]
        for r in chunks.where(F.col("col") == "lang").select("codec").collect()
    }
    assert "dict_rle" in lang_codecs  # the probe's target codec is in play
    kept = prune_chunks_equals(chunks, "lang", "de")

    def groups(c):
        return {(r["part_id"], r["chunk_id"])
                for r in c.select("part_id", "chunk_id").distinct().collect()}

    assert len(groups(kept)) < len(groups(chunks))  # groups actually dropped
    chunks.unpersist()


def test_dict_probe_beats_stats_between_min_and_max(spark):
    """A probe value lexicographically inside [smin, smax] but absent
    from the dictionary: min/max overlap keeps the chunk, the dict page
    proves it away."""
    df = spark.createDataFrame(
        [(i, ["apple", "zebra"][i % 2]) for i in range(500)],
        "id long, w string",
    )
    chunks = encode_table(df, num_partitions=1).persist()
    chunks.count()
    assert {
        r["codec"]
        for r in chunks.where(F.col("col") == "w").select("codec").collect()
    } == {"dict_rle"}
    # "mango" is within [apple, zebra] -> stats alone cannot prune
    assert prune_chunks_equals(chunks, "w", "mango").count() == 0
    assert prune_chunks_equals(chunks, "w", "zebra").count() > 0
    chunks.unpersist()


def test_equals_decode_exact_rows(spark):
    df = _langs_df(spark)
    chunks = encode_table(df, partition_by=("lang", "id")).persist()
    chunks.count()
    got = decode_table_where_equals(chunks, df.schema, "lang", "fr")
    want = df.where(F.col("lang") == "fr")
    assert {r["id"] for r in got.collect()} == {r["id"] for r in want.collect()}
    chunks.unpersist()


def test_numeric_equals_falls_back_to_stats(spark):
    """Numeric columns: dict page probed when dict_rle, stat overlap
    otherwise — either way no matching row is ever lost."""
    df = spark.createDataFrame(
        [(i, i // 100) for i in range(1000)], "id long, bucket long"
    )
    chunks = encode_table(df, partition_by=("bucket", "id")).persist()
    chunks.count()
    got = decode_table_where_equals(chunks, df.schema, "bucket", 7)
    assert {r["id"] for r in got.collect()} == set(range(700, 800))
    # and a value outside every chunk's range prunes everything
    assert prune_chunks_equals(chunks, "bucket", 99).count() == 0
    chunks.unpersist()


def test_forced_plain_never_misprunes(spark):
    """With the probe column forced away from dict_rle the probe must
    keep chunks on stats alone — equality decode stays exact."""
    df = _langs_df(spark)
    chunks = encode_table(
        df, partition_by=("lang", "id"), codec={"lang": "ba_plain"}
    ).persist()
    chunks.count()
    got = decode_table_where_equals(chunks, df.schema, "lang", "pt")
    assert got.count() == 250
    chunks.unpersist()


def test_isin_probe_prunes_and_decodes_exact(spark):
    from pysparkenc.engine import decode_table_where_isin, prune_chunks_isin

    df = _langs_df(spark)
    chunks = encode_table(
        df, partition_by=("lang", "id"), rows_per_chunk=64
    ).persist()
    chunks.count()
    kept = prune_chunks_isin(chunks, "lang", ["de", "fr"])
    kept_groups = {(r["part_id"], r["chunk_id"]) for r in
                   kept.select("part_id", "chunk_id").distinct().collect()}
    all_groups = {(r["part_id"], r["chunk_id"]) for r in
                  chunks.select("part_id", "chunk_id").distinct().collect()}
    assert len(kept_groups) < len(all_groups)
    got = decode_table_where_isin(chunks, df.schema, "lang", ["de", "fr"])
    want = df.where(F.col("lang").isin("de", "fr"))
    assert {r["id"] for r in got.collect()} == {r["id"] for r in want.collect()}
    chunks.unpersist()


def test_isin_numeric_and_validation(spark):
    import pytest

    from pysparkenc.engine import decode_table_where_isin, prune_chunks_isin

    df = spark.createDataFrame(
        [(i, i // 100) for i in range(1000)], "id long, bucket long"
    )
    chunks = encode_table(df, partition_by=("bucket", "id")).persist()
    chunks.count()
    got = decode_table_where_isin(chunks, df.schema, "bucket", [2, 7])
    assert {r["id"] for r in got.collect()} == set(range(200, 300)) | set(
        range(700, 800)
    )
    assert prune_chunks_isin(chunks, "bucket", [50, 99]).count() == 0
    with pytest.raises(ValueError):
        prune_chunks_isin(chunks, "bucket", [])
    with pytest.raises(TypeError):
        prune_chunks_isin(chunks, "bucket", [1, "x"])
    chunks.unpersist()
