"""Physical-plan quality gates (the 100 TB design checks, asserted).

Each test pins a property that keeps the plan scalable: column pruning
reaching the parquet scan, predicate pushdown, broadcast joins for small
sides, map-side partial aggregation, whole-stage codegen in the text hot
path, and single evaluation of the expensive md5 array in MinHash. If a
refactor silently loses one of these, the suite fails before the bench
does.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_column_pruning_reaches_scan(docs):
    from pysparkenc.textops import token_count

    plan = plan_of(token_count(docs))
    # the scan must read ONLY doc_id and text, not lang/source/n_chars
    assert "ReadSchema" in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read
    assert "n_chars" not in read and "source" not in read


def test_predicate_pushdown_reaches_scan(emb):
    plan = plan_of(emb.where(F.col("vec_id") < 10).select("vec_id"))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "LessThan(vec_id,10)" in pushed


def test_partition_plan_join_is_broadcast(spark):
    from pysparkenc.engine import plan_partitions
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 200, seed=2)
    plan = plan_of(plan_partitions(df, ("source", "doc_id"), 8))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_exact_dedup_has_partial_aggregation(docs):
    from pysparkenc.dedup import exact_dedup

    plan = plan_of(exact_dedup(docs), "simple")
    # two HashAggregates around the exchange = map-side partial agg:
    # only (hash, min_id, count) rows cross the wire, never the text
    assert plan.count("HashAggregate") >= 2
    assert "partial_min" in plan and "partial_count" in plan
    # the shuffle key is the md5 grouping expression, not the text column
    exch = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l][0]
    assert "text#" not in exch


def test_text_hot_path_is_whole_stage_codegen(docs):
    from pysparkenc.textops import quality_score

    plan = plan_of(quality_score(docs), "simple")
    # codegen stages print as "*(n)" in simple mode
    assert "*(1)" in plan
    # no Python evaluation anywhere in the text pipeline
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_md5_computed_once(docs):
    from pysparkenc.dedup import minhash_signature

    plan = plan_of(minhash_signature(docs, k=8), "simple")
    # the hashed-shingle array must appear as ONE md5 evaluation feeding
    # all k signature columns (the 20x regression this guards against
    # inlined it k times)
    assert plan.count("md5") == 1


def test_cosine_topk_broadcasts_queries(emb):
    from pysparkenc.similarity import cosine_topk

    plan = plan_of(cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=3))
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_cosine_topk_rank_is_partition_local_first(emb):
    # VERDICT r2 wrong-#2 regression gate: the global window must rank the
    # MapInArrow partition-local top-k survivors (O(parts x queries x k)
    # rows), never the raw |corpus| x |queries| scored pairs. The physical
    # plan prints top-down, so the Window node must sit ABOVE the
    # MapInArrow reducer that feeds it.
    from pysparkenc.similarity import cosine_topk

    plan = plan_of(cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=3))
    assert "MapInArrow" in plan and "Window" in plan
    assert plan.index("Window") < plan.index("MapInArrow")
    assert "BatchEvalPython" not in plan


def test_ann_lsh_join_is_bucket_equi_join(emb):
    from pysparkenc.similarity import ann_lsh_topk

    plan = plan_of(ann_lsh_topk(emb, emb.where(F.col("vec_id") < 5), k=3,
                                planes=4, tables=4))
    # (table, bucket)-key equi-join with the small query side broadcast:
    # corpus is never replicated beyond the tables× bucketing pass,
    # candidates stay bucket-local; bucket ids come from one Arrow-batch
    # matmul (MapInArrow), never a per-row Python loop
    assert "BroadcastHashJoin" in plan and "MapInArrow" in plan
    assert "NestedLoop" not in plan and "BatchEvalPython" not in plan


def test_encode_pipeline_single_python_stage(spark):
    from pysparkenc.engine import encode_table
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 200, seed=3)
    plan = plan_of(encode_table(df, partition_by=("source", "doc_id"),
                                num_partitions=4), "simple")
    # exactly two Arrow-batched Python stages EXECUTE: the synthetic
    # generator and the codec kernels; the partition plan is served from
    # the persisted counts cache (whose InMemoryRelation printout repeats
    # the generator subtree without re-executing it) and stays JVM-side
    executed = plan.split("InMemoryRelation")[0]
    assert executed.count("MapInArrow") == 2
    assert "BatchEvalPython" not in plan
    # the distributed partition plan: window prefix-sum, broadcast join
    assert "Window" in plan and "BroadcastHashJoin" in plan


def test_decode_groups_without_sort(spark):
    from pysparkenc.engine import decode_table, encode_table
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 200, seed=3)
    chunks = encode_table(df, partition_by=("source", "doc_id"),
                          num_partitions=4)
    plan = plan_of(decode_table(chunks, df.schema), "simple")
    # applyInArrow group decode adds exactly one shuffle, keyed on the
    # (part_id, page-group) key — pages_per_group batches ~32 pages of a
    # partition into one Python call, so the shuffle key is coarser than
    # chunk_id but still partition-local
    group_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning(part_id" in l and "__pg" in l
    ]
    assert len(group_exchanges) == 1


def test_decode_projection_pushes_chunk_filter(spark, tmp_path):
    """decode_table with a projected schema filters the chunk scan to the
    needed chunks BEFORE the group shuffle; on a parquet-backed chunk
    table the In(col, ...) predicate reaches the scan."""
    from pyspark.sql.types import StructType

    from pysparkenc.engine import decode_table, encode_table
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 300, seed=5)
    path = str(tmp_path / "chunks")
    encode_table(df, num_partitions=2).write.parquet(path)
    chunks = spark.read.parquet(path)

    proj = StructType([df.schema["doc_id"], df.schema["n_tok"]])
    out = decode_table(chunks, proj)
    plan = plan_of(out, "formatted")
    assert "PushedFilters" in plan and "col" in plan
    # and the result is the correct 2-column projection
    got = {r["doc_id"]: r["n_tok"] for r in out.collect()}
    want = {r["doc_id"]: r["n_tok"] for r in df.collect()}
    assert got == want


def test_ann_ivf_join_is_cell_equi_join(emb):
    from pysparkenc.similarity import ann_ivf_topk

    plan = plan_of(ann_ivf_topk(emb, emb.where(F.col("vec_id") < 5), k=3,
                                n_centroids=8, n_probe=2))
    # cell-key equi-join with the small probe side broadcast; cell ids
    # come from one BLAS matmul per Arrow batch (MapInArrow), and the
    # rank runs over partition-local top-k survivors
    assert "BroadcastHashJoin" in plan and "MapInArrow" in plan
    assert "NestedLoop" not in plan and "BatchEvalPython" not in plan


def test_pack_sequences_plan_is_jvm_only_two_shuffles(spark):
    from pysparkenc.pipeline import pack_sequences
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 500, seed=7)
    # strict single-stream mode: ONE shuffle total — the window's
    # hashpartitioning(source) already clusters the (source, seq_id)
    # assembly groupBy, so Catalyst elides the second exchange
    plan = plan_of(pack_sequences(df, 128, shards=None))
    # zero Python in the data path (MapInArrow is the synth generator)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    tree = [ln for ln in plan.splitlines()
            if ln.lstrip().startswith(("+-", ":-", "Adaptive", "*("))]
    assert sum("Exchange" in ln for ln in tree) == 1, plan
    # partial + final aggregation pair for the fragment assembly
    assert sum("ObjectHashAggregate" in ln for ln in tree) == 2, plan


def test_pack_sequences_auto_shard_plan_costs_one_tiny_shuffle(spark):
    """Default auto-sharding adds exactly (a) a partial-agg shuffle of
    per-(partition, group) token COUNTS — bytes per group, never token
    bytes — and (b) a broadcast of the per-group totals back onto the
    stream. The token bytes still cross exactly ONE hash exchange (the
    window's), now keyed (group, pack_shard) so a hot group fans out."""
    from pysparkenc.pipeline import pack_sequences
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 500, seed=7)
    plan = plan_of(pack_sequences(df, 128))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # totals join is broadcast, never a sort-merge of the token stream
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    tree = [ln for ln in plan.splitlines()
            if ln.lstrip().startswith(("+-", ":-", "Adaptive", "*("))]
    # window exchange + totals-agg exchange + broadcast exchange
    assert sum("Exchange" in ln for ln in tree) == 3, plan
    # the window sort runs per (source, pack_shard), not per source
    assert "pack_shard" in plan


def test_stratified_sample_is_narrow_codegen_filter(docs):
    from pysparkenc.pipeline import stratified_sample

    plan = plan_of(stratified_sample(docs, {"src0": 500_000},
                                     default_ppm=100_000), "simple")
    assert "Exchange" not in plan  # pure filter, no shuffle
    assert "BatchEvalPython" not in plan
    assert "*(1)" in plan  # whole-stage codegen


def test_aggregate_pushdown_never_touches_payload(spark, tmp_path):
    """aggregate_chunks answers from footer stats: on a parquet-backed
    chunk store the scan must prune the binary payload columns entirely
    and the plan must contain no Arrow/Python stage."""
    from pysparkenc.engine import aggregate_chunks, encode_table
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 400, seed=3).select("doc_id", "n_tok")
    encode_table(df, num_partitions=4).write.parquet(str(tmp_path / "c"))
    chunks = spark.read.parquet(str(tmp_path / "c"))
    agg = aggregate_chunks(chunks, ["n_tok"])
    plan = plan_of(agg)
    assert "MapInArrow" not in plan and "ApplyInArrow" not in plan
    assert "BatchEvalPython" not in plan
    # column pruning reached the scan: no payload bytes are read
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "data" not in read_schema[0]
    assert "aux" not in read_schema[0]


def test_token_freq_topk_rank_is_shard_local_first(docs):
    """The final per-group rank must run AFTER a (group, shard)-local
    top-k (two windows in the plan) so no reducer ever materializes a
    group's whole distinct vocabulary — with an open hashed vocab the
    single-window plan is a one-reducer-per-group job at scale."""
    from pysparkenc.textops import token_freq_topk

    plan = plan_of(token_freq_topk(docs, 10, shards=8))
    n_windows = plan.count("Window")
    assert n_windows >= 2, plan
    # the shard column participates in the first window's partitioning
    assert "__shard" in plan
    # and the global rank filter still caps the output
    assert "rank" in plan


def test_token_freq_topk_matches_single_window(docs):
    """Losslessness of the shard-local pre-reduction: identical output
    to the naive single-window global rank (the SQL oracle's shape)."""
    from pyspark.sql import Window

    from pysparkenc.textops import token_freq_topk, words

    got = {
        (r["source"], r["rank"]): (r["token"], r["cnt"])
        for r in token_freq_topk(docs, 7, shards=5).collect()
    }
    counts = (
        docs.select("source", F.explode(words(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    want = {
        (r["source"], r["rank"]): (r["token"], r["cnt"])
        for r in counts.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).where(F.col("rank") <= 7).collect()
    }
    assert got == want


def test_delete_anti_join_is_broadcast(spark, tmp_path):
    """Equality-delete application must plan as a BROADCAST anti-join
    for small delete sets (takedown lists vs billions of rows): the key
    files are tiny parquet, so Catalyst's size estimate — or AQE at
    runtime — must not fall back to a shuffled join, and the run-
    sequencing condition must ride the join without degrading it to a
    cartesian/BNLJ over the data side."""
    from pysparkenc.lineage import (
        delete_rows,
        encode_with_lineage,
        read_store,
    )
    from pysparkenc.synth import make_tokens_table

    store = str(tmp_path / "store")
    df = make_tokens_table(spark, 150, seed=23)
    encode_with_lineage(df, store, num_partitions=2)
    delete_rows(spark, store, df.limit(4).select("doc_id"))
    plan = plan_of(read_store(spark, store))
    assert "BroadcastExchange" in plan
    # the anti-join must not plan as a nested-loop over the DATA side
    assert "CartesianProduct" not in plan
