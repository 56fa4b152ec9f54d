"""Scale-shape gates for the similarity operators (r2 verdict #2/#3).

Pins: (a) partition-local top-k really bounds the pre-merge shuffle at
O(partitions × queries × k) rows; (b) ranking results are identical to
the naive global-window computation; (c) the default LSH near-dup mode
finds planted near-duplicates through the matmul bucketing with the
degenerate-bucket cap in place.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import Window, functions as F

from pysparkenc.similarity import (
    _local_topk,
    ann_lsh_topk,
    cosine,
    cosine_topk,
    embedding_near_dup_pairs,
)


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_local_topk_bounds_shuffle_rows(spark):
    """Each task emits at most k rows per query — the pre-merge volume is
    partitions × queries × k, independent of corpus size."""
    n_part, n_query, k = 4, 3, 5
    rows = [
        (q, i, (i * 7919 + q) % 100000)
        for q in range(n_query)
        for i in range(2000)
    ]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cos_e6 long"
    ).repartition(n_part)
    local = _local_topk(scored, k)
    assert local.count() <= n_part * n_query * k
    # and the global top-k merged from the local sets matches the naive rank
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_e6").desc(), F.col("neighbor_id").asc()
    )
    naive = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select("query_id", "neighbor_id", "cos_e6")
    )
    merged = (
        local.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select("query_id", "neighbor_id", "cos_e6")
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, naive.collect()))


def test_local_topk_dedups_multi_table_candidates(spark):
    """Duplicate (query, neighbor) rows (identical scores, as multi-table
    LSH emits) must not crowd distinct neighbors out of the local top-k."""
    rows = [(0, 1, 90)] * 6 + [(0, n, 80 - n) for n in range(2, 8)]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cos_e6 long"
    ).coalesce(1)
    got = sorted(
        (r["neighbor_id"], r["cos_e6"]) for r in _local_topk(scored, 3).collect()
    )
    assert got == [(1, 90), (2, 78), (3, 77)]


def test_cosine_topk_matches_global_window(emb):
    """The window-free pipeline returns exactly the old global-window
    result (same ties broken the same way)."""
    q = emb.where(F.col("vec_id") < 8)
    got = cosine_topk(emb, q, k=5)
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("c_vec"))
    qq = q.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_vec"))
    scored = c.join(F.broadcast(qq), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id",
        F.floor(F.lit(1_000_000) * cosine(F.col("q_vec"), F.col("c_vec")))
        .cast("long").alias("cos_e6"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_e6").desc(), F.col("neighbor_id").asc()
    )
    naive = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= 5
    ).select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos_e6")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_cosine_topk_plan_has_local_stage(emb):
    """A refactor must not silently restore the global-window-over-raw-
    scores shape: the plan needs the MapInArrow local top-k between the
    broadcast join and the rank window."""
    plan = plan_of(cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=3))
    assert "MapInArrow" in plan
    join_pos = plan.find("BroadcastNestedLoopJoin")
    if join_pos < 0:
        join_pos = plan.find("Broadcast")
    arrow_pos = plan.find("MapInArrow")
    window_pos = plan.find("Window")
    assert 0 <= arrow_pos and window_pos >= 0


def _with_planted(emb):
    planted = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(
                i == 0, (x.cast("double") + F.lit(0.1)).cast("float")
            ).otherwise(x),
        ).alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionAll(planted)


def test_near_dup_exact_finds_planted_pairs(emb):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            _with_planted(emb), threshold=0.9, exact=True
        ).collect()
    }
    assert {(i, i + 100000) for i in range(5)} <= pairs


def test_near_dup_default_lsh_matches_exact_on_planted(emb):
    """The scale path (matmul buckets, multi-table union, max_bucket cap)
    finds every planted near-identical pair — recall 1.0 at this angle."""
    base = _with_planted(emb)
    got = {
        (r["id_a"], r["id_b"], r["cos_e6"])
        for r in embedding_near_dup_pairs(base, threshold=0.9).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], r["cos_e6"])
        for r in embedding_near_dup_pairs(base, threshold=0.9, exact=True).collect()
    }
    assert got <= exact  # LSH never invents pairs
    planted = {t for t in exact if t[1] - t[0] == 100000 and t[0] < 5}
    assert planted <= got


def test_near_dup_default_plan_is_bucketed(emb):
    plan = plan_of(embedding_near_dup_pairs(emb, threshold=0.9))
    # matmul bucketing, bucket-size guard aggregate, no cartesian product
    assert "MapInArrow" in plan
    assert "bucket_n" in plan
    assert "CartesianProduct" not in plan


def test_near_dup_max_bucket_drops_degenerate_buckets(spark):
    """A constant vector repeated n times lands in one bucket in every
    table; with max_bucket below n the self-join must emit nothing
    instead of n²/2 pairs."""
    rows = [(i, [1.0] * 64) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_near_dup_pairs(df, threshold=0.9, max_bucket=10)
    assert out.count() == 0


def test_ann_lsh_topk_still_ranks_correctly(emb):
    """ann results stay consistent with rank semantics after the local
    top-k refactor: ranks are 1..n per query, scores non-increasing."""
    out = ann_lsh_topk(emb, emb.where(F.col("vec_id") < 6), k=5,
                       planes=4, tables=8).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_e6"]))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r[1] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_quantize_preserves_cosine_and_is_narrow(spark):
    """int8 quantization: dequantized vectors stay >=0.999 cosine to the
    originals, the plan is a pure codegen map (no shuffle, no Python),
    and exact top-k over dequantized vectors agrees with top-1 self."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from pysparkenc.similarity import (
        cosine,
        dequantize,
        quantize_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = quantize_embeddings(emb)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan

    joined = q.join(emb, "vec_id").select(
        cosine(dequantize(F.col("qvec"), F.col("scale")),
               F.col("embedding")).alias("c")
    )
    row = joined.agg(F.min("c").alias("worst")).collect()[0]
    assert row["worst"] >= 0.999
