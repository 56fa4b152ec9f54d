"""ANN quality gate: multi-table LSH recall@k against the exact scan.

Single-table single-probe hyperplane LSH had recall ~0.03-0.2 on the
driver embeddings — useless. The multi-table union (standard LSH
amplification) is the recall dial; this pins the floor at the contract
query's configuration so a regression in bucketing/seeding is caught.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pysparkenc import similarity as sim

SF_DIR = "/root/testdata/sf0.01"


def _recall(spark, planes: int, tables: int, k: int = 5, n_q: int = 20) -> float:
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < n_q)
    truth: dict[int, set[int]] = {}
    for r in sim.cosine_topk(emb, q, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict[int, set[int]] = {}
    for r in sim.ann_lsh_topk(emb, q, k=k, planes=planes, tables=tables).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(qid, set()) & v) for qid, v in truth.items())
    return hits / sum(len(v) for v in truth.values())


def test_multi_table_recall_floor(spark):
    # the contract query's configuration (q_ann_lsh_topk); measured 0.86
    # measured 0.86 (deterministic inputs); floor at measured-margin
    assert _recall(spark, planes=4, tables=16) >= 0.80


def test_tables_monotonically_add_candidates(spark):
    """More tables can only add candidates, never remove them — recall is
    monotone in expectation; pin a strict improvement over one table."""
    r1 = _recall(spark, planes=4, tables=1)
    r8 = _recall(spark, planes=4, tables=8)
    assert r8 >= r1


def _ivf_recall(spark, n_centroids: int, n_probe: int, k: int = 5,
                n_q: int = 20) -> float:
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < n_q)
    truth: dict[int, set[int]] = {}
    for r in sim.cosine_topk(emb, q, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict[int, set[int]] = {}
    for r in sim.ann_ivf_topk(emb, q, k=k, n_centroids=n_centroids,
                              n_probe=n_probe).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(qid, set()) & v) for qid, v in truth.items())
    return hits / sum(len(v) for v in truth.values())


def test_ivf_recall_floor(spark):
    # the contract query's configuration (q_ann_ivf_topk); measured 0.87
    # measured 0.87 (deterministic inputs); floor at measured-margin
    assert _ivf_recall(spark, n_centroids=32, n_probe=12) >= 0.80


def test_ivf_probe_widens_recall(spark):
    """Probing more cells can only widen each query's candidate set."""
    r2 = _ivf_recall(spark, n_centroids=32, n_probe=2)
    r8 = _ivf_recall(spark, n_centroids=32, n_probe=8)
    assert r8 >= r2


def test_ivf_centroids_deterministic(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = sim._ivf_centroids(emb, "vec_id", "embedding", 16, 64)
    b = sim._ivf_centroids(emb, "vec_id", "embedding", 16, 64)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
