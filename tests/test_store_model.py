"""Model-based test of the lineage store's table-maintenance surface.

Random interleavings of append / delete / upsert / compact / expire run
against both the real store and a plain Python dict model of
"key -> current row"; after every scenario the visible table must equal
the model exactly. This is the property the whole Iceberg-shaped layer
promises: whatever the operation history, readers see one current row
per live key.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pysparkenc.lineage import (
    compact_store,
    delete_rows,
    encode_with_lineage,
    expire_runs,
    read_lineage,
    read_store,
    upsert_rows,
    vacuum_store,
)


def _mk_rows(spark, items):
    return spark.createDataFrame(
        [(k, v) for k, v in items], "k string, v long"
    )


def _run_scenario(spark, store, seed):
    rng = random.Random(seed)
    model: dict[str, int] = {}
    next_id = 0

    def fresh(n):
        nonlocal next_id
        out = [f"k{seed}-{next_id + i}" for i in range(n)]
        next_id += n
        return out

    # always start with an append so every op has something to act on.
    # ds_append drives the SECOND write path (df.write.format) and
    # vacuum the r5 orphan reclaim — both must compose with everything
    # else in any order
    ops = ["append"] + [
        rng.choice(["append", "delete", "upsert", "compact", "expire",
                    "ds_append", "vacuum"])
        for _ in range(rng.randrange(4, 7))
    ]
    snapshots: list[tuple[int, dict[str, int], bool]] = []
    for op in ops:
        if op == "append":
            items = [(k, rng.randrange(1000)) for k in fresh(rng.randrange(3, 9))]
            m = encode_with_lineage(_mk_rows(spark, items), store,
                                    num_partitions=2, resume=False)
            model.update(items)
            snapshots.append((m["run_id"], dict(model), False))
        elif op == "delete" and model:
            victims = rng.sample(sorted(model), min(len(model),
                                                    rng.randrange(1, 4)))
            d = delete_rows(spark, store,
                            _mk_rows(spark, [(k, 0) for k in victims])
                            .select("k"), key_cols=("k",))
            for k in victims:
                del model[k]
            snapshots.append((d["run_id"], dict(model), False))
        elif op == "upsert" and model:
            upd = rng.sample(sorted(model), min(len(model), 2))
            items = [(k, rng.randrange(1000)) for k in upd]
            items += [(k, rng.randrange(1000)) for k in fresh(2)]
            u = upsert_rows(spark, store, _mk_rows(spark, items),
                            key_cols=("k",), num_partitions=1)
            model.update(items)
            snapshots.append((u["append_run"], dict(model), False))
        elif op == "compact" and model:
            c = compact_store(spark, store, num_partitions=2)
            snapshots.append((c["run_id"], dict(model), False))
        elif op == "ds_append":
            from pysparkenc.datasource import register

            register(spark)
            items = [(k, rng.randrange(1000))
                     for k in fresh(rng.randrange(2, 6))]
            (_mk_rows(spark, items).repartition(1)
             .write.format("pysparkenc").mode("append").save(store))
            model.update(items)
            run_id = int(
                read_lineage(spark, store)
                .agg(F.max("run_id").alias("m")).collect()[0]["m"]
            )
            snapshots.append((run_id, dict(model), False))
        elif op == "vacuum":
            # grace 0: anything uncommitted is reclaimable NOW; visible
            # results must be identical before and after
            vacuum_store(spark, store, grace_sec=0.0)
        elif op == "expire":
            expire_runs(spark, store)
            # time travel to runs superseded by a compaction stops
            # working once expire removes their chunk dirs — snapshots
            # taken BEFORE this point become unverifiable
            snapshots = [(r, m, True) for r, m, _ in snapshots]

    got = {r["k"]: r["v"] for r in read_store(spark, store).collect()}
    assert got == model, (seed, ops)

    # the data source read path must agree with read_store on the SAME
    # maintained store, whatever the op history (the r4 seam)
    from pysparkenc.datasource import register

    register(spark)
    ds = {r["k"]: r["v"]
          for r in spark.read.format("pysparkenc").load(store).collect()}
    assert ds == model, (seed, ops)

    # time travel: every commit boundary must reproduce the model as it
    # was then (skip snapshots taken before an expire pass — their
    # chunk files may be gone by design)
    live = [(r, m) for r, m, dead in snapshots if not dead]
    for run_id, snap in rng.sample(live, min(2, len(live))):
        at = {
            r["k"]: r["v"]
            for r in read_store(spark, store, as_of_run=run_id).collect()
        }
        assert at == snap, (seed, ops, run_id)


@pytest.mark.parametrize("seed", range(5))
def test_random_op_interleavings_match_model(spark, tmp_path, seed):
    _run_scenario(spark, str(tmp_path / f"store{seed}"), seed)
