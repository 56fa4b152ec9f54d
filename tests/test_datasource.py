"""The ``pysparkenc`` Spark data source: write/read/schema-inference/
filter-pushdown through ``spark.read.format("pysparkenc")``."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    StringStartsWith,
)

from pysparkenc.datasource import (
    ChunkStoreReader,
    _list_chunk_files,
    register,
)


@pytest.fixture(autouse=True)
def _registered(spark):
    register(spark)


def _mixed_df(spark):
    return spark.sql(
        """
        SELECT id,
               IF(id % 7 = 0, NULL, concat('doc-', id)) AS name,
               cast(id * 1.5 AS double) AS score,
               array(id, id + 1) AS xs,
               named_struct('a', id, 'b', concat('s', id)) AS st,
               map('k', id) AS m
        FROM range(3000)
        """
    ).repartition(3)


def test_write_read_roundtrip(spark, tmp_path):
    store = str(tmp_path / "store")
    df = _mixed_df(spark)
    df.write.format("pysparkenc").mode("overwrite").save(store)
    back = spark.read.format("pysparkenc").load(store)
    assert back.schema == df.schema  # inferred from _pysparkenc_schema.json
    o = {r["id"]: r.asDict(True) for r in df.collect()}
    b = {r["id"]: r.asDict(True) for r in back.collect()}
    assert b == o


def test_filters_are_reapplied_correctly(spark, tmp_path):
    store = str(tmp_path / "store")
    _mixed_df(spark).write.format("pysparkenc").mode("overwrite").save(store)
    back = spark.read.format("pysparkenc").load(store)
    assert back.where("id >= 100 and id < 250").count() == 150
    assert back.where(F.col("name") == "doc-123").count() == 1
    assert back.where("name is not null").count() == 3000 - len(
        range(0, 3000, 7)
    )
    assert back.where(F.col("name").startswith("doc-29")).count() == len(
        [i for i in range(3000) if i % 7 and str(i).startswith("29")]
    )
    assert back.where(F.col("id").isin(5, 6, 2999, 99999)).count() == 3


def test_repeated_group_roundtrip(spark, tmp_path):
    """Repeated-group nesting (array<struct>, array<array>) must survive
    the data source unchanged — the store reuses the engine's recursive
    shredder, but the writer/reader glue slices and regroups its own
    batches, so pin it end-to-end here too."""
    store = str(tmp_path / "store")
    df = spark.sql(
        """
        SELECT id,
               IF(id % 5 = 0, NULL,
                  array(named_struct('s', id, 'w', concat('w', id)),
                        named_struct('s', id + 1,
                                     'w', IF(id % 3 = 0, NULL, 'x')))
               ) AS spans,
               array(array(id, id + 1), array(), array(id * 2)) AS mat
        FROM range(2000)
        """
    ).repartition(2)
    df.write.format("pysparkenc").mode("overwrite").save(store)
    back = spark.read.format("pysparkenc").load(store)
    assert back.schema == df.schema
    o = {r["id"]: r.asDict(True) for r in df.collect()}
    b = {r["id"]: r.asDict(True) for r in back.collect()}
    assert b == o


def test_overwrite_replaces_previous_store(spark, tmp_path):
    store = str(tmp_path / "store")
    spark.range(100).write.format("pysparkenc").mode("overwrite").save(store)
    spark.range(40).write.format("pysparkenc").mode("overwrite").save(store)
    assert spark.read.format("pysparkenc").load(store).count() == 40


def test_append_accumulates_and_checks_schema(spark, tmp_path):
    store = str(tmp_path / "store")
    spark.range(100).write.format("pysparkenc").mode("append").save(store)
    spark.range(50).write.format("pysparkenc").mode("append").save(store)
    assert spark.read.format("pysparkenc").load(store).count() == 150
    with pytest.raises(Exception, match="does not match"):
        spark.sql("SELECT id, 'x' AS extra FROM range(5)").write.format(
            "pysparkenc"
        ).mode("append").save(store)


def test_empty_store_reads_empty(spark, tmp_path):
    store = str(tmp_path / "store")
    spark.range(10).limit(0).write.format("pysparkenc").mode("append").save(store)
    back = spark.read.format("pysparkenc").load(store)
    assert back.count() == 0
    assert "id" in back.columns


def test_reader_prunes_page_groups(spark, tmp_path):
    """Pushed predicates must skip whole page groups before decode: a
    selective range on sorted ids decodes a handful of pages, an
    impossible dictionary probe decodes zero."""
    store = str(tmp_path / "store")
    df = (
        spark.sql(
            "SELECT id, concat('cat-', id % 8) AS cat FROM range(100000)"
        )
        .coalesce(1)
        .sortWithinPartitions("id")
    )
    df.write.format("pysparkenc").mode("overwrite").option(
        "rows_per_chunk", "2048"
    ).save(store)
    schema = spark.read.format("pysparkenc").load(store).schema
    files = _list_chunk_files(store)

    def rows_read(filters):
        r = ChunkStoreReader(store, schema)
        if filters:
            r.pushFilters(filters)
        return sum(
            b.num_rows for f in files for b in r.read(InputPartition(f))
        )

    total = rows_read([])
    assert total == 100000
    ranged = rows_read(
        [GreaterThanOrEqual(("id",), 5000), LessThan(("id",), 7000)]
    )
    assert ranged <= 3 * 2048  # only the overlapping pages decode
    assert rows_read([EqualTo(("cat",), "cat-nope")]) == 0  # dict probe
    assert rows_read([In(("cat",), ("cat-1", "cat-nope"))]) == total
    # unknown/unsupported predicate shapes must be ignored, not crash
    assert rows_read([StringStartsWith(("cat",), "cat-")]) == total


def test_unique_file_per_task(spark, tmp_path):
    store = str(tmp_path / "store")
    spark.range(1000).repartition(5).write.format("pysparkenc").mode("append").save(store)
    files = _list_chunk_files(store)
    assert len(files) == 5
    assert len(set(os.path.basename(f) for f in files)) == 5


def test_stream_write_availablenow(spark, tmp_path):
    src, store, ckpt = (str(tmp_path / x) for x in ("src", "store", "ckpt"))
    spark.sql(
        "SELECT id, concat('n-', id) AS name FROM range(2000)"
    ).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema).parquet(src)
        .writeStream.format("pysparkenc")
        .option("path", store)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.format("pysparkenc").load(store)
    o = {r["id"]: r["name"] for r in spark.read.parquet(src).collect()}
    b = {r["id"]: r["name"] for r in back.collect()}
    assert b == o
    staging = tmp_path / "store" / "_staging"
    assert not staging.exists() or not any(staging.iterdir())


def test_stream_commit_is_replay_idempotent(spark, tmp_path):
    """A replayed batch (same batchId) must replace, not duplicate, its
    files — including clearing leftover slots from a wider prior attempt."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pysparkenc.datasource import ChunkStoreStreamWriter, _FileCommit

    store = str(tmp_path / "store")
    schema = spark.range(1).schema
    w = ChunkStoreStreamWriter(store, schema, {}, False)
    chunks = tmp_path / "store" / "chunks"
    staging = tmp_path / "store" / "_staging"
    staging.mkdir(parents=True)

    def stage(n):
        msgs = []
        for i in range(n):
            f = str(staging / f"stage-{i}.parquet")
            pq.write_table(pa.table({"x": [i]}), f)
            msgs.append(_FileCommit((f,)))
        return msgs

    w.commit(stage(3), batchId=7)
    assert len(list(chunks.iterdir())) == 3
    # replay with fewer tasks: slots shrink to 2, the stale third is gone
    w.commit(stage(2), batchId=7)
    names = sorted(p.name for p in chunks.iterdir())
    assert names == [
        "stream-b000000000007-00000.parquet",
        "stream-b000000000007-00001.parquet",
    ]


def test_stream_read_tails_appends(spark, tmp_path):
    """readStream over a chunk store: first micro-batch picks up the
    snapshot, later appends arrive in the next availableNow pass."""
    store, out, ckpt = (str(tmp_path / x) for x in ("store", "out", "ckpt"))
    spark.sql(
        "SELECT id, concat('n-', id) AS name FROM range(1000)"
    ).repartition(2).write.format("pysparkenc").mode("overwrite").save(store)

    def drain():
        q = (
            spark.readStream.format("pysparkenc").load(store)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 1000
    spark.sql(
        "SELECT id, concat('n-', id) AS name FROM range(1000, 1500)"
    ).coalesce(1).write.format("pysparkenc").mode("append").save(store)
    drain()
    got = spark.read.parquet(out)
    o = {
        r["id"]: r["name"]
        for r in spark.read.format("pysparkenc").load(store).collect()
    }
    b = {r["id"]: r["name"] for r in got.collect()}
    assert b == o


def test_reader_bin_packs_small_files_into_partitions(spark, tmp_path):
    """Many tiny chunk files (a streaming-append tail) must NOT cost one
    Python worker round-trip each: partitions() bin-packs them by bytes.
    The scan result is unchanged."""
    from pysparkenc.datasource import ChunkStoreReader, register

    register(spark)
    store = str(tmp_path / "store")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # 12 appends -> many small chunk files
    for i in range(12):
        part = docs.where(F.pmod(F.col("doc_id"), F.lit(12)) == i)
        part.write.format("pysparkenc").mode("append").save(store)
    back = spark.read.format("pysparkenc").load(store)
    assert back.count() == docs.count()
    reader = ChunkStoreReader(store, back.schema)
    from pysparkenc.datasource import _list_chunk_files

    n_files = len(_list_chunk_files(store))
    n_parts = len(reader.partitions())
    assert n_files >= 12
    assert n_parts < n_files  # tiny files actually grouped


# ---------------------------------------------------------------------------
# lineage-managed stores through the data source
# ---------------------------------------------------------------------------

def _lineage_store(spark, tmp_path, n=160, seed=21):
    from pysparkenc.lineage import encode_with_lineage
    from pysparkenc.synth import make_tokens_table

    store = str(tmp_path / "linstore")
    df = make_tokens_table(spark, n, seed=seed)
    encode_with_lineage(df, store, partition_by=("source", "doc_id"),
                        num_partitions=4)
    return store, df


def test_lineage_store_schema_recovery(spark, tmp_path):
    store, df = _lineage_store(spark, tmp_path)
    back = spark.read.format("pysparkenc").load(store)
    assert [f.name for f in back.schema.fields] == df.columns
    assert back.count() == 160


def test_lineage_store_applies_deletes_through_format(spark, tmp_path):
    """The r4 seam: a format() read must agree with read_store on a
    maintained store — committed deletes apply, even when the
    projection drops the key column."""
    from pysparkenc.lineage import delete_rows, read_store

    store, df = _lineage_store(spark, tmp_path)
    victims = df.limit(11).select("doc_id")
    delete_rows(spark, store, victims)
    back = spark.read.format("pysparkenc").load(store)
    exp = read_store(spark, store)
    assert back.count() == 149
    assert back.exceptAll(exp).count() == 0
    assert exp.exceptAll(back).count() == 0
    # projection narrower than the delete keys: doc_id is decoded for
    # the anti-membership filter, then dropped
    narrow = spark.read.format("pysparkenc").load(store).select(
        "source", "n_tok"
    )
    nexp = exp.select("source", "n_tok")
    assert narrow.exceptAll(nexp).count() == 0
    assert nexp.exceptAll(narrow).count() == 0


def test_lineage_store_compacted_unexpired_reads_once(spark, tmp_path):
    """A compacted-but-unexpired store holds BOTH layouts on disk; the
    data source must read exactly the compacted one — never the union
    (double rows), never the stale one."""
    from pysparkenc.lineage import compact_store

    store, df = _lineage_store(spark, tmp_path)
    compact_store(spark, store)
    # both layouts really are on disk
    run_dirs = sorted(
        d for d in os.listdir(os.path.join(store, "chunks"))
        if d.startswith("run_id=")
    )
    assert len(run_dirs) == 2
    back = spark.read.format("pysparkenc").load(store)
    assert back.count() == 160
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0


def test_lineage_store_orphan_run_invisible(spark, tmp_path):
    """Chunk files with no committed lineage row (a crashed encode)
    must not be read through the data source."""
    import shutil

    store, df = _lineage_store(spark, tmp_path)
    # simulate a crash: a full chunk dir for run 99, no lineage rows
    src = os.path.join(store, "chunks", "run_id=1")
    shutil.copytree(src, os.path.join(store, "chunks", "run_id=99"))
    back = spark.read.format("pysparkenc").load(store)
    assert back.count() == 160


def test_lineage_store_as_of_run_option(spark, tmp_path):
    from pysparkenc.lineage import delete_rows

    store, df = _lineage_store(spark, tmp_path)
    delete_rows(spark, store, df.limit(9).select("doc_id"))
    now = spark.read.format("pysparkenc").load(store)
    assert now.count() == 151
    before = (
        spark.read.format("pysparkenc").option("as_of_run", "1").load(store)
    )
    assert before.count() == 160


def test_lineage_store_multicol_delete_keys(spark, tmp_path):
    from pysparkenc.lineage import delete_rows, read_store

    store, df = _lineage_store(spark, tmp_path)
    victims = df.limit(7).select("source", "doc_id")
    delete_rows(spark, store, victims, key_cols=("source", "doc_id"))
    back = spark.read.format("pysparkenc").load(store)
    exp = read_store(spark, store)
    assert back.count() == 153
    assert back.exceptAll(exp).count() == 0
    assert exp.exceptAll(back).count() == 0


def test_lineage_store_write_and_stream_guards(spark, tmp_path):
    """Overwrite and stream I/O on a lineage store refuse with typed
    errors naming the supported path (append commits a real run — see
    the tests below)."""
    from pysparkenc.datasource import ChunkStoreDataSource

    store, df = _lineage_store(spark, tmp_path)
    ds = ChunkStoreDataSource({"path": store})
    with pytest.raises(ValueError, match="lineage-managed"):
        ds.writer(df.schema, overwrite=True)
    with pytest.raises(ValueError, match="lineage-managed"):
        ds.streamReader(df.schema)
    with pytest.raises(ValueError, match="lineage-managed"):
        ds.streamWriter(df.schema, False)


def test_lineage_store_append_commits_a_run(spark, tmp_path):
    """mode('append') on a lineage store IS a lineage commit: a fresh
    run id, chunks under run_id=<r>/, per-partition lineage rows — so
    read_store and the format() read agree, resume/batch machinery sees
    the run, and time travel to before the append still works."""
    from pysparkenc.lineage import read_lineage, read_store
    from pysparkenc.synth import make_tokens_table

    store, df = _lineage_store(spark, tmp_path)  # run 1, 160 rows
    extra = (
        make_tokens_table(spark, 40, seed=77)
        .withColumn("doc_id", F.concat(F.lit("x_"), F.col("doc_id")))
    )
    extra.repartition(2).write.format("pysparkenc").mode("append").save(store)

    # committed as run 2: visible to BOTH read paths, identically
    assert read_store(spark, store).count() == 200
    assert spark.read.format("pysparkenc").load(store).count() == 200
    got = spark.read.format("pysparkenc").load(store)
    exp = read_store(spark, store)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0

    # the lineage rows carry real metrics (rows sum to what was written)
    lin = read_lineage(spark, store).where(
        (F.col("run_id") == 2) & (F.col("status") == "done")
    )
    rows = lin.agg(
        F.sum("n_rows").alias("r"), F.sum("enc_bytes").alias("b")
    ).collect()[0]
    assert rows["r"] == 40 and rows["b"] > 0
    assert lin.count() == 2  # one row per written partition

    # time travel to the pre-append snapshot excludes the new rows
    old = spark.read.format("pysparkenc").option("as_of_run", 1).load(store)
    assert old.count() == 160


def test_lineage_store_append_respects_never_reuse(spark, tmp_path):
    """A format() append allocates PAST orphan debris on disk, exactly
    like encode_with_lineage."""
    import os

    from pysparkenc.lineage import read_store
    from pysparkenc.synth import make_tokens_table

    store, df = _lineage_store(spark, tmp_path)
    os.makedirs(store + "/chunks/run_id=7")  # crashed writer's claim
    extra = make_tokens_table(spark, 10, seed=3).withColumn(
        "doc_id", F.concat(F.lit("y_"), F.col("doc_id"))
    )
    extra.coalesce(1).write.format("pysparkenc").mode("append").save(store)
    assert os.path.isdir(store + "/chunks/run_id=8")
    assert read_store(spark, store).count() == 170


def test_lineage_store_append_evolves_and_rejects_type_change(
    spark, tmp_path
):
    """An appended run may add a column (union schema, typed nulls for
    older runs) but must not change a shared column's logical type —
    the same contract encode_with_lineage enforces."""
    from pysparkenc.lineage import read_store
    from pysparkenc.synth import make_tokens_table

    store, df = _lineage_store(spark, tmp_path)
    extra = (
        make_tokens_table(spark, 20, seed=5)
        .withColumn("doc_id", F.concat(F.lit("z_"), F.col("doc_id")))
        .withColumn("quality", F.lit(0.5))
    )
    extra.coalesce(1).write.format("pysparkenc").mode("append").save(store)
    got = read_store(spark, store)
    assert got.count() == 180
    assert got.where(F.col("quality").isNull()).count() == 160
    assert got.where(F.col("quality") == 0.5).count() == 20

    bad = df.withColumn("n_tok", F.col("n_tok").cast("double"))
    with pytest.raises(Exception, match="schema evolution"):
        bad.write.format("pysparkenc").mode("append").save(store)


def test_lineage_store_append_then_delete_applies(spark, tmp_path):
    """Rows appended through format() are first-class for the
    maintenance surface: equality deletes retract them and compaction
    materializes the result."""
    from pysparkenc.lineage import compact_store, delete_rows, read_store
    from pysparkenc.synth import make_tokens_table

    store, df = _lineage_store(spark, tmp_path)
    extra = make_tokens_table(spark, 30, seed=9).withColumn(
        "doc_id", F.concat(F.lit("w_"), F.col("doc_id"))
    )
    extra.coalesce(1).write.format("pysparkenc").mode("append").save(store)
    victims = extra.limit(10).select("doc_id")
    delete_rows(spark, store, victims)
    assert read_store(spark, store).count() == 180
    compact_store(spark, store, num_partitions=2)
    got = read_store(spark, store)
    assert got.count() == 180
    vic = {r["doc_id"] for r in victims.collect()}
    assert not vic & {r["doc_id"] for r in got.select("doc_id").collect()}


def test_lineage_store_pushed_filters_still_prune(spark, tmp_path):
    """Catalyst pushdown composes with the commit-aware plan: the
    pruned, delete-filtered format() read returns exactly the rows the
    predicate selects."""
    from pysparkenc.lineage import delete_rows, read_store

    store, df = _lineage_store(spark, tmp_path)
    delete_rows(spark, store, df.limit(5).select("doc_id"))
    got = (
        spark.read.format("pysparkenc").load(store)
        .where(F.col("n_tok") >= 40)
        .select("doc_id", "n_tok")
    )
    exp = read_store(spark, store).where(F.col("n_tok") >= 40).select(
        "doc_id", "n_tok"
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_isnull_and_not_isnull_pushdown(spark, tmp_path):
    """IS NULL prunes groups that recorded zero nulls; NOT(IS NULL)
    unwraps to the not-null prune. Both stay correct (Spark re-applies
    the filters) and the translation accepts them."""
    from pysparkenc.datasource import IsNull, Not, _to_pushed

    store = str(tmp_path / "store")
    df = _mixed_df(spark)
    df.write.format("pysparkenc").mode("overwrite").save(store)
    back = spark.read.format("pysparkenc").load(store)
    got_null = back.where(F.col("name").isNull()).select("id")
    exp_null = df.where(F.col("name").isNull()).select("id")
    assert sorted(r[0] for r in got_null.collect()) == sorted(
        r[0] for r in exp_null.collect())
    got_nn = back.where(F.col("name").isNotNull()).count()
    assert got_nn == df.where(F.col("name").isNotNull()).count()
    # translation unit: Not(IsNull) -> notnull, IsNull -> isnull
    pushed = _to_pushed(
        [IsNull(attribute=("name",)), Not(child=IsNull(attribute=("name",)))],
        back.schema,
    )
    assert [(p.col, p.kind) for p in pushed] == [
        ("name", "isnull"), ("name", "notnull")
    ]


# -------------------------------------------------------------- r5 fixes


def test_delete_drop_mask_composite_never_aliases():
    """Multi-column delete keys are matched with a length-prefixed
    composite: injective for ANY value content. A plain joined
    composite let key ('x', 'y<SEP>z') alias live row ('x<SEP>y', 'z')
    and silently drop an undeleted row through the data source while
    read_store (per-column eqNullSafe) kept it."""
    import pyarrow as pa

    from pysparkenc.datasource import _delete_drop_mask

    out = pa.table({"a": ["x\x1fy", "x", "p"], "b": ["z", "y\x1fz", "q"]})
    keys = pa.table({"a": ["x"], "b": ["y\x1fz"]})
    assert _delete_drop_mask(out, keys).to_pylist() == [False, True, False]

    # null-safe tuple match; a real value 'N' never aliases NULL
    out2 = pa.table({
        "a": ["N", None, "x"],
        "b": pa.array(["N", None, "y"], pa.string()),
    })
    keys2 = pa.table({
        "a": pa.array([None], pa.string()),
        "b": pa.array([None], pa.string()),
    })
    assert _delete_drop_mask(out2, keys2).to_pylist() == [False, True, False]

    # numeric key table narrower than the store column: cast-aligned
    out3 = pa.table({"a": pa.array([5, 6], pa.int64()), "b": ["u", "v"]})
    keys3 = pa.table({"a": pa.array([5], pa.int32()), "b": ["u"]})
    assert _delete_drop_mask(out3, keys3).to_pylist() == [True, False]

    # digits/colons INSIDE values cannot shift field boundaries
    out4 = pa.table({"a": ["1", "1:x"], "b": [":x2:ab", "2:ab"]})
    keys4 = pa.table({"a": ["1:x"], "b": ["2:ab"]})
    assert _delete_drop_mask(out4, keys4).to_pylist() == [False, True]

    # binary key columns work without a lossy string cast
    out5 = pa.table({
        "a": pa.array([b"\xff\x00", b"\x00"], pa.binary()),
        "b": ["u", "u"],
    })
    keys5 = pa.table({"a": pa.array([b"\xff\x00"], pa.binary()), "b": ["u"]})
    assert _delete_drop_mask(out5, keys5).to_pylist() == [True, False]

    assert _delete_drop_mask(
        out, pa.table({"a": ["zz"], "b": ["ww"]})
    ) is None


def test_multicol_delete_separator_values_end_to_end(spark, tmp_path):
    """Separator-looking string keys through the FULL path: commit a
    delete whose key values contain \\x1f and colons, then read through
    the data source — only the exact tuple vanishes, and the data
    source agrees with read_store row-for-row."""
    from pysparkenc.datasource import register
    from pysparkenc.lineage import delete_rows, encode_with_lineage, read_store

    path = str(tmp_path / "sep")
    rows = [
        ("x\x1fy", "z", 1),
        ("x", "y\x1fz", 2),
        ("1", ":x2:ab", 3),
        ("1:x", "2:ab", 4),
    ]
    df = spark.createDataFrame(rows, "a string, b string, v int")
    encode_with_lineage(df, path, num_partitions=2)
    delete_rows(
        spark, path,
        spark.createDataFrame([("x", "y\x1fz"), ("1:x", "2:ab")],
                              "a string, b string"),
        key_cols=("a", "b"),
    )
    register(spark)
    ds = spark.read.format("pysparkenc").load(path)
    assert sorted(r["v"] for r in ds.collect()) == [1, 3]
    rs = read_store(spark, path)
    assert sorted(r["v"] for r in rs.collect()) == [1, 3]


def test_delete_drop_mask_matches_tuple_set_model():
    """Property: for ANY key/row content (including separator bytes,
    digits, colons, empty strings, NULLs), the mask equals the naive
    per-row tuple-set membership with eqNullSafe semantics."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pysparkenc.datasource import _delete_drop_mask

    val = st.one_of(
        st.none(),
        st.text(
            alphabet=st.sampled_from(list("ab:\x1f12N") + ["\x00"]),
            max_size=4,
        ),
    )
    row = st.tuples(val, val)

    @settings(max_examples=150, deadline=None)
    @given(rows=st.lists(row, min_size=1, max_size=12),
           keys=st.lists(row, min_size=1, max_size=6))
    def check(rows, keys):
        out = pa.table({
            "a": pa.array([r[0] for r in rows], pa.string()),
            "b": pa.array([r[1] for r in rows], pa.string()),
        })
        kt = pa.table({
            "a": pa.array([k[0] for k in keys], pa.string()),
            "b": pa.array([k[1] for k in keys], pa.string()),
        })
        m = _delete_drop_mask(out, kt)
        kset = set(keys)
        want = [r in kset for r in rows]
        got = m.to_pylist() if m is not None else [False] * len(rows)
        assert got == want, (rows, keys)

    check()
