"""Streaming ingest -> encode: availableNow drain, incremental restart,
exactly-once across the two mechanisms (stream checkpoint + lineage commit)."""

from __future__ import annotations

from pysparkenc.engine import decode_table
from pysparkenc.lineage import read_committed_chunks
from pysparkenc.streaming import encode_stream
from pysparkenc.synth import make_tokens_table


def test_stream_encode_and_incremental_restart(spark, tmp_path):
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    cp = str(tmp_path / "cp")

    # one deterministic table split into disjoint files, so doc_ids are
    # unique across the arriving batches
    full = make_tokens_table(spark, 500, seed=21)
    idx = F.substring("doc_id", -12, 12).cast("long")
    batch1 = full.where(idx < 300)
    batch2 = full.where(idx >= 300)
    batch1.write.mode("append").parquet(src)
    expected = {r["doc_id"]: r["tokens"] for r in batch1.collect()}
    schema = spark.read.parquet(src).schema

    def run_drain():
        q = encode_stream(
            spark.readStream.schema(schema).parquet(src),
            enc,
            checkpoint=cp,
            partition_by=("source", "doc_id"),
            num_partitions=4,
        )
        q.awaitTermination()

    run_drain()
    decoded = decode_table(read_committed_chunks(spark, enc), schema)
    got = {r["doc_id"]: r["tokens"] for r in decoded.collect()}
    assert got == expected

    # drop a second file; restarted stream must encode ONLY the new file
    # (stream checkpoint) and the combined view must decode bit-identically
    batch2.write.mode("append").parquet(src)
    expected.update({r["doc_id"]: r["tokens"] for r in batch2.collect()})
    run_drain()
    decoded = decode_table(read_committed_chunks(spark, enc), schema)
    got = {r["doc_id"]: r["tokens"] for r in decoded.collect()}
    assert got == expected

    # third drain with no new data: no new runs, still identical
    run_drain()
    decoded = decode_table(read_committed_chunks(spark, enc), schema)
    assert decoded.count() == len(expected)


def test_replayed_batch_id_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replay of a fully-committed batch
    (same batch_id, checkpoint offset lost) must no-op — readers must not
    see duplicate rows."""
    from pysparkenc.lineage import encode_with_lineage

    enc = str(tmp_path / "enc")
    df = make_tokens_table(spark, 200, seed=31)
    df.cache().count()

    m1 = encode_with_lineage(df, enc, partition_by=("source", "doc_id"),
                             num_partitions=4, resume=False, batch_id=7)
    assert m1["rows"] == 200

    # simulate the replay: same batch_id, same data
    m2 = encode_with_lineage(df, enc, partition_by=("source", "doc_id"),
                             num_partitions=4, resume=False, batch_id=7)
    assert m2.get("replayed_batch") is True
    assert m2["rows"] == 0

    decoded = decode_table(read_committed_chunks(spark, enc), df.schema)
    assert decoded.count() == 200
    df.unpersist()


def test_stream_rejects_batch_frame(spark, tmp_path):
    import pytest

    df = make_tokens_table(spark, 10, seed=1)
    with pytest.raises(ValueError, match="streaming DataFrame"):
        encode_stream(df, str(tmp_path / "x"), checkpoint=str(tmp_path / "cp"))
