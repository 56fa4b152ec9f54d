"""Structured Streaming ingest -> encode.

The reference library has no streaming constructs (SURVEY.md §2.4); this
is the Spark-native extension a continuously-growing 10^12-sequence corpus
needs: new token files land in a directory (or Kafka/Iceberg feed), each
micro-batch is encoded with the full batch engine — salted partitioning,
codec auto-selection, per-partition lineage — via ``foreachBatch``.

Exactly-once comes from three cooperating mechanisms:
- Spark's streaming checkpoint replays a failed micro-batch;
- the lineage commit protocol (chunks first, lineage row after) makes a
  *partially-written* batch's orphan chunks invisible to readers
  (``lineage.read_committed_chunks``);
- per-``batch_id`` idempotency closes the remaining at-least-once window:
  if a batch fully committed but the job died before Spark persisted the
  checkpoint offset, the replayed batch finds its done lineage rows and
  no-ops instead of committing twice.

``foreachBatch`` (not a streaming mapInArrow) is deliberate: the skew plan
in ``plan_partitions`` needs a per-batch aggregate, which is exactly the
micro-batch boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .lineage import encode_with_lineage


def encode_stream(
    stream_df: DataFrame,
    path: str,
    *,
    checkpoint: str,
    partition_by: tuple[str, ...] | None = None,
    num_partitions: int | None = None,
    codec: str | dict[str, str] | None = None,
    available_now: bool = True,
):
    """Start a streaming query encoding each micro-batch into ``path``.

    ``available_now=True`` drains everything currently available and stops
    (the batch-backfill trigger); pass False for a continuous micro-batch
    stream. Returns the StreamingQuery; callers ``awaitTermination()``.
    """
    if not stream_df.isStreaming:
        raise ValueError("encode_stream needs a streaming DataFrame "
                         "(spark.readStream...)")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # resume=False: each micro-batch is new data; dedup across replays
        # is handled per batch_id — foreachBatch is at-least-once, so a
        # replay of a fully-committed batch (checkpoint offset lost after
        # the lineage commit) must no-op instead of double-encoding.
        encode_with_lineage(
            batch_df,
            path,
            partition_by=partition_by,
            num_partitions=num_partitions,
            codec=codec,
            resume=False,
            batch_id=batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
