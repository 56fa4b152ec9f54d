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

from pyspark.sql import DataFrame, functions as F

from .lineage import encode_with_lineage


def windowed_counts(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + sums per key — the standard streaming
    aggregation shape (event-time windows, late data bounded by the
    watermark), written so the SAME expression runs in batch and in
    Structured Streaming:

    - batch: leave ``watermark=None``; the result is a plain groupBy and
      carries a full SQL oracle (``event_window_counts``).
    - streaming: pass e.g. ``watermark="2 hours"``; events later than
      the watermark are dropped, windows finalize incrementally, and the
      state store holds only open windows (bounded memory at any rate).

    Sums are emitted as exact integer cents (``sum_cents``) rather than
    a float sum: double addition is order-dependent, and this operator's
    contract is value-hash equality across engines and parallelism.
    """
    d = df
    if watermark is not None:
        d = d.withWatermark(ts_col, watermark)
    return (
        d.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col(value_col) * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .select(
            F.col(key_col),
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_cents",
        )
    )


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
