"""Per-partition lineage + checkpoint resume for encode jobs.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The unit of work is the engine's ``part_id`` (deterministic:
hash/range of the partition keys — same input ⇒ same part_ids at any
cluster size). An encode run writes, per part_id, the encoded chunk rows
*and* one lineage row ``(run_id, part_id, n_rows, n_values, plain_bytes,
enc_bytes, n_chunks, wall_sec, status)``.

Commit protocol (Iceberg-snapshot-shaped, on plain parquet dirs):

- chunk rows land under ``chunks/run_id=<r>/`` first;
- the lineage row for a partition is appended only *after* its chunks —
  the lineage row IS the commit record;
- readers (:func:`read_committed_chunks`) semi-join chunks against
  ``status='done'`` lineage on (run_id, part_id): orphan chunks from a
  crashed run are invisible, so append-after-crash never double-counts;
- resume anti-joins the new run against committed part_ids
  (``left_anti`` on a broadcast — the done-set is tiny relative to data)
  and re-encodes only missing partitions.

A killed 10^12-sequence job therefore restarts where it stopped, and
swapping this directory layout for real Iceberg commits is a config
change, not a redesign.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .engine import encode_table

LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", LongType(), False),
        StructField("batch_id", LongType(), False),  # -1 for batch-mode runs
        StructField("part_id", LongType(), False),
        StructField("n_rows", LongType(), False),
        StructField("n_values", LongType(), False),
        StructField("plain_bytes", LongType(), False),
        StructField("enc_bytes", LongType(), False),
        StructField("n_chunks", LongType(), False),
        StructField("wall_sec", DoubleType(), False),
        StructField("status", StringType(), False),
    ]
)


def _chunks_dir(path: str) -> str:
    return f"{path}/chunks"


def _lineage_dir(path: str) -> str:
    return f"{path}/lineage"


def _deletes_dir(path: str) -> str:
    return f"{path}/deletes"


def _schemas_dir(path: str) -> str:
    return f"{path}/schemas"


def _record_run_schema(path: str, run_id: int, schema) -> None:
    """Write the run's logical schema as ``schemas/run-<id>.json`` —
    the per-run schema record schema evolution audits need ("which run
    introduced column X?"). Informational metadata: readers derive the
    live union schema from chunk metadata, so a missing record never
    blocks a read."""
    import json
    import os

    os.makedirs(_schemas_dir(path), exist_ok=True)
    with open(f"{_schemas_dir(path)}/run-{int(run_id)}.json", "w") as fh:
        json.dump(schema.jsonValue(), fh)


def run_schemas(path: str) -> dict[int, "StructType"]:
    """Per-run schemas recorded by :func:`encode_with_lineage` /
    :func:`compact_store`, keyed by run id."""
    import json
    import os

    d = _schemas_dir(path)
    if not os.path.isdir(d):
        return {}
    out: dict[int, StructType] = {}
    for f in os.listdir(d):
        if f.startswith("run-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out[int(f[4:-5])] = StructType.fromJson(json.load(fh))
    return out


def _check_schema_evolution(spark: SparkSession, path: str, df: DataFrame):
    """Appending a run may ADD or OMIT columns (the union decodes with
    typed nulls via the anchor rule in ``decode_table``), but a shared
    column must keep its logical type — a silent type change would make
    the union schema ambiguous and decode one run's chunks under the
    wrong kernel. Driver-side, metadata-only, eager (same contract as
    the delete key validation)."""
    from pyspark.errors import AnalysisException

    from .engine import _logical_of, output_schema_of_chunks

    try:
        committed = read_committed_chunks(spark, path)
        has_data = bool(committed.limit(1).count())
    except AnalysisException:
        # no chunks dir yet (fresh store): nothing to check against.
        # Anything else (corrupt footer, I/O failure) PROPAGATES —
        # silently skipping the guard on a real read failure would let
        # a type-changing append commit, the exact poisoned state this
        # eager validation exists to prevent.
        return
    if not has_data:
        return
    store = {f.name: _logical_of(f)
             for f in output_schema_of_chunks(committed)}
    for f in df.schema.fields:
        old = store.get(f.name)
        new = _logical_of(f)
        if old is not None and old != new:
            raise TypeError(
                f"schema evolution cannot change a column's type: "
                f"{f.name} is {old} in the store but {new} in this "
                "append. Add a NEW column (old groups decode it as "
                "nulls) or compact under an explicit cast first."
            )


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    """Lineage rows under ``path``, read with the EXPLICIT schema (never
    inferred): a directory written before a schema extension (e.g. the
    ``batch_id`` column) still reads cleanly — missing columns surface as
    nulls and ``batch_id`` defaults to -1 (batch mode) instead of an
    AnalysisException on a mixed-schema directory."""
    try:
        lin = spark.read.schema(LINEAGE_SCHEMA).parquet(_lineage_dir(path))
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return lin.withColumn(
        "batch_id", F.coalesce(F.col("batch_id"), F.lit(-1)).cast("long")
    )


def completed_part_ids(spark: SparkSession, path: str) -> DataFrame:
    return (
        read_lineage(spark, path)
        .where(F.col("status") == "done")
        .select("part_id")
        .distinct()
    )


def read_committed_chunks(
    spark: SparkSession,
    path: str,
    *,
    as_of_run: int | None = None,
    runs: tuple[int, ...] | None = None,
) -> DataFrame:
    """Chunk rows whose partition committed (has a done lineage row).

    ``part_id`` is remapped to ``run_id * 2^32 + part_id`` so chunk groups
    stay unique across runs: batch-resume assigns each part_id to exactly
    one run, but streaming appends re-use the same part space every
    micro-batch and must not collide in decode's groupBy.

    ``as_of_run`` is snapshot time travel (the Iceberg
    ``VERSION AS OF`` contract on this layout): each run's single-file
    lineage append IS a snapshot boundary, so filtering the commit
    records to ``run_id <= as_of_run`` reproduces exactly the table a
    reader saw the moment that run committed — later appends (batch
    resumes or streaming micro-batches) become invisible. Pure metadata:
    the chunk scan itself is pruned by the same broadcast semi-join,
    never rewritten.

    ``runs``: restrict to those runs' chunks. ``run_id`` is a hive
    partition column of the chunk directory, so the filter prunes at
    FILE LISTING — unselected runs' files are never opened (the scan
    shape selective compaction needs)."""
    chunks = spark.read.parquet(_chunks_dir(path))
    if runs is not None:
        chunks = chunks.where(F.col("run_id").isin([int(r) for r in runs]))
    lin = read_lineage(spark, path)
    done = (
        lin.where(F.col("status") == "done")
        .select("run_id", "part_id")
        .distinct()
    )
    # compaction markers: a 'superseded' row names an old (run_id,
    # part_id) replaced by the compaction run recorded in ITS batch_id —
    # so time travel to a run BEFORE the compaction naturally ignores
    # the marker and still reads the original layout
    sup = lin.where(F.col("status") == "superseded")
    if as_of_run is not None:
        done = done.where(F.col("run_id") <= int(as_of_run))
        sup = sup.where(F.col("batch_id") <= int(as_of_run))
    done = done.join(
        F.broadcast(sup.select("run_id", "part_id").distinct()),
        ["run_id", "part_id"],
        "left_anti",
    )
    return (
        chunks.join(F.broadcast(done), ["run_id", "part_id"], "left_semi")
        .withColumn(
            "part_id",
            (F.col("run_id") * F.lit(1 << 32) + F.col("part_id")).cast("long"),
        )
        .drop("run_id")
    )


def snapshots(spark: SparkSession, path: str) -> DataFrame:
    """Snapshot history: one row per committed run (Iceberg's
    ``snapshots`` metadata table analogue), newest first, with an
    ``operation`` column: ``append`` (batch encode), ``stream-append``
    (micro-batch with a ``batch_id``), ``compact`` (a run whose id
    appears as the compacting ``batch_id`` of OTHER runs' superseded
    markers), ``quarantined`` (a run self-superseded by the concurrent-
    commit detector — its markers carry ``batch_id == run_id``), or
    ``delete`` (equality-delete commit; ``n_rows`` is its key count).
    Aggregated from the lineage commit records — no chunk payload is
    touched."""
    lin = read_lineage(spark, path)
    sup = lin.where(F.col("status") == "superseded")
    # self-supersede (batch_id == run_id) is the quarantine signature;
    # without the split a quarantined append would masquerade as a
    # successful compaction in the history
    quarantined = (
        sup.where(F.col("batch_id") == F.col("run_id"))
        .select("run_id").distinct()
        .withColumn("__quar", F.lit(True))
    )
    compacting = (
        sup.where(F.col("batch_id") != F.col("run_id"))
        .select(F.col("batch_id").alias("run_id"))
        .distinct()
        .withColumn("__compact", F.lit(True))
    )
    base = (
        lin.where(F.col("status") == "done")
        .groupBy("run_id", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("partitions"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_values").alias("n_values"),
            F.sum("plain_bytes").alias("plain_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.max("wall_sec").alias("wall_sec"),
        )
        .join(F.broadcast(quarantined), "run_id", "left")
        .join(F.broadcast(compacting), "run_id", "left")
        .withColumn(
            "operation",
            F.when(F.col("__quar"), F.lit("quarantined"))
            .when(F.col("__compact"), F.lit("compact"))
            .when(F.col("batch_id") >= 0, F.lit("stream-append"))
            .otherwise(F.lit("append")),
        )
        .drop("__quar", "__compact")
    )
    dels = lin.where(F.col("status") == "delete").select(
        "run_id", "batch_id",
        F.lit(0).cast("long").alias("partitions"),
        F.col("n_rows"),
        F.lit(0).cast("long").alias("n_values"),
        F.lit(0).cast("long").alias("plain_bytes"),
        F.lit(0).cast("long").alias("enc_bytes"),
        "wall_sec",
        F.lit("delete").alias("operation"),
    )
    return base.unionByName(dels).orderBy(F.col("run_id").desc())


def _on_disk_run_ids(path: str) -> set[int]:
    """Run ids with ANY files on disk — chunk dirs or delete-key dirs,
    committed or not. Local-filesystem layout (object stores would route
    the listing through their client, same as :func:`expire_runs`)."""
    import glob
    import re as _re

    ids: set[int] = set()
    for base in (_chunks_dir(path), _deletes_dir(path)):
        for d in glob.glob(f"{base}/run_id=*"):
            m = _re.search(r"run_id=(\d+)$", d)
            if m:
                ids.add(int(m.group(1)))
    return ids


def _max_committed_run(spark: SparkSession, path: str) -> int:
    """Highest run id with a lineage row (0 on an empty store)."""
    lin = read_lineage(spark, path)
    row = lin.agg(F.max("run_id").alias("m")).collect()[0]
    return int(row["m"] or 0)


def _next_run_id(spark: SparkSession, path: str) -> int:
    """Allocate the next run id: one past the max run id visible in the
    lineage OR on disk. The on-disk scan closes the crash window between
    a run's data write and its lineage append: a writer killed there
    leaves committed-invisible orphan files under ``run_id=<r>``, and a
    retry that REUSED ``r`` would interleave its files with the orphans —
    decode survives (pages key last-wins per column) but the run's
    lineage metrics and every footer-metadata aggregate would double.
    Skipping disk-occupied ids makes orphans permanently invisible
    instead; :func:`vacuum_store` reclaims them."""
    hi = _max_committed_run(spark, path)
    disk = _on_disk_run_ids(path)
    if disk:
        hi = max(hi, max(disk))
    return hi + 1


def encode_with_lineage(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] | None = None,
    num_partitions: int | None = None,
    codec: str | dict[str, str] | None = None,
    compression: str | None = None,
    rows_per_chunk: int | None = 4096,
    target_chunk_bytes: int | None = None,
    sort_by: tuple[str, ...] | None = None,
    bloom: tuple[str, ...] | None = None,
    resume: bool = True,
    drop_part_ids: frozenset[int] | None = None,
    batch_id: int | None = None,
) -> dict:
    """Encode ``df`` into ``path`` with per-partition lineage; resumable.

    ``resume=True`` (the default) means THIS CALL CONTINUES the same
    logical encode: partitions whose part_id already committed are
    skipped, so re-running after a crash encodes only what is missing.
    To APPEND a second dataset to an existing store pass
    ``resume=False`` (fresh run, all partitions written) — with the
    default, an append whose part ids collide with committed ones
    silently reduces to a no-op (the result then carries a ``hint``
    saying so).

    Returns run metrics. ``drop_part_ids`` is a test-only fault injector:
    those partitions' output is discarded before commit, simulating a job
    killed after a partial run — the next call with ``resume=True``
    encodes only the missing partitions.

    ``batch_id`` makes the whole call idempotent per source micro-batch:
    Spark's ``foreachBatch`` is at-least-once, so a batch whose encode
    fully committed but whose *streaming checkpoint offset* was lost gets
    replayed with the same batch_id — and must become a no-op, or readers
    see every row twice. A committed batch is detected by its done lineage
    rows; that detection is sound because the lineage append itself is a
    single-file atomic commit (see below) — any visible done row for a
    batch implies ALL of its rows are visible. The pre-commit crash window
    is covered by the chunks-then-lineage protocol (orphan chunks stay
    invisible and the replay re-encodes everything).
    """
    spark = df.sparkSession
    t0 = time.time()
    if batch_id is not None:
        already = (
            read_lineage(spark, path)
            .where((F.col("batch_id") == int(batch_id)) & (F.col("status") == "done"))
            .count()
        )
        if already:
            return {
                "run_id": -1,
                "batch_id": int(batch_id),
                "wall_sec": time.time() - t0,
                "partitions": 0,
                "rows": 0,
                "values": 0,
                "plain_bytes": 0,
                "enc_bytes": 0,
                "skipped_partitions": int(already),
                "compression_ratio": 1.0,
                "replayed_batch": True,
            }
    _check_schema_evolution(spark, path, df)
    run_id = _next_run_id(spark, path)
    chunks = encode_table(
        df, partition_by=partition_by, num_partitions=num_partitions,
        codec=codec, compression=compression, rows_per_chunk=rows_per_chunk,
        target_chunk_bytes=target_chunk_bytes, sort_by=sort_by, bloom=bloom,
    )
    skipped = 0
    if resume:
        done = completed_part_ids(spark, path)
        skipped = done.count()
        if skipped:
            chunks = chunks.join(F.broadcast(done), "part_id", "left_anti")
    if drop_part_ids:
        chunks = chunks.where(
            ~F.col("part_id").isin([int(p) for p in drop_part_ids])
        )

    (
        chunks.withColumn("run_id", F.lit(run_id))
        .write.mode("append")
        .partitionBy("run_id")
        .parquet(_chunks_dir(path))
    )
    wall = time.time() - t0

    # lineage commit AFTER chunk rows land; computed from what actually
    # landed for this run_id so retried/lost tasks can't skew the metrics
    written = spark.read.parquet(_chunks_dir(path)).where(F.col("run_id") == run_id)
    per_group = written.groupBy("part_id", "chunk_id").agg(
        F.max("n_rows").alias("g_rows"),
        F.sum("n_values").alias("g_values"),
        F.sum("plain_bytes").alias("g_plain"),
        F.sum("enc_bytes").alias("g_enc"),
        F.count(F.lit(1)).alias("g_chunks"),
    )
    lin = per_group.groupBy("part_id").agg(
        F.sum("g_rows").cast("long").alias("n_rows"),
        F.sum("g_values").cast("long").alias("n_values"),
        F.sum("g_plain").cast("long").alias("plain_bytes"),
        F.sum("g_enc").cast("long").alias("enc_bytes"),
        F.sum("g_chunks").cast("long").alias("n_chunks"),
        F.lit(float(wall)).alias("wall_sec"),
        F.lit("done").alias("status"),
    ).select(
        F.lit(run_id).cast("long").alias("run_id"),
        F.lit(-1 if batch_id is None else int(batch_id)).cast("long").alias("batch_id"),
        "*",
    )
    # coalesce(1): the lineage append is the COMMIT RECORD, so it must be
    # all-or-nothing. One task -> one file -> one rename at job commit; a
    # job killed mid-commit leaves either no lineage rows (batch replays
    # in full, orphan chunks stay invisible) or all of them — never the
    # partial visibility a multi-file append allows, which would let the
    # batch_id replay check treat a half-committed batch as done and
    # silently drop the missing partitions. The row count is one per
    # partition (tiny), so the single writer is never a bottleneck.
    lin.coalesce(1).write.mode("append").parquet(_lineage_dir(path))

    # single-writer enforcement (same check as delete_rows): two
    # committers racing _next_run_id to one id interleave their chunk
    # files under the same run dir and double-commit its partitions —
    # detect post-commit (committed rows for this run != the rows THIS
    # call appended) and fail loudly rather than let readers see a
    # mixed, double-counted run.
    committed = (
        read_lineage(spark, path).where(F.col("run_id") == run_id).count()
    )
    mine = lin.count()
    if committed != mine:
        # QUARANTINE the poisoned run before failing: both writers'
        # chunk files interleave under the same run dir, so its done
        # rows describe a mixed, double-counted run no retry can repair
        # (re-running allocates a fresh id; the collided one stays
        # visible forever). Supersede every committed (run, part) of the
        # collided run — the same marker mechanism compaction uses —
        # so readers stop selecting its chunk groups and expire_runs can
        # reclaim the directory. batch_id = the collided run itself:
        # time travel to any snapshot at/after the collision sees the
        # quarantine; earlier snapshots never saw the run at all. Both
        # racing writers may append markers — duplicates are harmless
        # (the read path distincts them).
        parts = (
            read_lineage(spark, path)
            .where((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .select("part_id").distinct().collect()
        )
        markers = spark.createDataFrame(
            [
                (int(run_id), int(run_id), int(p["part_id"]),
                 0, 0, 0, 0, 0, float(wall), "superseded")
                for p in parts
            ],
            LINEAGE_SCHEMA,
        )
        markers.coalesce(1).write.mode("append").parquet(_lineage_dir(path))
        raise RuntimeError(
            f"concurrent commit detected on run {run_id}: {committed} "
            f"lineage rows landed where this writer appended {mine}. "
            f"Run {run_id} has been quarantined (all its partitions "
            "superseded — readers no longer see it; expire_runs reclaims "
            "its files). Stores are single-writer — re-run the encode, "
            "which will commit under a fresh run id."
        )

    _record_run_schema(path, run_id, df.schema)
    agg = lin.agg(
        F.count(F.lit(1)).alias("parts"),
        F.sum("n_rows").alias("rows"),
        F.sum("n_values").alias("values"),
        F.sum("plain_bytes").alias("plain"),
        F.sum("enc_bytes").alias("enc"),
    ).collect()[0]
    out = {
        "run_id": run_id,
        "wall_sec": wall,
        "partitions": agg["parts"],
        "rows": agg["rows"] or 0,
        "values": agg["values"] or 0,
        "plain_bytes": agg["plain"] or 0,
        "enc_bytes": agg["enc"] or 0,
        "skipped_partitions": skipped,
        "compression_ratio": (agg["plain"] or 0) / max(1, agg["enc"] or 0),
    }
    if skipped and not out["rows"]:
        # the resume anti-join dropped EVERYTHING: this call was a
        # no-op. Correct for a true resume of a completed encode, but
        # the classic footgun when the caller meant to APPEND a second
        # dataset (part ids collide with the committed run's). Say so
        # in the result instead of leaving a silent empty run.
        out["hint"] = (
            "all partitions were already committed (resume semantics); "
            "to APPEND a new dataset to this store pass resume=False "
            "(or batch_id=... for streaming micro-batches)"
        )
    return out


def delete_rows(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> dict:
    """Equality delete (Iceberg v2 equality-delete semantics): retract
    every row whose ``key_cols`` tuple appears in ``keys_df`` — WITHOUT
    touching a single chunk. The training-data takedown path: removing
    opted-out or contaminated documents from a 100 TB encoded store must
    not rewrite the store.

    A delete is itself a lineage-committed run: the distinct key tuples
    land under ``deletes/run_id=<r>/`` first, then ONE single-file
    lineage append with ``status='delete'`` publishes them (same
    chunks-then-lineage protocol as data — a crash before the lineage
    append leaves orphan key files that readers never see).

    Sequencing matches Iceberg: the delete applies only to rows written
    by runs with ``run_id < r``. A row with the same key appended AFTER
    the delete is new data and survives — so "remove doc X, later
    re-ingest a cleaned doc X" does the right thing with no coordination.
    Time travel composes the same way: ``as_of_run < r`` reads the
    pre-delete table. :func:`compact_store` materializes visible deletes
    and supersedes the delete run (its keys stop being scanned);
    :func:`expire_runs` then removes the key files.
    """
    t0 = time.time()
    # Eager driver-side key validation (mirrors encode_table's interval
    # check): a key column present in keys_df but absent from the store
    # would commit cleanly and then poison EVERY subsequent read — the
    # delete anti-join fails resolving `__dr.<col>` and there is no
    # supported undo. Resolve the store schema from chunk metadata
    # (O(columns) collect) and refuse up front. An empty store (no
    # committed data runs yet) has no schema to check against — the
    # delete is legal (it applies to nothing) and later appends define
    # the schema, so validation is skipped there.
    from pyspark.errors import AnalysisException

    from .engine import output_schema_of_chunks

    try:
        committed = read_committed_chunks(spark, path)
        has_data = bool(committed.limit(1).count())
    except AnalysisException:
        # fresh store (no chunks dir): the delete applies to nothing
        # and later appends define the schema. Real read failures
        # propagate — see _check_schema_evolution.
        has_data = False
    if has_data:
        from .engine import _logical_of

        store_fields = {f.name: _logical_of(f)
                        for f in output_schema_of_chunks(committed)}
        missing = [c for c in key_cols if c not in store_fields]
        if missing:
            raise ValueError(
                f"delete key column(s) {missing} do not exist in the "
                f"store at {path} (columns: {sorted(store_fields)}); a "
                "committed delete on an unknown column would break every "
                "subsequent read of the store"
            )
        # types must match too: a committed key of the wrong type can
        # never retract a row (string 'abc' vs int64 column) and makes
        # the data source's type-aligned key cast fail on every
        # subsequent multi-column read — refuse at commit time, the
        # only moment with a supported undo (don't commit)
        key_fields = {f.name: _logical_of(f)
                      for f in keys_df.select(*key_cols).schema.fields}
        mistyped = [
            (c, key_fields[c], store_fields[c])
            for c in key_cols
            if key_fields[c] != store_fields[c]
        ]
        if mistyped:
            detail = ", ".join(
                f"{c}: keys carry {kt} but the store column is {st}"
                for c, kt, st in mistyped
            )
            raise TypeError(
                f"delete key column type mismatch ({detail}); cast the "
                "keys DataFrame to the store's column types before "
                "committing the delete"
            )
    run_id = _next_run_id(spark, path)
    keys = keys_df.select(*key_cols).distinct()
    # overwrite is belt-and-braces: _next_run_id never hands out an id
    # with files already on disk (a crashed attempt's orphan key files
    # keep their id forever; vacuum_store reclaims them), so this dir is
    # always fresh — overwrite guards the invariant anyway
    keys.write.mode("overwrite").parquet(
        f"{_deletes_dir(path)}/run_id={run_id}"
    )
    n = spark.read.parquet(f"{_deletes_dir(path)}/run_id={run_id}").count()
    wall = time.time() - t0
    marker = spark.createDataFrame(
        [(int(run_id), -1, -1, int(n), 0, 0, 0, 0, float(wall), "delete")],
        LINEAGE_SCHEMA,
    )
    marker.coalesce(1).write.mode("append").parquet(_lineage_dir(path))
    # Stores are SINGLE-WRITER (same contract as encode/compact): two
    # concurrent committers can race _next_run_id to the same id, and
    # the overwrite key-file write means only the last writer's list
    # survives. Detect the collision post-commit and fail LOUDLY — a
    # silently dropped takedown list is the one unacceptable outcome.
    n_markers = (
        read_lineage(spark, path)
        .where(F.col("run_id") == int(run_id))
        .count()
    )
    if n_markers != 1:
        raise RuntimeError(
            f"concurrent commit detected on run {run_id}: {n_markers} "
            "lineage rows share the id and only the last-written key "
            "files survive. Stores are single-writer — re-apply this "
            "delete list."
        )
    return {"run_id": run_id, "keys": int(n), "wall_sec": time.time() - t0}


def upsert_rows(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("doc_id",),
    partition_by: tuple[str, ...] | None = None,
    num_partitions: int | None = None,
    **encode_kw,
) -> dict:
    """MERGE-lite: replace-by-key. Retracts every current row whose
    ``key_cols`` tuple appears in ``df`` (:func:`delete_rows`, run r),
    then appends ``df`` as a fresh run (r+1). Delete sequencing makes
    the composition correct: the delete applies only to rows older than
    r, the new rows are newer, so readers at latest see exactly one row
    per key — the new one. Existing keys update, new keys insert.

    NOT single-snapshot atomic (Iceberg's MERGE is; this is two
    commits): a reader between the two commits sees the keys absent —
    never duplicated — and a crash between them converges on retry
    (the re-run's delete is a no-op for already-retracted keys, the
    append completes the upsert). Time travel exposes both boundaries.

    The append runs with ``resume=False`` by construction: resume's
    anti-join on completed part_ids is for re-running ONE interrupted
    job, and would silently skip an upsert's partitions whenever earlier
    runs already committed those part ids.

    ``df`` must hold ONE row per key tuple — the same rule Iceberg's
    MERGE enforces for multiple source matches. Duplicates would all
    survive the append (the delete dedups its key list but the append
    does not), so they are rejected up front rather than silently
    breaking the one-row-per-key contract."""
    dup = (
        df.groupBy(*key_cols).count().where(F.col("count") > 1).limit(1)
        .collect()
    )
    if dup:
        key = tuple(dup[0][c] for c in key_cols)
        raise ValueError(
            f"upsert_rows input has multiple rows for key {key!r}; "
            "deduplicate (or aggregate) the source to one row per "
            f"{key_cols} first"
        )
    d = delete_rows(spark, path, df.select(*key_cols), key_cols=key_cols)
    m = encode_with_lineage(
        df, path, partition_by=partition_by, num_partitions=num_partitions,
        resume=False, **encode_kw,
    )
    return {
        "delete_run": d["run_id"],
        "append_run": m["run_id"],
        "keys": d["keys"],
        "rows": m["rows"],
        "wall_sec": d["wall_sec"] + m["wall_sec"],
    }


def read_delete_sets(
    spark: SparkSession, path: str, *, as_of_run: int | None = None
) -> list[tuple[int, DataFrame]]:
    """Committed, unsuperseded delete runs visible at ``as_of_run``, as
    ``(delete_run_id, keys_df)`` pairs. Only lineage-committed runs are
    read (orphan key files from a crashed :func:`delete_rows` stay
    invisible); a compaction marks materialized delete runs
    ``superseded`` (``part_id = -1``) and they drop out here. The
    driver-side list is one tiny metadata collect — its length is the
    number of delete COMMITS, not keys."""
    lin = read_lineage(spark, path)
    dels = lin.where(F.col("status") == "delete").select("run_id")
    sup = lin.where(
        (F.col("status") == "superseded") & (F.col("part_id") == -1)
    ).select("run_id", "batch_id")
    if as_of_run is not None:
        dels = dels.where(F.col("run_id") <= int(as_of_run))
        sup = sup.where(F.col("batch_id") <= int(as_of_run))
    live = dels.join(sup.select("run_id"), "run_id", "left_anti")
    out: list[tuple[int, DataFrame]] = []
    for r in sorted(int(x["run_id"]) for x in live.distinct().collect()):
        out.append(
            (r, spark.read.parquet(f"{_deletes_dir(path)}/run_id={r}"))
        )
    return out


def apply_deletes(
    rows: DataFrame,
    deletes: list[tuple[int, DataFrame]],
    *,
    part_col: str,
) -> DataFrame:
    """Anti-join ``rows`` against each delete set, sequenced by run: a
    row dies only to a delete committed AFTER its writing run
    (``delete_run > row_run``, with ``row_run = part_col >> 32`` — the
    combined id :func:`read_committed_chunks` emits). Null-safe on the
    keys, so a delete key tuple containing NULL retracts NULL-keyed rows.

    Scale shape: all delete runs sharing a key-column set UNION into one
    keys-with-``__del_run`` side and apply as ONE equi-join on the key
    columns (the run comparison rides along as a post-condition) — the
    join count stays constant no matter how many delete commits pile up
    between compactions. Catalyst broadcasts small delete sets (the
    common case — takedown lists are thousands of keys against billions
    of rows) and AQE falls back to a shuffle join for huge ones. No
    collect of key data, ever."""
    if not deletes:
        return rows
    # shiftright, not division: long/long division in Spark yields
    # DOUBLE, whose 53-bit mantissa loses exactness for run ids past
    # 2^21 and could mis-sequence a delete against a row's writing run.
    # The combined id is non-negative by construction, so an arithmetic
    # right shift is the exact inverse of `run_id * 2^32 + part_id`.
    row_run = F.shiftright(F.col(f"__dr.{part_col}"), 32)
    by_keyset: dict[tuple[str, ...], DataFrame] = {}
    for del_run, keys in deletes:
        tagged = keys.withColumn("__del_run", F.lit(int(del_run)))
        kc = tuple(keys.columns)
        prev = by_keyset.get(kc)
        by_keyset[kc] = tagged if prev is None else prev.unionByName(tagged)
    for key_cols, union in by_keyset.items():
        cond = None
        for c in key_cols:
            eq = F.col(f"__dr.{c}").eqNullSafe(F.col(f"__dk.{c}"))
            cond = eq if cond is None else (cond & eq)
        cond = cond & (F.col("__dk.__del_run") > row_run)
        rows = rows.alias("__dr").join(union.alias("__dk"), cond, "left_anti")
    return rows


def read_store(
    spark: SparkSession,
    path: str,
    schema=None,
    *,
    as_of_run: int | None = None,
    columns: list[str] | None = None,
    where=(),
) -> DataFrame:
    """THE store read path: committed chunks -> pruned projected scan ->
    equality deletes applied, all snapshot-consistent at ``as_of_run``.
    Equivalent to :func:`pysparkenc.engine.scan_table` over
    :func:`read_committed_chunks` when the store has no deletes (the
    provenance column is only added — and the anti-joins only planned —
    when a committed delete run is visible)."""
    from .engine import scan_table

    chunks = read_committed_chunks(spark, path, as_of_run=as_of_run)
    deletes = read_delete_sets(spark, path, as_of_run=as_of_run)
    if not deletes:
        return scan_table(chunks, schema, columns=columns, where=where)
    part_col = "__pysparkenc_part"
    scan_cols = columns
    if columns is not None:
        # the anti-joins need every delete key column decoded, even when
        # the caller's projection drops it — widen the scan, trim after
        key_names = {c for _, keys in deletes for c in keys.columns}
        scan_cols = list(dict.fromkeys(list(columns) + sorted(key_names)))
    out = scan_table(
        chunks, schema, columns=scan_cols, where=where, part_col=part_col
    )
    out = apply_deletes(out, deletes, part_col=part_col)
    return out.select(*columns) if columns is not None else out.drop(part_col)


# ---------------------------------------------------------------------------
# delete-aware metadata queries (the store-level siblings of
# engine.count_rows / distinct_values / aggregate_chunks)
# ---------------------------------------------------------------------------

def store_count_rows(
    spark: SparkSession,
    path: str,
    *,
    visible: bool = True,
    as_of_run: int | None = None,
) -> int:
    """``COUNT(*)`` over a lineage store. ``visible=True`` (the default)
    counts the VISIBLE table — committed rows minus equality-deleted
    ones — so a takedown is reflected immediately. Fast path: when no
    delete run is visible (detectable from lineage for free), this is
    the engine's metadata-only count — one footer aggregation, zero
    payload decode. With visible deletes, ONLY the delete key columns
    decode (a narrow projected scan), never the full table.
    ``visible=False`` is the engine's physical-store semantics
    (pre-delete), stated explicitly instead of being the silent
    default."""
    chunks = read_committed_chunks(spark, path, as_of_run=as_of_run)
    deletes = (
        read_delete_sets(spark, path, as_of_run=as_of_run) if visible else []
    )
    from .engine import count_rows, output_schema_of_chunks, scan_table

    if not deletes:
        return count_rows(chunks)
    key_cols = sorted({c for _, keys in deletes for c in keys.columns})
    schema = output_schema_of_chunks(chunks)
    pc = "__pysparkenc_part"
    rows = scan_table(chunks, schema, columns=key_cols, part_col=pc)
    return apply_deletes(rows, deletes, part_col=pc).count()


def store_distinct_values(
    spark: SparkSession,
    path: str,
    col: str,
    *,
    visible: bool = True,
    as_of_run: int | None = None,
) -> DataFrame:
    """Exact ``SELECT DISTINCT col`` over a lineage store, delete-aware
    by default: a value whose every row was retracted by a committed
    equality delete no longer appears. Fast path (no visible delete
    runs): the engine's dictionary-page answer — footer metadata + tiny
    dict payloads, code streams untouched. With visible deletes the
    dict pages can't know which rows an anti-join drops, so the scan
    projects ``col`` plus the delete key columns (still column-pruned —
    never the full table), applies the deletes, and distincts."""
    chunks = read_committed_chunks(spark, path, as_of_run=as_of_run)
    deletes = (
        read_delete_sets(spark, path, as_of_run=as_of_run) if visible else []
    )
    from .engine import distinct_values, output_schema_of_chunks

    schema = output_schema_of_chunks(chunks)
    from .engine import require_flat_scalar

    require_flat_scalar(schema, col)
    if not deletes:
        return distinct_values(chunks, col, schema)
    return read_store(
        spark, path, schema, as_of_run=as_of_run, columns=[col]
    ).distinct()


def store_aggregate(
    spark: SparkSession,
    path: str,
    cols: list[str],
    *,
    visible: bool = True,
    as_of_run: int | None = None,
) -> DataFrame:
    """COUNT / SUM / MIN / MAX per column over a lineage store (the
    store-level :func:`engine.aggregate_chunks`), delete-aware by
    default. Fast path (no visible delete runs): metadata-only — footer
    stats fold, no payload decode. With visible deletes the aggregate
    must see which rows survive, so the named columns (plus delete
    keys) decode in a projected scan and fold with the same output
    contract: ``n_values`` counts non-null survivors, ``sum_val`` is
    exact for integer columns (decimal(38,0) fold, null past int64) and
    null otherwise, ``min_val``/``max_val`` are float64.

    The delete-aware fallback supports plain numeric columns
    (int/float); converted-domain types (dates, timestamps, decimals,
    intervals) raise there — their footer stats live in a physical
    domain a decoded-value fold can't reproduce exactly. Use
    ``read_store(...)`` + SQL for those, or compact to materialize the
    deletes and return to the fast path."""
    chunks = read_committed_chunks(spark, path, as_of_run=as_of_run)
    deletes = (
        read_delete_sets(spark, path, as_of_run=as_of_run) if visible else []
    )
    from .engine import (
        _logical_of,
        aggregate_chunks,
        output_schema_of_chunks,
        scan_table,
    )

    if not deletes:
        return aggregate_chunks(chunks, cols)
    schema = output_schema_of_chunks(chunks)
    int_logicals = {"int32", "int64"}
    plain_numeric = int_logicals | {"float32", "float64"}
    for c in cols:
        lg = _logical_of(schema[c])
        if lg not in plain_numeric:
            raise TypeError(
                f"store_aggregate(visible=True) with pending deletes "
                f"supports plain numeric columns only; {c} is {lg}. "
                "Compact the store (materializes deletes) or aggregate "
                "through read_store()."
            )
    key_cols = sorted({c for _, keys in deletes for c in keys.columns})
    pcol = "__pysparkenc_part"
    scan_cols = list(dict.fromkeys(list(cols) + key_cols))
    rows = apply_deletes(
        scan_table(chunks, schema, columns=scan_cols, part_col=pcol),
        deletes,
        part_col=pcol,
    )
    lo = F.lit(-(2 ** 63)).cast("decimal(38,0)")
    hi = F.lit(2 ** 63 - 1).cast("decimal(38,0)")
    parts = []
    for c in cols:
        is_int = _logical_of(schema[c]) in int_logicals
        s = F.sum(F.col(c).cast("decimal(38,0)"))
        parts.append(
            rows.agg(
                F.count(F.col(c)).cast("long").alias("n_values"),
                (
                    F.when((s >= lo) & (s <= hi), s).cast("long")
                    if is_int else F.lit(None).cast("long")
                ).alias("sum_val"),
                F.min(F.col(c)).cast("double").alias("min_val"),
                F.max(F.col(c)).cast("double").alias("max_val"),
            ).select(F.lit(c).alias("col"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_store(
    spark: SparkSession,
    path: str,
    *,
    schema=None,
    partition_by: tuple[str, ...] | None = None,
    num_partitions: int | None = None,
    codec: str | dict[str, str] | None = None,
    compression: str | None = None,
    target_chunk_bytes: int | None = 1 << 20,
    sort_by: tuple[str, ...] | None = None,
    as_of_run: int | None = None,
    runs: tuple[int, ...] | None = None,
    max_run_bytes: int | None = None,
) -> dict:
    """Rewrite the store's visible data as ONE fresh run with big,
    well-clustered pages — the Iceberg ``rewrite_data_files`` analogue
    for this layout. Streaming appends leave a long tail of small runs
    (tiny pages, one chunk-file dir per micro-batch; the codec selector
    adapts per page but can't merge across them); compaction decodes the
    committed table (fully distributed — the same decode path queries
    use) and re-encodes it with ``target_chunk_bytes`` page sizing.

    SELECTIVE compaction (the 100 TB contract — routine maintenance
    must not rewrite the table): ``runs=(...)`` rewrites only those
    committed runs; ``max_run_bytes=N`` selects every live run whose
    committed encoded bytes are below N (the small-streaming-runs
    folder). Bytes rewritten are proportional to the selected subset —
    untouched runs' chunk files aren't read, decoded, or rewritten.
    Visible equality deletes are materialized INTO the rewritten rows
    (sequenced per row, as any read is); a delete run is superseded
    only when no remaining (unselected) data run still predates it —
    otherwise its keys stay live for the runs that still need them.
    Default (no selection): full compaction, as before.

    Commit is ATOMIC against every failure point: the new run's chunk
    rows land first (invisible without lineage), then one single-file
    lineage append publishes BOTH the new run's done rows AND a
    'superseded' marker per old (run_id, part_id) — so readers switch
    from the old layout to the new one in a single rename; a crash
    before it leaves only invisible orphan chunks. Markers carry the
    compaction run id in ``batch_id``, which scopes them for time
    travel: ``as_of_run`` BEFORE the compaction still reads the original
    layout byte-for-byte; AFTER it, only the compacted run.

    Old chunk files stay on disk for time travel until
    :func:`expire_runs` removes them. Don't compact while a resumable
    batch encode of the same store is mid-flight: its remaining
    partitions would commit into a layout the compaction didn't see.
    """
    from .engine import decode_table

    t0 = time.time()
    if runs is not None and max_run_bytes is not None:
        raise ValueError("pass runs= or max_run_bytes=, not both")
    if as_of_run is not None:
        # Compaction REWRITES the current table — it must see every
        # commit. Rewriting an older snapshot would resurrect rows a
        # later delete retracted (the rewritten rows get a run_id newer
        # than the delete, so its sequencing no longer applies) and fork
        # history. as_of_run is accepted only as an idempotence fence:
        # it may name the latest commit, nothing older. Max COMMITTED
        # run, not _next_run_id - 1: uncommitted orphan dirs (crashed
        # writers) occupy higher ids on disk without being commits.
        latest = _max_committed_run(spark, path)
        if int(as_of_run) < latest:
            raise ValueError(
                f"compact_store(as_of_run={as_of_run}) is older than the "
                f"latest commit (run {latest}): compacting a non-latest "
                "snapshot would rewrite history (and resurrect rows "
                "deleted after it). Time travel is for reads."
            )
    # exact: shiftright recovers the writing run from the combined id
    # (double division loses low bits past 2^53)
    all_live = (
        read_committed_chunks(spark, path, as_of_run=as_of_run)
        .select(
            F.shiftright(F.col("part_id"), 32).alias("run_id"),
            F.pmod(F.col("part_id"), F.lit(1 << 32)).cast("long")
            .alias("part_id"),
            "enc_bytes",
        )
        .groupBy("run_id", "part_id")
        .agg(F.sum("enc_bytes").cast("long").alias("enc_bytes"))
        .collect()
    )
    if not all_live:
        return {"run_id": -1, "partitions": 0, "superseded": 0,
                "selected_runs": [], "bytes_selected": 0,
                "wall_sec": time.time() - t0}
    live_runs = {int(r["run_id"]) for r in all_live}
    if runs is not None:
        selected = {int(r) for r in runs}
        unknown = selected - live_runs
        if unknown:
            raise ValueError(
                f"runs {sorted(unknown)} have no live committed "
                f"partitions (live runs: {sorted(live_runs)})"
            )
    elif max_run_bytes is not None:
        per_run: dict[int, int] = {}
        for r in all_live:
            per_run[int(r["run_id"])] = (
                per_run.get(int(r["run_id"]), 0) + int(r["enc_bytes"])
            )
        selected = {r for r, b in per_run.items() if b < int(max_run_bytes)}
        if not selected:
            return {"run_id": -1, "partitions": 0, "superseded": 0,
                    "selected_runs": [], "bytes_selected": 0,
                    "wall_sec": time.time() - t0}
    else:
        selected = live_runs
    old = [r for r in all_live if int(r["run_id"]) in selected]
    bytes_selected = sum(int(r["enc_bytes"]) for r in old)
    remaining = live_runs - selected
    deletes = read_delete_sets(spark, path, as_of_run=as_of_run)
    # a delete run d applies to rows written by runs < d: it can retire
    # only when every remaining (unselected) data run is >= d
    min_remaining = min(remaining) if remaining else None
    dead_deletes = [
        dr for dr, _ in deletes
        if min_remaining is None or min_remaining >= dr
    ]
    # run_id is a hive partition column: the runs= filter prunes at
    # file listing, so bytes READ (not just rewritten) scale with the
    # selection, not the table
    chunks_in = read_committed_chunks(
        spark, path, as_of_run=as_of_run,
        runs=tuple(sorted(selected)) if remaining else None,
    )
    if deletes:
        # materialize equality deletes into the rewritten rows: the
        # compacted run holds the post-delete subset; fully-retired
        # delete runs are superseded below so readers stop scanning
        # their key files
        pc = "__pysparkenc_part"
        df = apply_deletes(
            decode_table(chunks_in, schema, part_col=pc), deletes,
            part_col=pc,
        ).drop(pc)
    else:
        df = decode_table(chunks_in, schema)
    run_id = _next_run_id(spark, path)
    chunks = encode_table(
        df, partition_by=partition_by, num_partitions=num_partitions,
        codec=codec, compression=compression,
        rows_per_chunk=None if target_chunk_bytes else 4096,
        target_chunk_bytes=target_chunk_bytes, sort_by=sort_by,
    )
    (
        chunks.withColumn("run_id", F.lit(run_id))
        .write.mode("append")
        .partitionBy("run_id")
        .parquet(_chunks_dir(path))
    )
    wall = time.time() - t0
    written = spark.read.parquet(_chunks_dir(path)).where(
        F.col("run_id") == run_id
    )
    lin = written.groupBy("part_id").agg(
        F.max("n_rows").cast("long").alias("n_rows"),
        F.sum("n_values").cast("long").alias("n_values"),
        F.sum("plain_bytes").cast("long").alias("plain_bytes"),
        F.sum("enc_bytes").cast("long").alias("enc_bytes"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.lit(float(wall)).alias("wall_sec"),
        F.lit("done").alias("status"),
    ).select(
        F.lit(run_id).cast("long").alias("run_id"),
        F.lit(-1).cast("long").alias("batch_id"),
        "*",
    )
    # n_rows per partition: groups have per-page n_rows; recompute as the
    # sum over distinct chunk groups (max over the group's columns)
    per_group = written.groupBy("part_id", "chunk_id").agg(
        F.max("n_rows").alias("g_rows")
    )
    rows_per_part = per_group.groupBy("part_id").agg(
        F.sum("g_rows").cast("long").alias("n_rows2")
    )
    lin = (
        lin.join(rows_per_part, "part_id")
        .drop("n_rows").withColumnRenamed("n_rows2", "n_rows")
        .select(*[f.name for f in LINEAGE_SCHEMA.fields])
    )
    markers = spark.createDataFrame(
        [
            (int(r["run_id"]), int(run_id), int(r["part_id"]),
             0, 0, 0, 0, 0, float(wall), "superseded")
            for r in old
        ]
        + [
            # fully-retired delete runs: part_id -1 is the whole-run
            # marker read_delete_sets filters on. A delete some
            # REMAINING run still predates stays live — its keys keep
            # applying to the runs this compaction didn't rewrite.
            (int(dr), int(run_id), -1, 0, 0, 0, 0, 0, float(wall),
             "superseded")
            for dr in dead_deletes
        ],
        LINEAGE_SCHEMA,
    )
    # ONE single-file append = the atomic publish-and-supersede commit
    lin.unionByName(markers).coalesce(1).write.mode("append").parquet(
        _lineage_dir(path)
    )
    _record_run_schema(path, run_id, df.schema)
    return {
        "run_id": run_id,
        "partitions": int(lin.count()),
        "superseded": len(old),
        "selected_runs": sorted(selected),
        "bytes_selected": bytes_selected,
        "superseded_delete_runs": sorted(dead_deletes),
        "wall_sec": time.time() - t0,
    }


def expire_runs(spark: SparkSession, path: str) -> dict:
    """Physically delete chunk directories of runs whose EVERY committed
    partition is superseded (Iceberg ``expire_snapshots``): time travel
    to those runs stops working; current reads are untouched because the
    semi-join never selects superseded chunk groups. Local-filesystem
    stores only (this sandbox's layout); object stores would route the
    deletes through their own client."""
    import shutil

    lin = read_lineage(spark, path)
    done = lin.where(F.col("status") == "done").select("run_id", "part_id")
    sup = lin.where(F.col("status") == "superseded").select(
        "run_id", "part_id"
    ).distinct()
    live = done.join(sup, ["run_id", "part_id"], "left_anti")
    dead_runs = sorted(
        {int(r["run_id"]) for r in done.select("run_id").distinct().collect()}
        - {int(r["run_id"]) for r in live.select("run_id").distinct().collect()}
    )
    removed = []
    for r in dead_runs:
        d = f"{_chunks_dir(path)}/run_id={r}"
        shutil.rmtree(d, ignore_errors=True)
        removed.append(r)
    # materialized (superseded, part_id = -1) delete runs: key files are
    # dead weight once no reader will scan them
    dels = lin.where(F.col("status") == "delete").select("run_id").distinct()
    dead_dels = sorted(
        int(r["run_id"])
        for r in dels.join(
            sup.where(F.col("part_id") == -1).select("run_id").distinct(),
            "run_id",
            "left_semi",
        ).collect()
    )
    for r in dead_dels:
        shutil.rmtree(f"{_deletes_dir(path)}/run_id={r}", ignore_errors=True)
    return {"expired_runs": removed, "expired_delete_runs": dead_dels}


def vacuum_store(
    spark: SparkSession, path: str, *, grace_sec: float = 86400.0
) -> dict:
    """Reclaim ORPHANED files (Iceberg ``remove_orphan_files``): run
    directories — chunk files or delete-key files — with no lineage row
    at all, the debris of a writer killed between its data write and its
    lineage append. The commit protocol already makes them invisible to
    every reader (and :func:`_next_run_id` never reuses their ids), so
    this is purely a storage reclaim; query results are identical before
    and after, which the test pins row-for-row.

    ``grace_sec`` protects an IN-FLIGHT writer that simply hasn't
    committed yet: a directory whose newest file is younger than the
    grace window is kept (Iceberg's ``older_than`` contract; default one
    day). Stale Spark ``_temporary`` job-attempt dirs in the same
    layout, left by killed write jobs, are removed under the same age
    rule. Complements :func:`expire_runs`, which reclaims SUPERSEDED
    *committed* runs — together they bound a maintained store's disk
    footprint to its live data plus the time-travel window.

    Local-filesystem stores only (this sandbox's layout); object stores
    would route listing + deletes through their own client."""
    import os
    import shutil

    now = time.time()
    committed = {
        int(r["run_id"])
        for r in read_lineage(spark, path).select("run_id").distinct()
        .collect()
    }

    def newest_mtime(d: str) -> float:
        newest = os.path.getmtime(d)
        for root, _dirs, files in os.walk(d):
            for f in files:
                try:
                    newest = max(newest, os.path.getmtime(
                        os.path.join(root, f)))
                except OSError:  # pragma: no cover - racing writer
                    pass
        return newest

    def dir_bytes(d: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(d):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:  # pragma: no cover - racing writer
                    pass
        return total

    vacuumed: dict[str, list[int]] = {"chunks": [], "deletes": []}
    removed_tmp = 0
    reclaimed = 0
    for kind, base in (
        ("chunks", _chunks_dir(path)), ("deletes", _deletes_dir(path))
    ):
        if not os.path.isdir(base):
            continue
        for name in sorted(os.listdir(base)):
            d = os.path.join(base, name)
            if not os.path.isdir(d):
                continue
            if name.startswith("run_id="):
                try:
                    rid = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if rid in committed:
                    continue
            elif name == "_temporary":
                pass  # stale job-attempt debris, age-gated below
            else:
                continue
            if now - newest_mtime(d) < grace_sec:
                continue
            reclaimed += dir_bytes(d)
            shutil.rmtree(d, ignore_errors=True)
            if name == "_temporary":
                removed_tmp += 1
            else:
                vacuumed[kind].append(rid)
    # stale _staging files: the data-source writers (batch lineage
    # appends + the streaming sink) stage task output there and publish
    # by rename at commit — a killed task/job leaves its stage files
    # behind. Same age rule; never referenced by any commit record.
    staged = 0
    staging = os.path.join(path, "_staging")
    if os.path.isdir(staging):
        for f in os.listdir(staging):
            p = os.path.join(staging, f)
            try:
                if (os.path.isfile(p)
                        and now - os.path.getmtime(p) >= grace_sec):
                    reclaimed += os.path.getsize(p)
                    os.remove(p)
                    staged += 1
            except OSError:  # pragma: no cover - racing writer
                pass
    return {
        "vacuumed_runs": vacuumed["chunks"],
        "vacuumed_delete_runs": vacuumed["deletes"],
        "removed_tmp_dirs": removed_tmp,
        "removed_staging_files": staged,
        "bytes_reclaimed": reclaimed,
    }
