"""``pysparkenc`` as a first-class Spark data source (Python Data Source
API, Spark 4):

    spark.dataSource.register(ChunkStoreDataSource)
    df.write.format("pysparkenc").mode("overwrite").save(path)
    spark.read.format("pysparkenc").load(path).where("id > 100")

Store layout (plain files, any fs path the driver and executors share)::

    <path>/_pysparkenc_schema.json   logical Spark schema + format version
    <path>/chunks/part-*.parquet     chunk rows (engine.CHUNK_SCHEMA)

Scale design:

- One input partition per chunk parquet file — the driver holds O(files)
  metadata, never chunk rows; each task streams its own file. Writes are
  one file per task with unique names, so concurrent tasks never collide
  and a failed job never corrupts the previous store (old files are
  removed only in ``commit`` for overwrite mode).
- **Catalyst filter pushdown** (``pushFilters``): equality / IN / range /
  IsNotNull / StringStartsWith predicates on top-level scalar columns
  prune whole page groups per file — dictionary-page membership probes
  for ``dict_rle`` chunks, NaN-safe min/max and truncation-safe
  smin/smax otherwise (the same :func:`engine._chunk_passes_isin` /
  :func:`engine._chunk_passes_range` predicates the engine's Spark-side
  pruning uses). Every filter is also returned to Spark for
  re-evaluation, so pruning is a pure optimization and can never drop a
  row it shouldn't: a group survives unless the stats *prove* it empty.
- Decode reuses :func:`engine._group_decoder` — the exact executor path
  ``decode_table`` runs under ``applyInArrow``, yielding Arrow record
  batches (zero row-at-a-time Python).

The reference is a library around parquet files, not a query engine
(file-reader.go:99-107); this module is the Spark-native equivalent of
"being a file format": schema inference, source, sink, and predicate
pushdown through the encoded representation.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from . import engine

FORMAT_VERSION = 1
_SCHEMA_FILE = "_pysparkenc_schema.json"
_CHUNK_DIR = "chunks"


def _schema_path(path: str) -> str:
    return os.path.join(path, _SCHEMA_FILE)


def _chunk_dir(path: str) -> str:
    return os.path.join(path, _CHUNK_DIR)


def _list_chunk_files(path: str) -> list[str]:
    d = _chunk_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def read_store_schema(path: str) -> StructType:
    with open(_schema_path(path)) as fh:
        meta = json.load(fh)
    return StructType.fromJson(meta["schema"])


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

@dataclass
class _Pushed:
    """Picklable pruning predicate for one column."""

    col: str
    kind: str  # "isin" | "range" | "notnull"
    values: tuple = ()
    lo: object = None
    hi: object = None


def _to_pushed(filters: Sequence[Filter], schema: StructType) -> list[_Pushed]:
    """Translate the prunable subset of Catalyst filters. Only top-level
    scalar columns participate (nested predicates stay Spark-side)."""
    scalar = {
        f.name
        for f in schema.fields
        if f.dataType.typeName()
        not in ("struct", "array", "map")
    }
    out: list[_Pushed] = []
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1 or attr[0] not in scalar:
            continue
        c = attr[0]
        if isinstance(f, EqualTo) or (
            isinstance(f, EqualNullSafe) and f.value is not None
        ):
            out.append(_Pushed(c, "isin", (f.value,)))
        elif isinstance(f, In):
            vals = tuple(v for v in f.value if v is not None)
            if vals:
                out.append(_Pushed(c, "isin", vals))
        elif isinstance(f, GreaterThan) or isinstance(f, GreaterThanOrEqual):
            out.append(_Pushed(c, "range", lo=f.value))
        elif isinstance(f, LessThan) or isinstance(f, LessThanOrEqual):
            out.append(_Pushed(c, "range", hi=f.value))
        elif isinstance(f, IsNotNull):
            out.append(_Pushed(c, "notnull"))
        elif isinstance(f, StringStartsWith):
            out.append(_Pushed(c, "prefix", (f.value,)))
    return out


def _group_passes(meta_rows: dict[str, dict], p: _Pushed) -> bool:
    """Does this page group possibly satisfy predicate ``p``?  Missing
    chunk/stats keep the group — only provable emptiness drops it."""
    d = meta_rows.get(p.col)
    if d is None:
        return True
    extra = json.loads(d["extra"] or "{}")
    if p.kind == "notnull":
        nr, nc = d["n_rows"], d["null_count"]
        return not (nr is not None and nc is not None and nc >= nr)
    if p.kind == "prefix":
        pref = str(p.values[0])
        smin, smax = extra.get("smin"), extra.get("smax")
        if smax is not None and smax < pref:
            return False
        if smin is not None and smin > pref and not smin.startswith(pref):
            return False
        return True
    if p.kind == "isin":
        vals = list(p.values)
        is_bytes = isinstance(vals[0], (str, bytes))
        svals = {v if isinstance(v, bytes) else str(v).encode() for v in vals}
        nvals = None if is_bytes else np.asarray(sorted(vals))
        hbytes, hints = engine._bloom_probe_hashes(
            svals if is_bytes else None, nvals
        )
        return engine._chunk_passes_isin(
            d["codec"], d["dtype"], d["n_unique"], d["num_min"], d["num_max"],
            extra, d["aux"],
            svals=svals,
            strs=sorted(s.decode(errors="replace") for s in svals),
            fvals=None if is_bytes else np.array(sorted(vals), np.float64),
            nvals=nvals,
            logical=d.get("logical"),
            bloom=d.get("bloom"),
            hbytes=hbytes, hints=hints,
        )
    return engine._chunk_passes_range(
        d["num_min"], d["num_max"], extra, p.lo, p.hi
    )


class ChunkStoreReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        if not path:
            raise ValueError("pysparkenc reader needs a path")
        self.path = path
        self.user_schema = schema
        self.pushed: list[_Pushed] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        self.pushed = _to_pushed(filters, self.user_schema)
        # return every filter: Spark re-applies them all, so our pruning
        # is an optimization with unconditional correctness
        return iter(filters)

    def partitions(self) -> list[InputPartition]:
        files = _list_chunk_files(self.path)
        # Bin-pack small files into byte-targeted read partitions: each
        # partition costs a Python worker round-trip, so a store left by
        # many streaming micro-batches (hundreds of tiny chunk files)
        # must not pay it per FILE. Compacted stores with ~target-sized
        # files get one file per partition — full parallelism either way.
        target = 32 << 20
        groups: list[tuple[str, ...]] = []
        cur: list[str] = []
        acc = 0
        for f in files:
            try:
                sz = os.path.getsize(f)
            except OSError:
                sz = target
            if cur and acc + sz > target:
                groups.append(tuple(cur))
                cur, acc = [], 0
            cur.append(f)
            acc += sz
        if cur:
            groups.append(tuple(cur))
        # zero files: one empty partition so the scan yields an empty
        # DataFrame instead of failing
        return [InputPartition(g) for g in groups] or [InputPartition(None)]

    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        val = partition.value
        files = (val,) if isinstance(val, str) else val
        for f in files:
            yield from self._read_file(f)

    def _read_file(self, path: str):
        schema = self.user_schema
        allowed: set[str] = set()
        for f in schema.fields:
            allowed |= engine._subtree_chunk_names(f.name, f.dataType)
        table = pq.read_table(
            path,
            filters=[("col", "in", sorted(allowed))],
        )
        if table.num_rows == 0:
            return
        decode_pages = engine._group_decoder(schema)
        pid = table.column("part_id").to_numpy()
        cid = table.column("chunk_id").to_numpy()
        order = np.lexsort((cid, pid))
        table = table.take(pa.array(order))
        pid, cid = pid[order], cid[order]
        keys = pid * (int(cid.max()) + 1 if cid.size else 1) + cid
        group_starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(keys)) + 1, [keys.size]]
        )
        # page-group pruning against the pushed predicates
        keep_slices = []
        if self.pushed:
            wanted = ["col", "codec", "dtype", "logical", "n_rows",
                      "null_count", "n_unique", "num_min", "num_max",
                      "extra", "aux", "bloom"]
            present = set(table.schema.names)
            cols = {
                c: (table.column(c).to_pylist() if c in present
                    else [None] * table.num_rows)  # pre-bloom stores
                for c in wanted
            }
        for s, e in zip(group_starts[:-1], group_starts[1:]):
            if self.pushed:
                meta_rows = {
                    cols["col"][j]: {c: cols[c][j] for c in cols}
                    for j in range(s, e)
                }
                if not all(
                    _group_passes(meta_rows, p) for p in self.pushed
                ):
                    continue
            keep_slices.append((int(s), int(e - s)))
        for s, n in keep_slices:
            out = decode_pages(table.slice(s, n))
            yield from out.to_batches()


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

@dataclass
class _FileCommit(WriterCommitMessage):
    files: tuple = ()


class ChunkStoreWriter(DataSourceArrowWriter):
    def __init__(self, path: str, schema: StructType, options: dict,
                 overwrite: bool):
        self.path = path
        self.fields = schema.fields
        self.schema_json = schema.jsonValue()
        self.overwrite = overwrite
        codec = options.get("codec")
        self.codec_for: dict[str, str] = {}
        self.default_codec = codec or None
        self.compression = options.get("compression") or None
        self.rows_per_chunk = int(options.get("rows_per_chunk", "4096"))
        tcb = options.get("target_chunk_bytes")
        self.target_chunk_bytes = int(tcb) if tcb else None
        # .option("bloom", "doc_id,source") — per-chunk SBBF on those
        # columns; .option("bloom_fpp", "0.005") tunes the target rate
        bloom_opt = options.get("bloom") or ""
        fpp = float(options.get("bloom_fpp", "0.01"))
        self.bloom_for: dict[str, float] = {
            c.strip(): fpp for c in bloom_opt.split(",") if c.strip()
        }
        # captured at job start (driver): the files an overwrite replaces
        self.previous_files = tuple(_list_chunk_files(path))
        self.job_millis = int(time.time() * 1000)
        for f in schema.fields:
            engine._logical_of(f)  # fail on unsupported types driver-side

    def _encode_iterator(
        self, iterator: Iterator[pa.RecordBatch]
    ) -> pa.Table | None:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        out: list[pa.RecordBatch] = []
        seq = 0
        kcache: dict = {}  # per-task FSST symbol reuse across pages
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if self.target_chunk_bytes:
                row_b = max(1.0, batch.nbytes / batch.num_rows)
                raw = max(512, min(65536, int(self.target_chunk_bytes / row_b)))
                step = 1 << (raw.bit_length() - 1)
            else:
                step = self.rows_per_chunk or batch.num_rows
            for start in range(0, batch.num_rows, step):
                sub = batch.slice(start, step)
                out.append(
                    engine._encode_arrow_batch(
                        sub, self.fields, pid, seq, None,
                        self.codec_for, self.default_codec, self.compression,
                        self.bloom_for, kcache,
                    )
                )
                seq += 1
        return pa.Table.from_batches(out) if out else None

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _FileCommit:
        from pyspark import TaskContext

        table = self._encode_iterator(iterator)
        if table is None:
            return _FileCommit(())
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        os.makedirs(_chunk_dir(self.path), exist_ok=True)
        # job-millis prefix keeps append file names monotone across jobs
        # (same driver), so a streaming tail's name watermark never skips
        # a later append; uuid suffix keeps concurrent tasks collision-free
        fname = os.path.join(
            _chunk_dir(self.path),
            f"part-{self.job_millis:013d}-{pid:05d}-{uuid.uuid4().hex}.parquet",
        )
        pq.write_table(table, fname)
        return _FileCommit((fname,))

    def commit(self, messages):
        if self.overwrite:
            new = {f for m in messages if m for f in m.files}
            for f in self.previous_files:
                if f not in new and os.path.exists(f):
                    os.remove(f)
        os.makedirs(self.path, exist_ok=True)
        with open(_schema_path(self.path), "w") as fh:
            json.dump(
                {"version": FORMAT_VERSION, "schema": self.schema_json}, fh
            )

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for f in m.files:
                if os.path.exists(f):
                    os.remove(f)


class ChunkStoreStreamReader(DataSourceStreamReader):
    """Structured-Streaming source: ``spark.readStream.format("pysparkenc")``.

    Incremental tailing of a chunk store. File names are the offset
    domain: both writers emit names that only ever *grow* the sorted
    file list at the end for their own stream (``stream-b<batch>-…`` is
    monotone in batch id), and chunk files are immutable once visible,
    so an offset is simply the high-water file name. Each micro-batch
    reads the files in ``(start, end]`` — one input partition per file,
    decoded executor-side with the same group decoder as the batch
    reader. Batch-written ``part-…`` files carry a job-millis prefix, so
    successive appends from one driver also sort above the watermark.
    Don't mix writer kinds on a tailed store: ``part-`` names always
    sort below ``stream-`` names, so a batch append to a store already
    fed by the streaming sink would land under the high-water mark and
    be skipped.
    """

    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.user_schema = schema

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return {"hwm": ""}

    def latestOffset(self) -> dict:  # noqa: N802
        files = _list_chunk_files(self.path)
        hwm = os.path.basename(files[-1]) if files else ""
        return {"hwm": hwm}

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("hwm", ""), end.get("hwm", "")
        files = [
            f
            for f in _list_chunk_files(self.path)
            if lo < os.path.basename(f) <= hi
        ]
        return [InputPartition(f) for f in files] or [InputPartition(None)]

    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        schema = self.user_schema
        allowed: set[str] = set()
        for f in schema.fields:
            allowed |= engine._subtree_chunk_names(f.name, f.dataType)
        table = pq.read_table(
            partition.value, filters=[("col", "in", sorted(allowed))]
        )
        if table.num_rows == 0:
            return
        decode_pages = engine._group_decoder(schema)
        pid = table.column("part_id").to_numpy()
        cid = table.column("chunk_id").to_numpy()
        order = np.lexsort((cid, pid))
        table = table.take(pa.array(order))
        pid = pid[order]
        part_starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(pid)) + 1, [pid.size]]
        )
        for s, e in zip(part_starts[:-1], part_starts[1:]):
            yield from decode_pages(table.slice(int(s), int(e - s))).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing to clean up


class ChunkStoreStreamWriter(ChunkStoreWriter, DataSourceStreamArrowWriter):
    """Structured-Streaming sink: ``df.writeStream.format("pysparkenc")``.

    Exactly-once without a transaction log: tasks stage uniquely-named
    files under ``_staging/``; the driver's per-batch ``commit`` renames
    them onto DETERMINISTIC targets ``chunks/stream-b<batch>-<i>.parquet``
    with ``os.replace``. A replayed batch (crash anywhere between write
    and checkpoint advance) re-stages and re-replaces the *same* targets,
    so every (batch, slot) lands exactly once — the same idempotence
    scheme as :mod:`pysparkenc.lineage` keyed by batch_id, pushed down to
    the file layer. Rows of a replayed batch are assumed to land in the
    same task order (Spark replays a batch from the same checkpointed
    offsets and plan).
    """

    def _staging_dir(self) -> str:
        return os.path.join(self.path, "_staging")

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _FileCommit:
        table = self._encode_iterator(iterator)
        if table is None:
            return _FileCommit(())
        os.makedirs(self._staging_dir(), exist_ok=True)
        fname = os.path.join(
            self._staging_dir(), f"stage-{uuid.uuid4().hex}.parquet"
        )
        pq.write_table(table, fname)
        return _FileCommit((fname,))

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        os.makedirs(_chunk_dir(self.path), exist_ok=True)
        staged = [f for m in messages if m for f in m.files]
        for i, f in enumerate(sorted(staged)):
            target = os.path.join(
                _chunk_dir(self.path),
                f"stream-b{batchId:012d}-{i:05d}.parquet",
            )
            os.replace(f, target)
        # a prior attempt of this batch may have committed MORE slots
        # (replay with fewer tasks): clear any leftover higher slots
        i = len(staged)
        while True:
            leftover = os.path.join(
                _chunk_dir(self.path),
                f"stream-b{batchId:012d}-{i:05d}.parquet",
            )
            if not os.path.exists(leftover):
                break
            os.remove(leftover)
            i += 1
        if not os.path.exists(_schema_path(self.path)):
            with open(_schema_path(self.path), "w") as fh:
                json.dump(
                    {"version": FORMAT_VERSION, "schema": self.schema_json},
                    fh,
                )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        for m in messages:
            if m is None:
                continue
            for f in m.files:
                if os.path.exists(f):
                    os.remove(f)


# ---------------------------------------------------------------------------
# the data source
# ---------------------------------------------------------------------------

class ChunkStoreDataSource(DataSource):
    """``format("pysparkenc")`` — see the module docstring."""

    @classmethod
    def name(cls) -> str:
        return "pysparkenc"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError(
                "pysparkenc needs a path: .load(path) / .save(path)"
            )
        return p

    def schema(self) -> StructType:
        return read_store_schema(self._path())

    def reader(self, schema: StructType) -> ChunkStoreReader:
        return ChunkStoreReader(self._path(), schema)

    def streamReader(  # noqa: N802 (Spark API name)
        self, schema: StructType
    ) -> ChunkStoreStreamReader:
        return ChunkStoreStreamReader(self._path(), schema)

    def writer(self, schema: StructType, overwrite: bool) -> ChunkStoreWriter:
        path = self._path()
        sp = _schema_path(path)
        if not overwrite and os.path.exists(sp):
            existing = read_store_schema(path)
            if existing != schema:
                raise ValueError(
                    "append schema does not match existing pysparkenc store: "
                    f"{existing.simpleString()} vs {schema.simpleString()}"
                )
        return ChunkStoreWriter(path, schema, dict(self.options), overwrite)

    def streamWriter(  # noqa: N802 (Spark API name)
        self, schema: StructType, overwrite: bool
    ) -> ChunkStoreStreamWriter:
        return ChunkStoreStreamWriter(
            self._path(), schema, dict(self.options), overwrite
        )


def register(spark) -> None:
    """Idempotently register the ``pysparkenc`` format on a session and
    enable Python-source filter pushdown (off by default in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(ChunkStoreDataSource)
    except Exception:
        pass  # already registered
