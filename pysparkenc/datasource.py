"""``pysparkenc`` as a first-class Spark data source (Python Data Source
API, Spark 4):

    spark.dataSource.register(ChunkStoreDataSource)
    df.write.format("pysparkenc").mode("overwrite").save(path)
    spark.read.format("pysparkenc").load(path).where("id > 100")

On a lineage-managed store (one written by
:func:`pysparkenc.lineage.encode_with_lineage`), BOTH directions speak
the commit protocol: reads plan from committed runs and apply delete
sets (never orphan chunks, never a double-read of a compacted store),
and ``mode("append")`` writes commit a real lineage run — fresh run id,
chunks under ``run_id=<r>/``, atomic lineage append — indistinguishable
from an ``encode_with_lineage`` run. ``mode("overwrite")`` and stream
writes refuse with a typed error naming the supported path.

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
import pyarrow.compute as pc
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
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from . import engine

FORMAT_VERSION = 1
_SCHEMA_FILE = "_pysparkenc_schema.json"
_CHUNK_DIR = "chunks"
_LINEAGE_DIR = "lineage"
_DELETES_DIR = "deletes"


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
# lineage-managed stores (written by pysparkenc.lineage): commit-aware plan
# ---------------------------------------------------------------------------

def _lineage_dir(path: str) -> str:
    return os.path.join(path, _LINEAGE_DIR)


def is_lineage_store(path: str) -> bool:
    """True when ``path`` is a lineage-managed store (written by
    :func:`pysparkenc.lineage.encode_with_lineage`): chunk files live
    under ``chunks/run_id=<r>/`` and visibility is governed by the
    lineage commit records, not by file listing."""
    return os.path.isdir(_lineage_dir(path))


def _list_parquet(d: str) -> list[str]:
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def _lineage_plan(
    path: str, as_of_run: int | None = None
) -> tuple[dict[int, tuple[int, ...]], list[tuple[int, str]]]:
    """Driver-side commit plan for a lineage store, pure pyarrow (no
    SparkSession): the same visibility rules as
    :func:`pysparkenc.lineage.read_committed_chunks` +
    :func:`~pysparkenc.lineage.read_delete_sets`.

    Returns ``(live, deletes)`` where ``live`` maps each run id to its
    committed, unsuperseded part ids (orphan chunks from a crashed
    encode are invisible; a compacted-but-unexpired store contributes
    ONLY the compacted layout — never both) and ``deletes`` lists the
    visible equality-delete runs as ``(del_run_id, key_dir)``. The scan
    is one metadata read of the (tiny, one-row-per-partition) lineage
    records."""
    files = _list_parquet(_lineage_dir(path))
    if not files:
        return {}, []
    cols = ["run_id", "batch_id", "part_id", "status"]
    # unified nullable target: per-file nullability varies with the
    # writer (coalesce(1) commits vs createDataFrame markers)
    target = pa.schema(
        [("run_id", pa.int64()), ("batch_id", pa.int64()),
         ("part_id", pa.int64()), ("status", pa.string())]
    )
    tabs = []
    for f in files:
        avail = pq.read_schema(f).names
        t = pq.read_table(f, columns=[c for c in cols if c in avail])
        if "batch_id" not in t.schema.names:  # pre-batch_id stores
            t = t.append_column(
                "batch_id", pa.array([-1] * t.num_rows, pa.int64())
            )
        tabs.append(t.select(cols).cast(target))
    tab = pa.concat_tables(tabs)
    run = tab.column("run_id").to_numpy()
    part = tab.column("part_id").to_numpy()
    batch = tab.column("batch_id").to_numpy(zero_copy_only=False)
    batch = np.where(np.isnan(batch.astype(np.float64)), -1, batch).astype(
        np.int64
    ) if batch.dtype.kind == "f" else batch.astype(np.int64)
    status = np.asarray(tab.column("status").to_pylist())
    done = status == "done"
    sup = status == "superseded"
    dels = status == "delete"
    if as_of_run is not None:
        done &= run <= int(as_of_run)
        sup &= batch <= int(as_of_run)
        dels &= run <= int(as_of_run)
    done_pairs = set(zip(run[done].tolist(), part[done].tolist()))
    sup_pairs = set(zip(run[sup].tolist(), part[sup].tolist()))
    live_pairs = done_pairs - sup_pairs
    live: dict[int, list[int]] = {}
    for r, p in live_pairs:
        live.setdefault(int(r), []).append(int(p))
    # whole-run supersede markers (part_id = -1) retire materialized
    # delete runs
    sup_del_runs = {int(r) for r, p in sup_pairs if p == -1}
    del_runs = sorted({int(r) for r in run[dels].tolist()} - sup_del_runs)
    deletes = [
        (r, os.path.join(path, _DELETES_DIR, f"run_id={r}"))
        for r in del_runs
    ]
    return {r: tuple(sorted(ps)) for r, ps in live.items()}, deletes


def _recover_store_schema(
    path: str, live: dict[int, tuple[int, ...]]
) -> StructType:
    """Rebuild the logical Spark schema of a lineage store from chunk
    METADATA (the ``col``/``col_idx``/``logical``/``null_count`` columns
    of committed chunk files — payload bytes are never read): the
    driver-side pyarrow twin of :func:`engine.output_schema_of_chunks`,
    sharing its assembly via :func:`engine.assemble_schema_from_meta`.
    Reads every committed file's metadata columns so schema evolution
    (a later run adding a column) is honored."""
    if not live:
        raise ValueError(
            f"lineage store at {path} has no committed data runs — "
            "nothing to infer a schema from"
        )
    agg: dict[str, dict] = {}
    groups: set[tuple[int, int, int]] = set()
    for r, parts in sorted(live.items()):
        pset = set(parts)
        d = os.path.join(_chunk_dir(path), f"run_id={r}")
        for f in _list_parquet(d):
            t = pq.read_table(
                f, columns=["col", "col_idx", "logical", "null_count",
                            "part_id", "chunk_id"]
            )
            pid = t.column("part_id").to_numpy()
            keep = np.isin(pid, np.asarray(sorted(pset), np.int64))
            if not keep.any():
                continue
            t = t.filter(pa.array(keep))
            col = t.column("col").to_pylist()
            idx = t.column("col_idx").to_numpy()
            logical = t.column("logical").to_pylist()
            nc = t.column("null_count").to_numpy(zero_copy_only=False)
            pid = t.column("part_id").to_numpy()
            cid = t.column("chunk_id").to_numpy()
            groups.update(
                (r, int(p), int(g)) for p, g in zip(pid, cid)
            )
            for c, i, lg, n in zip(col, idx, logical, nc):
                base = c[:-4] if c.endswith("#def") else None
                if "#" in c and not (base is not None and "#" not in base):
                    continue  # nested reassembly side chunks
                n = 0 if n is None or (isinstance(n, float) and np.isnan(n)) \
                    else int(n)
                cur = agg.get(c)
                if cur is None:
                    agg[c] = {"col": c, "col_idx": int(i), "logical": lg,
                              "nc": n, "ng": 1}
                else:
                    cur["nc"] = max(cur["nc"], n)
                    # one chunk row per (part, chunk) group per column:
                    # the occurrence count = groups carrying the column
                    # (schema evolution's nullability signal)
                    cur["ng"] += 1
    meta = sorted(agg.values(), key=lambda m: m["col_idx"])
    return engine.assemble_schema_from_meta(meta,
                                            total_groups=len(groups))


def _delete_drop_mask(
    out: pa.Table, keys: pa.Table
) -> pa.BooleanArray | None:
    """Boolean mask over ``out``'s rows: True where the row's key tuple
    appears in ``keys`` (null-safe: a NULL key retracts NULL-keyed
    rows — the same eqNullSafe semantics as
    :func:`pysparkenc.lineage.apply_deletes`). Returns None when no row
    matches. Single-column keys match exactly via ``is_in``;
    multi-column keys compare a LENGTH-PREFIXED byte composite
    (``<len>:<bytes>`` per field, ``N`` for NULL, concatenated) — each
    field is self-delimiting, so the encoding is injective for ANY
    value content: a key value containing a would-be separator byte
    cannot alias across column boundaries the way a plain joined
    composite could. Key columns are cast to the row columns' types
    first so numeric string forms agree."""
    kcols = keys.schema.names
    if len(kcols) == 1:
        c = kcols[0]
        col = out.column(c)
        kv = keys.column(c).combine_chunks()
        has_null_key = kv.null_count > 0
        vs = kv.drop_null().unique()
        if col.type != vs.type:
            vs = vs.cast(col.type)
        m = pc.fill_null(pc.is_in(col, value_set=vs), False)
        if has_null_key:
            m = pc.or_(m, pc.is_null(col))
    else:
        out_types = {c: out.column(c).type for c in kcols}

        def _enc_field(v: pa.ChunkedArray, target: pa.DataType) -> pa.ChunkedArray:
            if v.type != target:
                v = pc.cast(v, target)
            if not (pa.types.is_large_binary(v.type)
                    or pa.types.is_binary(v.type)
                    or pa.types.is_large_string(v.type)
                    or pa.types.is_string(v.type)):
                v = pc.cast(v, pa.string())
            v = pc.cast(v, pa.large_binary())
            ln = pc.cast(
                pc.cast(pc.binary_length(v), pa.string()), pa.large_binary()
            )
            colon = pa.scalar(b":", pa.large_binary())
            enc = pc.binary_join_element_wise(ln, v, colon)  # "<len>:<bytes>"
            return pc.fill_null(enc, b"N")  # 'N' never parses as <digit>

        def composite(t: pa.Table) -> pa.Array:
            parts = [_enc_field(t.column(c).combine_chunks(), out_types[c])
                     for c in kcols]
            if len(parts) == 1:
                return parts[0]
            return pc.binary_join_element_wise(
                *parts, pa.scalar(b"", pa.large_binary())
            )

        vs = pc.unique(composite(keys))
        m = pc.fill_null(pc.is_in(composite(out), value_set=vs), False)
    m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
    return m if pc.any(m).as_py() else None


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
    scalar columns participate (nested predicates stay Spark-side).
    ``Not`` unwraps for ``IsNull`` (-> not-null prune); other negations
    and disjunctions never arrive — the Python Data Source filter API
    (pyspark.sql.datasource) defines no ``Or`` class, so Spark keeps OR
    trees on its side and re-applies them after our scan."""
    scalar = {
        f.name
        for f in schema.fields
        if f.dataType.typeName()
        not in ("struct", "array", "map")
    }
    out: list[_Pushed] = []
    for f in filters:
        if isinstance(f, Not):
            inner = f.child
            if isinstance(inner, IsNull):
                f = IsNotNull(attribute=inner.attribute)
            else:
                continue  # NOT(eq/in/...) can't prove a group empty
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1 or attr[0] not in scalar:
            continue
        c = attr[0]
        if isinstance(f, IsNull):
            out.append(_Pushed(c, "isnull"))
        elif isinstance(f, EqualTo) or (
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
    if p.kind == "isnull":
        # IS NULL can only match a group that recorded some nulls
        nc = d["null_count"]
        return nc is None or nc > 0
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


def _bin_pack(files: list[str], target: int = 32 << 20) -> list[tuple[str, ...]]:
    """Bin-pack small files into byte-targeted read partitions: each
    partition costs a Python worker round-trip, so a store left by many
    streaming micro-batches (hundreds of tiny chunk files) must not pay
    it per FILE. Compacted stores with ~target-sized files get one file
    per partition — full parallelism either way."""
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
    return groups


class ChunkStoreReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType,
                 options: dict | None = None):
        if not path:
            raise ValueError("pysparkenc reader needs a path")
        self.path = path
        self.user_schema = schema
        self.pushed: list[_Pushed] = []
        options = options or {}
        aor = options.get("as_of_run")
        self.as_of_run = int(aor) if aor is not None else None
        # Lineage-managed stores (written by pysparkenc.lineage): the
        # file listing is NOT the table — visibility is governed by the
        # commit records. Plan from committed runs, skip superseded
        # layouts (a compacted-but-unexpired store is read exactly once)
        # and apply equality-delete sets, so this read path and
        # read_store can never disagree on a maintained store.
        self.lineage = is_lineage_store(path)
        self.live: dict[int, tuple[int, ...]] = {}
        self.deletes: list[tuple[int, str, tuple[str, ...]]] = []
        self._key_tabs: dict[int, pa.Table] = {}  # executor-side cache
        self._decoder = None  # executor-side _group_decoder cache
        self._widened: tuple[StructType, list[str]] | None = None
        if self.lineage:
            live, dels = _lineage_plan(path, self.as_of_run)
            self.live = live
            for run_id, key_dir in dels:
                kf = _list_parquet(key_dir)
                if not kf:  # unreadable committed delete: fail loudly
                    raise ValueError(
                        f"delete run {run_id} of lineage store {path} has "
                        "no key files — store is corrupt (expire_runs "
                        "removes key dirs only after supersede)"
                    )
                self.deletes.append(
                    (run_id, key_dir, tuple(pq.read_schema(kf[0]).names))
                )
            # widen ONCE, driver-side: when a delete key column falls
            # outside the read schema this consults every committed
            # file's metadata (_recover_store_schema) — doing it per
            # chunk file turned a pruned scan into O(files^2) I/O.
            # Only when live data runs exist: a store holding deletes
            # but no data has no schema to recover AND nothing to read
            # (partitions() yields one empty partition), so the read
            # must stay an empty DataFrame, not a load-time error.
            if self.live:
                self._widened = self._widened_schema()
        elif self.as_of_run is not None:
            raise ValueError(
                "as_of_run is only meaningful on a lineage-managed store "
                f"(no lineage/ dir under {path})"
            )

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        self.pushed = _to_pushed(filters, self.user_schema)
        # return every filter: Spark re-applies them all, so our pruning
        # is an optimization with unconditional correctness
        return iter(filters)

    def partitions(self) -> list[InputPartition]:
        if self.lineage:
            parts: list[InputPartition] = []
            for r in sorted(self.live):
                run_dir = os.path.join(_chunk_dir(self.path), f"run_id={r}")
                # bin-pack within a run only: delete sequencing is
                # per-run (a file's writing run comes from its dir)
                for g in _bin_pack(_list_parquet(run_dir)):
                    parts.append(InputPartition(("L", r, g)))
            return parts or [InputPartition(None)]
        groups = _bin_pack(_list_chunk_files(self.path))
        # zero files: one empty partition so the scan yields an empty
        # DataFrame instead of failing
        return [InputPartition(g) for g in groups] or [InputPartition(None)]

    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        val = partition.value
        if isinstance(val, tuple) and len(val) == 3 and val[0] == "L":
            _, run_id, files = val
            for f in files:
                yield from self._read_lineage_file(f, int(run_id))
            return
        files = (val,) if isinstance(val, str) else val
        for f in files:
            yield from self._read_file(f)

    # -- lineage-store read path ------------------------------------------

    def _widened_schema(self) -> tuple[StructType, list[str]]:
        """User projection widened with every delete key column (the
        anti-membership filter needs them decoded even when the
        projection drops them), plus the key columns' field types
        recovered from the store. Returns (decode_schema, user_cols)."""
        have = {f.name for f in self.user_schema.fields}
        need = [
            c
            for _, _, kcols in self.deletes
            for c in kcols
            if c not in have
        ]
        if not need:
            return self.user_schema, [f.name for f in self.user_schema.fields]
        store = _recover_store_schema(self.path, self.live)
        extra = [f for f in store.fields if f.name in set(need)]
        missing = set(need) - {f.name for f in extra}
        if missing:
            raise ValueError(
                f"delete key column(s) {sorted(missing)} not present in "
                f"store schema — store at {self.path} is corrupt"
            )
        return (
            StructType(list(self.user_schema.fields) + extra),
            [f.name for f in self.user_schema.fields],
        )

    def _keys_for(self, run_id: int) -> list[tuple[int, pa.Table]]:
        """Key tables of delete runs that apply to rows written by
        ``run_id`` (Iceberg sequencing: ``del_run > row_run``), loaded
        once per task and cached."""
        out = []
        for del_run, key_dir, _ in self.deletes:
            if del_run <= run_id:
                continue
            t = self._key_tabs.get(del_run)
            if t is None:
                t = pq.read_table(key_dir)
                self._key_tabs[del_run] = t
            out.append((del_run, t))
        return out

    def _read_lineage_file(self, path: str, run_id: int):
        # set in __init__ for every store with live runs — the only
        # callers are partitions planned FROM self.live; falling back
        # to a per-file recompute here would silently reintroduce the
        # O(files^2) recovery, so fail loudly instead
        assert self._widened is not None, "reader widened schema unset"
        decode_schema, user_cols = self._widened
        allowed: set[str] = set()
        for f in decode_schema.fields:
            allowed |= engine._subtree_chunk_names(f.name, f.dataType)
        live_pids = list(self.live.get(run_id, ()))
        # DNF filters: (requested columns OR the col_idx-0 anchor chunk)
        # AND committed partitions only (orphan part ids from a crashed
        # encode never decode). The anchor term mirrors decode_table's
        # schema-evolution rule (engine.py): a group written before
        # EVERY requested column existed must still decode — as
        # all-null rows — so one chunk per group must survive to carry
        # its row count; col_idx 0 exists in every group.
        table = pq.read_table(
            path,
            filters=[
                [("col", "in", sorted(allowed)),
                 ("part_id", "in", live_pids)],
                [("col_idx", "==", 0),
                 ("part_id", "in", live_pids)],
            ],
        )
        if table.num_rows == 0:
            return
        # blank unrequested anchor payloads (metadata-only carriers),
        # exactly like decode_table's anchor handling
        req = pc.is_in(table.column("col"),
                       value_set=pa.array(sorted(allowed), pa.string()))
        if not pc.all(req).as_py():
            blank_data = pc.if_else(
                req, table.column("data"),
                pa.scalar(None, table.schema.field("data").type),
            )
            blank_aux = pc.if_else(
                req, table.column("aux"),
                pa.scalar(None, table.schema.field("aux").type),
            )
            table = table.set_column(
                table.schema.get_field_index("data"), "data", blank_data
            ).set_column(
                table.schema.get_field_index("aux"), "aux", blank_aux
            )
        if self._decoder is None:  # once per task, not per file
            self._decoder = engine._group_decoder(decode_schema)
        decode_pages = self._decoder
        pid = table.column("part_id").to_numpy()
        cid = table.column("chunk_id").to_numpy()
        order = np.lexsort((cid, pid))
        table = table.take(pa.array(order))
        pid, cid = pid[order], cid[order]
        keys = pid * (int(cid.max()) + 1 if cid.size else 1) + cid
        group_starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(keys)) + 1, [keys.size]]
        )
        dels = self._keys_for(run_id)
        for s, e in zip(group_starts[:-1], group_starts[1:]):
            if self.pushed:
                meta_rows = self._group_meta(table, int(s), int(e))
                if not all(
                    _group_passes(meta_rows, p) for p in self.pushed
                ):
                    continue
            out = decode_pages(table.slice(int(s), int(e - s)))
            for _, keys_tab in dels:
                mask = _delete_drop_mask(out, keys_tab)
                if mask is not None:
                    out = out.filter(pc.invert(mask))
            if out.num_rows:
                yield from out.select(user_cols).to_batches()

    def _group_meta(self, table: pa.Table, s: int, e: int) -> dict:
        wanted = ["col", "codec", "dtype", "logical", "n_rows",
                  "null_count", "n_unique", "num_min", "num_max",
                  "extra", "aux", "bloom"]
        present = set(table.schema.names)
        sl = table.slice(s, e - s)
        cols = {
            c: (sl.column(c).to_pylist() if c in present
                else [None] * sl.num_rows)
            for c in wanted
        }
        return {
            cols["col"][j]: {c: cols[c][j] for c in cols}
            for j in range(sl.num_rows)
        }

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
    # lineage mode: (part_id, n_rows, n_values, plain_bytes, enc_bytes,
    # n_chunks, wall_sec) for the task's lineage row
    lineage_row: tuple | None = None


def _lineage_max_run(path: str) -> int:
    """Highest run id in the lineage records (0 when empty) — pure
    pyarrow, driver-side, so the writer can allocate without a
    SparkSession round-trip."""
    hi = 0
    for f in _list_parquet(_lineage_dir(path)):
        col = pq.read_table(f, columns=["run_id"]).column("run_id")
        if len(col):
            hi = max(hi, pc.max(col).as_py() or 0)
    return int(hi)


def _lineage_done_parts(path: str, run_id: int) -> tuple[list[int], int]:
    """(distinct done part ids, done row count) for ``run_id`` — the
    driver-side collision probe the post-commit single-writer check
    reads (mirrors :func:`pysparkenc.lineage.encode_with_lineage`)."""
    parts: list[int] = []
    n = 0
    for f in _list_parquet(_lineage_dir(path)):
        t = pq.read_table(f, columns=["run_id", "part_id", "status"])
        mask = pc.and_(
            pc.equal(t.column("run_id"), run_id),
            pc.equal(t.column("status"), "done"),
        )
        sel = t.filter(mask)
        n += sel.num_rows
        parts.extend(int(p) for p in sel.column("part_id").to_pylist())
    return sorted(set(parts)), n


_LINEAGE_PA_SCHEMA = pa.schema(
    [
        ("run_id", pa.int64()),
        ("batch_id", pa.int64()),
        ("part_id", pa.int64()),
        ("n_rows", pa.int64()),
        ("n_values", pa.int64()),
        ("plain_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("n_chunks", pa.int64()),
        ("wall_sec", pa.float64()),
        ("status", pa.string()),
    ]
)


def _append_lineage_rows(path: str, rows: list[tuple]) -> None:
    """Atomic single-file lineage append: write to a dot-prefixed temp
    name (invisible to parquet dir readers) and ``os.replace`` onto the
    final name — the same all-or-nothing commit-record contract as
    ``encode_with_lineage``'s ``coalesce(1)`` append."""
    t = pa.Table.from_pylist(
        [dict(zip(_LINEAGE_PA_SCHEMA.names, r)) for r in rows],
        schema=_LINEAGE_PA_SCHEMA,
    )
    d = _lineage_dir(path)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    pq.write_table(t, tmp)
    os.replace(
        tmp, os.path.join(d, f"part-dsw-{uuid.uuid4().hex}.parquet")
    )


class ChunkStoreWriter(DataSourceArrowWriter):
    def __init__(self, path: str, schema: StructType, options: dict,
                 overwrite: bool, lineage_run_id: int | None = None):
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
        # lineage mode (append to a lineage-managed store): the run id
        # was allocated driver-side by ChunkStoreDataSource.writer(),
        # which also claimed chunks/run_id=<r> on disk so a crashed job
        # can never have its id reused (the never-reuse invariant
        # _next_run_id enforces; vacuum_store reclaims the debris)
        self.lineage_run_id = lineage_run_id
        # captured at job start (driver): the files an overwrite replaces
        self.previous_files = (
            tuple(_list_chunk_files(path)) if lineage_run_id is None else ()
        )
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

        t0 = time.time()
        table = self._encode_iterator(iterator)
        if table is None:
            return _FileCommit(())
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        if self.lineage_run_id is not None:
            # stage-then-publish: the task writes under _staging/ and
            # only commit() renames into the run dir, so a task retried
            # mid-write can never leave a half-written or duplicate file
            # inside a run that then COMMITS (the flat layout tolerates
            # list-time debris; a committed lineage run must not)
            staging = os.path.join(self.path, "_staging")
            os.makedirs(staging, exist_ok=True)
            fname = os.path.join(
                staging, f"stage-{pid:05d}-{uuid.uuid4().hex}.parquet"
            )
            pq.write_table(table, fname)
            # lineage metrics, mirroring encode_with_lineage's per-part
            # aggregation: every column-chunk row of one page group
            # shares n_rows, so rows = sum of one n_rows per chunk_id
            cids = table.column("chunk_id").to_numpy()
            _, first = np.unique(cids, return_index=True)
            n_rows = int(table.column("n_rows").to_numpy()[first].sum())
            row = (
                pid, n_rows,
                int(pc.sum(table.column("n_values")).as_py() or 0),
                int(pc.sum(table.column("plain_bytes")).as_py() or 0),
                int(pc.sum(table.column("enc_bytes")).as_py() or 0),
                table.num_rows, time.time() - t0,
            )
            return _FileCommit((fname,), row)
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
        if self.lineage_run_id is not None:
            self._commit_lineage(messages)
            return
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

    def _commit_lineage(self, messages) -> None:
        """Publish staged files into ``chunks/run_id=<r>/`` and append
        the run's lineage rows as ONE atomically-renamed file — the
        same chunks-first-then-lineage commit protocol as
        :func:`pysparkenc.lineage.encode_with_lineage`: a crash before
        the lineage rename leaves only invisible orphans."""
        run_id = int(self.lineage_run_id)
        run_dir = os.path.join(_chunk_dir(self.path), f"run_id={run_id}")
        rows = [m.lineage_row for m in messages if m and m.lineage_row]
        staged = [f for m in messages if m for f in m.files]
        if not staged:
            # nothing landed: withdraw the claimed (empty) run dir
            try:
                os.rmdir(run_dir)
            except OSError:
                pass
            return
        os.makedirs(run_dir, exist_ok=True)
        for f in staged:
            os.replace(f, os.path.join(run_dir, os.path.basename(f)
                                       .replace("stage-", "part-", 1)))
        _append_lineage_rows(
            self.path,
            [(run_id, -1, p, nr, nv, pb, eb, nc, w, "done")
             for (p, nr, nv, pb, eb, nc, w) in rows],
        )
        # post-commit single-writer check (same contract as
        # encode_with_lineage): a racing committer on the same run id
        # interleaved its files under this run dir — quarantine the
        # mixed run so readers stop seeing it, then fail loudly
        parts, committed = _lineage_done_parts(self.path, run_id)
        if committed != len(rows):
            _append_lineage_rows(
                self.path,
                [(run_id, run_id, p, 0, 0, 0, 0, 0, 0.0, "superseded")
                 for p in parts],
            )
            raise RuntimeError(
                f"concurrent commit detected on run {run_id}: {committed} "
                f"lineage rows landed where this writer appended "
                f"{len(rows)}. Run {run_id} has been quarantined — stores "
                "are single-writer; re-run the write, which will commit "
                "under a fresh run id."
            )
        from .lineage import _record_run_schema

        _record_run_schema(
            self.path, run_id, StructType(list(self.fields))
        )

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for f in m.files:
                if os.path.exists(f):
                    os.remove(f)
        if self.lineage_run_id is not None:
            # withdraw the claimed run dir if nothing was published to
            # it (a later retry of the job allocates a fresh id anyway)
            try:
                os.rmdir(os.path.join(
                    _chunk_dir(self.path), f"run_id={self.lineage_run_id}"
                ))
            except OSError:
                pass


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
        p = self._path()
        if not os.path.exists(_schema_path(p)) and is_lineage_store(p):
            # lineage stores carry no schema sidecar — recover it from
            # committed chunk metadata (driver-side, payload-free)
            aor = self.options.get("as_of_run")
            live, _ = _lineage_plan(p, int(aor) if aor is not None else None)
            return _recover_store_schema(p, live)
        return read_store_schema(p)

    def reader(self, schema: StructType) -> ChunkStoreReader:
        return ChunkStoreReader(self._path(), schema, dict(self.options))

    def streamReader(  # noqa: N802 (Spark API name)
        self, schema: StructType
    ) -> ChunkStoreStreamReader:
        p = self._path()
        if is_lineage_store(p):
            # the streaming tail's offset domain is the flat file-name
            # watermark — it cannot express commit visibility (orphan
            # chunks, supersede, deletes). Refuse rather than tail
            # uncommitted files.
            raise ValueError(
                f"{p} is a lineage-managed store; streaming reads must go "
                "through pysparkenc.lineage (read_store per snapshot / "
                "as_of_run), not readStream.format('pysparkenc')"
            )
        return ChunkStoreStreamReader(p, schema)

    def writer(self, schema: StructType, overwrite: bool) -> ChunkStoreWriter:
        path = self._path()
        if is_lineage_store(path):
            return self._lineage_writer(path, schema, overwrite)
        sp = _schema_path(path)
        if not overwrite and os.path.exists(sp):
            existing = read_store_schema(path)
            if existing != schema:
                raise ValueError(
                    "append schema does not match existing pysparkenc store: "
                    f"{existing.simpleString()} vs {schema.simpleString()}"
                )
        return ChunkStoreWriter(path, schema, dict(self.options), overwrite)

    def _lineage_writer(
        self, path: str, schema: StructType, overwrite: bool
    ) -> ChunkStoreWriter:
        """Append to a lineage-managed store AS a lineage commit: a
        fresh run id (never reusing a disk-occupied one), chunks under
        ``chunks/run_id=<r>/``, and the per-partition lineage rows
        appended atomically at job commit — so write.format() and
        encode_with_lineage produce indistinguishable runs and neither
        read path can ever disagree about them."""
        if overwrite:
            raise ValueError(
                f"{path} is a lineage-managed store; mode('overwrite') "
                "would bypass its snapshot history — append here, or "
                "rewrite through pysparkenc.lineage (compact_store / "
                "delete_rows / upsert_rows)"
            )
        # schema evolution contract (same rule as encode_with_lineage):
        # a run may ADD or OMIT columns, but a shared column must keep
        # its logical type, or the union schema decodes chunks under the
        # wrong kernel
        live, _dels = _lineage_plan(path)
        if live:
            existing = _recover_store_schema(path, live)
            by_name = {f.name: f for f in existing.fields}
            for f in schema.fields:
                old = by_name.get(f.name)
                if old is None:
                    continue
                if engine._logical_of(old) != engine._logical_of(f):
                    raise ValueError(
                        f"schema evolution cannot change column "
                        f"'{f.name}' from {old.dataType.simpleString()} to "
                        f"{f.dataType.simpleString()} — add a new column "
                        "instead"
                    )
        from .lineage import _on_disk_run_ids

        run_id = max(_lineage_max_run(path),
                     max(_on_disk_run_ids(path), default=0)) + 1
        # claim the id on disk NOW: a job crashed before commit leaves
        # an empty/orphan dir, which _next_run_id treats as occupied
        os.makedirs(
            os.path.join(path, _CHUNK_DIR, f"run_id={run_id}"),
            exist_ok=True,
        )
        return ChunkStoreWriter(
            path, schema, dict(self.options), overwrite,
            lineage_run_id=run_id,
        )

    def streamWriter(  # noqa: N802 (Spark API name)
        self, schema: StructType, overwrite: bool
    ) -> ChunkStoreStreamWriter:
        p = self._path()
        self._check_not_lineage(p)
        return ChunkStoreStreamWriter(p, schema, dict(self.options), overwrite)

    @staticmethod
    def _check_not_lineage(path: str) -> None:
        if is_lineage_store(path):
            # the flat stream sink's file-name idempotence scheme cannot
            # express lineage commits; the supported streaming path into
            # a lineage store is foreachBatch + encode_with_lineage
            # (batch_id=), which is exactly-once by construction
            raise ValueError(
                f"{path} is a lineage-managed store; stream writes must go "
                "through foreachBatch + pysparkenc.lineage."
                "encode_with_lineage(batch_id=batch_id), not "
                "writeStream.format('pysparkenc')"
            )


def register(spark) -> None:
    """Idempotently register the ``pysparkenc`` format on a session and
    enable Python-source filter pushdown (off by default in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(ChunkStoreDataSource)
    except Exception:
        pass  # already registered
