"""Deterministic synthetic token tables (FIXTURES.md §A).

The BASELINE.json ``input_hint`` table shape: ``(doc_id string,
tokens array<int32>, n_tok int32, source string)``, seed-fixed, with
per-row token profiles chosen so every codec wins somewhere.  Generated
*distributed* (one mapInArrow pass over a range frame) so bench-scale
tables never sit on the driver.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

SOURCES = [
    "web", "books", "code", "wiki", "news", "forum",
    "papers", "legal", "social", "mail", "chat", "docs",
]
# Zipf(s=1.3)-ish weights over the 12 sources (skewed key, FIXTURES.md §A)
_W = np.array([1.0 / (k ** 1.3) for k in range(1, len(SOURCES) + 1)])
_W /= _W.sum()

_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"
_PA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _tokens_for(i: int, n: int, rng: np.random.Generator) -> np.ndarray:
    profile = i % 6
    if profile == 0:  # uniform_wide -> PLAIN
        return rng.integers(0, 2**31, size=n, dtype=np.int64).astype(np.int32)
    if profile == 1:  # low_card Zipf -> dict + RLE codes
        ranks = rng.zipf(1.7, size=n) % 1000
        return ranks.astype(np.int32)
    if profile == 2:  # runs -> RLE
        nruns = max(1, n // 50)
        vals = rng.integers(0, 500, size=nruns, dtype=np.int64)
        lens = rng.geometric(1 / 50, size=nruns)
        out = np.repeat(vals, lens)[:n]
        if out.size < n:
            out = np.pad(out, (0, n - out.size), constant_values=int(vals[-1]))
        return out.astype(np.int32)
    if profile == 3:  # sorted_inc -> DELTA_BINARY_PACKED
        return np.cumsum(rng.integers(0, 7, size=n, dtype=np.int64)).astype(
            np.int32
        )
    if profile == 4:  # small_range -> bit-packing at odd widths
        k = (1, 3, 5, 9)[i % 4]
        return rng.integers(0, 2**k, size=n, dtype=np.int64).astype(np.int32)
    # adversarial: near-INT32_MIN jumps, runs of exactly 7/8, >504 runs
    base = np.empty(n, dtype=np.int32)
    half = n // 2
    alt = np.tile(
        np.array([-(2**31) + 7, 2**31 - 5], dtype=np.int32), half // 2 + 1
    )
    base[:half] = alt[:half]
    rest = np.concatenate(
        [np.full(7, 3, np.int32), np.full(8, 4, np.int32),
         np.full(505, 5, np.int32)]
    )
    reps = np.tile(rest, n // rest.size + 1)
    base[half:] = reps[: n - half]
    return base


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — per-row randomness as a pure function of the
    row index, so the generated table is identical at any parallelism /
    Arrow batch size (required for the N-vs-4N scaling comparison)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _gen_batch(ids: np.ndarray, seed: int) -> pa.RecordBatch:
    count = ids.size
    h1 = _splitmix64(ids + np.uint64(seed) * np.uint64(0x100000001))
    h2 = _splitmix64(h1)
    u1 = (h1 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u2 = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    src_idx = np.searchsorted(np.cumsum(_W), u1).clip(0, len(SOURCES) - 1)
    # lognormal(4.0, 0.8) via Box-Muller on hashed uniforms
    normal = np.sqrt(-2.0 * np.log(np.maximum(u2, 1e-300))) * np.cos(
        2 * np.pi * u1
    )
    n_tok = np.clip(np.round(np.exp(4.0 + 0.8 * normal)), 8, 4096).astype(
        np.int32
    )
    doc_ids = []
    flat = []
    for j in range(count):
        i = int(ids[j])
        doc_ids.append(f"{SOURCES[src_idx[j]]}-{i:012d}")
        rng = np.random.default_rng(np.uint64(seed) * np.uint64(2654435761) + np.uint64(i))
        flat.append(_tokens_for(i, int(n_tok[j]), rng))
    values = np.concatenate(flat) if flat else np.zeros(0, np.int32)
    offsets = np.zeros(count + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(values, pa.int32())
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_ids, pa.string()),
            tokens,
            pa.array(n_tok, pa.int32()),
            pa.array([SOURCES[k] for k in src_idx], pa.string()),
        ],
        schema=_PA_SCHEMA,
    )


def make_tokens_table(
    spark: SparkSession, n_rows: int, *, seed: int = 42, slices: int | None = None
) -> DataFrame:
    """Distributed deterministic generator: same (seed, n_rows) -> same table
    regardless of parallelism (each row's randomness is keyed by its index)."""
    if slices is None:
        slices = max(1, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_rows, 1, slices).selectExpr("id")

    def gen(batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0).to_numpy()
            if ids.size == 0:
                continue
            yield _gen_batch(ids.astype(np.uint64), seed)

    return base.mapInArrow(gen, _SCHEMA)
