"""Training-pipeline operators: deterministic sampling + sequence packing.

The contract oracles (`stratified_sample`, `pack_sequences` in
__spark_entry__) pin Spark-vs-DuckDB value equality; these tests pin the
semantics the oracle can't see: determinism across parallelism, exact
reconstruction of the token stream, shard independence, drop_last.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkenc.pipeline import pack_sequences, stratified_sample
from pysparkenc.synth import make_tokens_table

N_DOCS = 400


@pytest.fixture()
def tokens_df(spark):
    df = make_tokens_table(spark, N_DOCS, seed=13)
    df.cache().count()
    yield df
    df.unpersist()


def test_sample_is_deterministic_and_stratified(spark, tokens_df):
    rates = {"web": 1_000_000, "books": 0}
    s1 = stratified_sample(tokens_df, rates, default_ppm=300_000)
    s2 = stratified_sample(tokens_df.repartition(17), rates,
                           default_ppm=300_000)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2  # layout-independent, unlike df.sample
    by_src = dict(
        s1.groupBy("source").count().collect()
        and [(r["source"], r["count"]) for r in s1.groupBy("source").count().collect()]
    )
    n_web = tokens_df.where(F.col("source") == "web").count()
    assert by_src.get("web", 0) == n_web  # ppm=1e6 keeps everything
    assert "books" not in by_src  # ppm=0 drops everything
    # default strata land near 30% (binomial, loose bound)
    others = tokens_df.where(~F.col("source").isin("web", "books")).count()
    kept = sum(v for k, v in by_src.items() if k not in ("web", "books"))
    assert 0.15 * others < kept < 0.45 * others


def test_sample_salt_draws_independent_sample(spark, tokens_df):
    a = {r["doc_id"] for r in
         stratified_sample(tokens_df, {}, default_ppm=500_000,
                           salt="a").select("doc_id").collect()}
    b = {r["doc_id"] for r in
         stratified_sample(tokens_df, {}, default_ppm=500_000,
                           salt="b").select("doc_id").collect()}
    assert a != b
    assert 0.3 < len(a) / N_DOCS < 0.7


def _stream(rows, group):
    """Reference packing: concatenate in doc_id order, pure Python."""
    out = []
    for r in sorted((r for r in rows if r["source"] == group),
                    key=lambda r: r["doc_id"]):
        out.extend(r["tokens"])
    return out


def test_pack_reconstructs_the_stream_exactly(spark, tokens_df):
    L = 128
    packed = pack_sequences(tokens_df, L, order_col="doc_id",
                            group_cols=("source",))
    rows = tokens_df.select("source", "doc_id", "tokens").collect()
    got = packed.collect()
    for src in {r["source"] for r in rows}:
        want = _stream(rows, src)
        seqs = sorted((r for r in got if r["source"] == src),
                      key=lambda r: r["seq_id"])
        assert [r["seq_id"] for r in seqs] == list(range(len(seqs)))
        flat = [t for r in seqs for t in r["seq_tokens"]]
        assert flat == want
        assert all(r["n_tok"] == L for r in seqs[:-1])
        assert 0 < seqs[-1]["n_tok"] <= L


def test_pack_is_parallelism_invariant(spark, tokens_df):
    L = 96
    a = pack_sequences(tokens_df, L).collect()
    b = pack_sequences(tokens_df.repartition(23), L).collect()
    ka = {(r["source"], r["seq_id"]): list(r["seq_tokens"]) for r in a}
    kb = {(r["source"], r["seq_id"]): list(r["seq_tokens"]) for r in b}
    assert ka == kb


def test_pack_drop_last_keeps_only_full_sequences(spark, tokens_df):
    L = 256
    full = pack_sequences(tokens_df, L)
    trimmed = pack_sequences(tokens_df, L, drop_last=True)
    assert trimmed.where(F.col("n_tok") != L).count() == 0
    n_partial = full.where(F.col("n_tok") < L).count()
    assert trimmed.count() == full.count() - n_partial


def test_pack_shards_partition_the_stream(spark, tokens_df):
    L = 64
    sharded = pack_sequences(tokens_df, L, shards=4)
    assert "pack_shard" in sharded.columns
    assert sharded.select("pack_shard").distinct().count() == 4
    # every token of every doc still lands exactly once
    total = tokens_df.select(
        F.sum(F.size("tokens")).alias("n")).collect()[0]["n"]
    packed_total = sharded.select(F.sum("n_tok").alias("n")).collect()[0]["n"]
    assert packed_total == total
    # shard assignment is deterministic per doc -> invariant across layouts
    again = pack_sequences(tokens_df.repartition(9), L, shards=4)
    ka = {(r["source"], r["pack_shard"], r["seq_id"]): list(r["seq_tokens"])
          for r in sharded.collect()}
    kb = {(r["source"], r["pack_shard"], r["seq_id"]): list(r["seq_tokens"])
          for r in again.collect()}
    assert ka == kb


def test_pack_doc_starts_mark_segment_boundaries(spark, tokens_df):
    L = 128
    packed = pack_sequences(tokens_df, L).collect()
    rows = tokens_df.select("source", "doc_id", "tokens").collect()
    # pure-Python reference: per source, doc offsets in the concat stream
    for src in {r["source"] for r in rows}:
        docs = sorted((r for r in rows if r["source"] == src),
                      key=lambda r: r["doc_id"])
        spans, off = [], 0
        for r in docs:
            if r["tokens"]:
                spans.append((off, off + len(r["tokens"])))
                off += len(r["tokens"])
        want: dict[int, list[int]] = {}
        for st, en in spans:
            for sid in range(st // L, (en - 1) // L + 1):
                want.setdefault(sid, []).append(max(st, sid * L) - sid * L)
        got = {r["seq_id"]: sorted(r["doc_starts"])
               for r in packed if r["source"] == src}
        assert got == {k: sorted(v) for k, v in want.items()}
        # every sequence starts a segment at 0 (continuation or fresh doc)
        assert all(min(v) == 0 for v in got.values())


def test_pack_randomized_against_python_reference(spark):
    """Seeded randomized shapes (empty docs, tiny/huge seq_len, single
    doc, doc >> seq_len) vs a pure-Python packer."""
    import numpy as np

    rng = np.random.default_rng(99)
    for trial in range(4):
        n_docs = int(rng.integers(1, 40))
        seq_len = int(rng.integers(1, 50))
        rows = []
        for i in range(n_docs):
            n = int(rng.integers(0, 120))  # 0 => doc dropped by packer
            toks = [int(t) for t in rng.integers(0, 1000, n)]
            rows.append((f"d{i:04d}", toks, len(toks), f"s{int(rng.integers(0, 3))}"))
        df = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int, source string"
        )
        got = {
            (r["source"], r["seq_id"]): list(r["seq_tokens"])
            for r in pack_sequences(df, seq_len).collect()
        }
        want = {}
        for src in {r[3] for r in rows}:
            stream = []
            for r in sorted(rows, key=lambda r: r[0]):
                if r[3] == src:
                    stream.extend(r[1])
            for sid in range((len(stream) + seq_len - 1) // seq_len):
                want[(src, sid)] = stream[sid * seq_len:(sid + 1) * seq_len]
        assert got == want, (trial, n_docs, seq_len)


def test_pack_auto_shards_split_hot_groups(spark, tokens_df):
    """shards="auto" (the default) derives ceil(group_tokens /
    tokens_per_shard) deterministic hash sub-streams per group — the
    skew defusal VERDICT r3 flagged: an unsharded hot source would
    serialize its whole token stream through one window-sort task."""
    L = 64
    T = 2_000
    packed = pack_sequences(tokens_df, L, tokens_per_shard=T)
    totals = {
        r["source"]: r["n"]
        for r in tokens_df.groupBy("source")
        .agg(F.sum(F.size("tokens")).alias("n"))
        .collect()
    }
    got_shards = {
        r["source"]: r["n"]
        for r in packed.groupBy("source")
        .agg(F.countDistinct("pack_shard").alias("n"))
        .collect()
    }
    import math

    for src, tot in totals.items():
        want = max(1, math.ceil(tot / T))
        # every derived shard id must be < the group's shard count; with
        # enough docs per group the hash fills every shard
        assert got_shards[src] <= want
        if totals[src] > 4 * T:
            assert got_shards[src] >= 2, src
    # the hot groups actually split
    assert any(n >= 2 for n in got_shards.values())
    # token conservation across the shard layer
    total = sum(totals.values())
    assert packed.agg(F.sum("n_tok")).collect()[0][0] == total
    # shard ids are a pure function of the data: invariant across layouts
    again = pack_sequences(tokens_df.repartition(7), L, tokens_per_shard=T)
    ka = {(r["source"], r["pack_shard"], r["seq_id"]): list(r["seq_tokens"])
          for r in packed.collect()}
    kb = {(r["source"], r["pack_shard"], r["seq_id"]): list(r["seq_tokens"])
          for r in again.collect()}
    assert ka == kb


def test_pack_duplicate_order_keys_use_rows_frame(spark):
    """Duplicate order_col values: the cumsum runs a ROWS frame, so two
    same-key docs get DISTINCT [start,end) spans (the r3 ADVICE bug: the
    default RANGE frame gave them the same __end, producing overlapping
    slices and corrupt sequences). Token multiset must be conserved."""
    rows = [("k", [1, 2, 3], 3, "s"), ("k", [4, 5, 6], 3, "s"),
            ("z", [7, 8], 2, "s")]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    packed = pack_sequences(df, 4, shards=None).collect()
    flat = sorted(t for r in packed for t in r["seq_tokens"])
    assert flat == [1, 2, 3, 4, 5, 6, 7, 8]
    assert sum(r["n_tok"] for r in packed) == 8


def test_pack_size_col_fast_path_matches_default(spark, tokens_df):
    """size_col='n_tok' lets the auto-shard pre-count read one scalar
    instead of re-evaluating the tokens expression; the packed output
    must be identical to the default path."""
    L, T = 64, 2_000
    a = pack_sequences(tokens_df, L, tokens_per_shard=T)
    b = pack_sequences(tokens_df, L, tokens_per_shard=T, size_col="n_tok")
    ka = {(r["source"], r["pack_shard"], r["seq_id"]): list(r["seq_tokens"])
          for r in a.collect()}
    kb = {(r["source"], r["pack_shard"], r["seq_id"]): list(r["seq_tokens"])
          for r in b.collect()}
    assert ka == kb
