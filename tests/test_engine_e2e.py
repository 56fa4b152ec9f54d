"""Full-table round-trip through the Spark engine (SURVEY.md §5's "gap in
reference" row): encode -> chunk rows + footer metadata -> decode -> per-row
token-array equality, the BASELINE.json invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkenc.engine import decode_table, encode_table, footer
from pysparkenc.synth import make_tokens_table

N_ROWS = 3000


@pytest.fixture(scope="module")
def tokens_df(spark):
    df = make_tokens_table(spark, N_ROWS, seed=42).cache()
    df.count()
    return df


def _assert_same_table(df_a, df_b, key="doc_id"):
    a = {r[key]: r for r in df_a.collect()}
    b = {r[key]: r for r in df_b.collect()}
    assert set(a) == set(b)
    for k, ra in a.items():
        rb = b[k]
        assert ra["source"] == rb["source"], k
        assert ra["n_tok"] == rb["n_tok"], k
        assert ra["tokens"] == rb["tokens"], k  # bit-identical token arrays


def test_encode_decode_roundtrip_auto(spark, tokens_df):
    chunks = encode_table(
        tokens_df, partition_by=("source", "doc_id"), num_partitions=8
    ).cache()
    n_chunks = chunks.count()
    assert n_chunks > 0
    decoded = decode_table(chunks)
    _assert_same_table(tokens_df, decoded)
    chunks.unpersist()


@pytest.mark.parametrize("codec", ["plain", "delta_bp", "dict_rle", "for_rle"])
def test_roundtrip_forced_codec_tokens(spark, tokens_df, codec):
    chunks = encode_table(
        tokens_df,
        partition_by=("source", "doc_id"),
        num_partitions=4,
        codec={"tokens": codec, "n_tok": codec},
    )
    decoded = decode_table(chunks)
    _assert_same_table(tokens_df, decoded)


@pytest.mark.parametrize("codec", ["ba_plain", "ba_delta_len", "ba_delta", "dict_rle", "fsst"])
def test_roundtrip_forced_codec_strings(spark, tokens_df, codec):
    df = tokens_df.select("doc_id", "source", "n_tok")
    chunks = encode_table(
        df,
        partition_by=("source", "doc_id"),
        num_partitions=4,
        codec={"doc_id": codec, "source": codec},
    )
    decoded = decode_table(chunks)
    a = {r["doc_id"]: r for r in df.collect()}
    b = {r["doc_id"]: r for r in decoded.collect()}
    assert set(a) == set(b)
    assert all(a[k]["source"] == b[k]["source"] for k in a)


def test_footer_metadata_consistency(spark, tokens_df):
    chunks = encode_table(
        tokens_df, partition_by=("source", "doc_id"), num_partitions=8
    ).cache()
    meta = footer(chunks)
    # metadata row count == chunk row count, no binary columns
    assert "data" not in meta.columns and "aux" not in meta.columns
    # per-chunk min/max for n_tok must bracket the true range
    agg = (
        meta.where(F.col("col") == "n_tok")
        .agg(
            F.min("num_min").alias("lo"),
            F.max("num_max").alias("hi"),
            F.sum("n_values").alias("nv"),
        )
        .collect()[0]
    )
    true = tokens_df.agg(
        F.min("n_tok").alias("lo"), F.max("n_tok").alias("hi"),
        F.count("*").alias("n")
    ).collect()[0]
    assert agg["lo"] == float(true["lo"]) and agg["hi"] == float(true["hi"])
    assert agg["nv"] == true["n"]
    # the striped plan fills EVERY partition near-evenly (balance is the
    # design invariant now; per-page source homogeneity is recoverable
    # with sort_by=("source",) when ratio matters more than wall)
    sizes = sorted(
        r["nv"] for r in meta.where(F.col("col") == "tokens")
        .groupBy("part_id").agg(F.sum("n_values").alias("nv")).collect()
    )
    assert len(sizes) == 8
    assert sizes[-1] <= 1.3 * sizes[len(sizes) // 2]
    # compression must beat PLAIN overall on this profile mix
    tot = meta.agg(
        F.sum("plain_bytes").alias("p"), F.sum("enc_bytes").alias("e")
    ).collect()[0]
    assert tot["e"] < tot["p"]
    chunks.unpersist()


def test_skew_plan_balances_partitions(spark, tokens_df):
    chunks = encode_table(
        tokens_df, partition_by=("source", "doc_id"), num_partitions=8
    )
    sizes = (
        footer(chunks)
        .where(F.col("col") == "tokens")
        .groupBy("part_id")
        .agg(F.sum("n_values").alias("nv"))
        .collect()
    )
    vals = sorted(r["nv"] for r in sizes)
    assert len(vals) >= 6  # skewed sources actually spread out
    # no partition dominates: max <= 6x median
    median = vals[len(vals) // 2]
    assert vals[-1] <= 6 * median


def test_single_key_plan_salts_by_row_content(spark, tokens_df):
    """partition_by=("source",) alone must still spread a hot source
    across its whole bucket range (salt = deterministic row hash, not
    the range key itself) and stay layout-invariant for resume."""
    from pysparkenc.engine import plan_partitions

    p = plan_partitions(tokens_df, ("source",), 16).select(
        "doc_id", "part_id"
    )
    sizes = sorted(
        r["n"] for r in
        p.groupBy("part_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    # the Zipf-heaviest source holds ~30% of rows; without row-content
    # salting its entire mass lands in ONE part_id
    assert len(sizes) >= 10
    assert sizes[-1] <= 4 * sizes[len(sizes) // 2]
    # deterministic: same rows => same part_id under any input layout
    q = plan_partitions(tokens_df.repartition(13), ("source",), 16).select(
        "doc_id", F.col("part_id").alias("part_id2")
    )
    assert p.join(q, "doc_id").where(
        F.col("part_id") != F.col("part_id2")
    ).count() == 0


def test_part_id_col_bring_your_own_partitioning(spark, tokens_df):
    """`part_id_col` aligns chunk groups with a caller-owned layout:
    the column drives partitioning, is never encoded, and decode still
    round-trips bit-identical."""
    import pytest as _pytest

    d2 = tokens_df.withColumn(
        "pid", F.pmod(F.abs(F.xxhash64("source")), F.lit(8))
    )
    chunks = encode_table(d2, part_id_col="pid", num_partitions=8)
    cols = {r["col"] for r in chunks.select("col").distinct().collect()}
    assert "pid" not in cols  # layout metadata, not data
    out = decode_table(chunks, tokens_df.schema)
    assert out.join(
        tokens_df, ["doc_id", "tokens", "n_tok", "source"], "left_anti"
    ).count() == 0
    assert out.count() == tokens_df.count()
    with _pytest.raises(ValueError):
        encode_table(d2, part_id_col="pid", partition_by=("source",))


def test_empty_table_roundtrip(spark):
    from pysparkenc.engine import decode_table, encode_table
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 50, seed=1)
    empty = df.where("n_tok < 0")
    chunks = encode_table(empty, partition_by=("source", "doc_id"),
                          num_partitions=4)
    assert chunks.count() == 0
    assert decode_table(chunks, df.schema).count() == 0


def test_single_row_roundtrip(spark):
    from pysparkenc.engine import decode_table, encode_table
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 1, seed=2)
    chunks = encode_table(df, partition_by=("source", "doc_id"),
                          num_partitions=4)
    out = decode_table(chunks, df.schema)
    assert [r["tokens"] for r in out.collect()] == [
        r["tokens"] for r in df.collect()
    ]


def test_target_chunk_bytes_adapts_page_rows(spark):
    """Bytes-targeted paging: the same target must yield FEWER rows per
    page on a wide (fat-row) table than on a narrow one, and both must
    still round-trip exactly."""
    narrow = spark.range(20000).select(F.col("id").alias("k"))
    wide = spark.range(4000).select(
        "id", F.repeat(F.concat(F.lit("x"), F.col("id").cast("string")), 200).alias("body")
    )
    target = 256 * 1024

    nc = encode_table(narrow, num_partitions=2,
                      target_chunk_bytes=target).cache()
    wc = encode_table(wide, num_partitions=2,
                      target_chunk_bytes=target).cache()
    n_rows_per_page = max(
        r["n_values"] for r in nc.where(F.col("col") == "k").collect()
    )
    w_rows_per_page = max(
        r["n_values"] for r in wc.where(F.col("col") == "id").collect()
    )
    # narrow rows are ~8B -> pages grow toward the 65536 cap; wide rows
    # are hundreds of bytes -> a 256KB target fits only a few hundred
    assert w_rows_per_page < n_rows_per_page
    assert w_rows_per_page <= 1024
    assert n_rows_per_page >= 8192

    got_n = {r["k"] for r in decode_table(nc, narrow.schema).collect()}
    assert got_n == set(range(20000))
    got_w = {(r["id"], r["body"]) for r in decode_table(wc, wide.schema).collect()}
    want_w = {(r["id"], r["body"]) for r in wide.collect()}
    assert got_w == want_w
    nc.unpersist(); wc.unpersist()


def test_sort_by_clusters_and_shrinks(spark):
    """``sort_by`` (sort-to-compress): a shuffled low-run-length column
    must encode strictly smaller when clustered inside each partition,
    and the decoded set must be unchanged. The plan adds a Sort but NO
    extra Exchange (it's sortWithinPartitions, not a global orderBy)."""
    df = spark.range(60_000).select(
        F.col("id").alias("k"),
        (F.xxhash64("id") % 16).alias("cat"),       # shuffled 16-value col
        (F.xxhash64("id", F.lit(1)) % 1000).alias("v"),
    ).repartition(4).cache()
    df.count()

    def enc_bytes(chunks):
        return chunks.agg(F.sum("enc_bytes").alias("e")).collect()[0]["e"]

    plainc = encode_table(df, num_partitions=4)
    sortedc = encode_table(df, num_partitions=4, sort_by=("cat", "v"))
    assert enc_bytes(sortedc) < enc_bytes(plainc) * 0.8

    plan = sortedc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == plainc._jdf.queryExecution(
    ).executedPlan().toString().count("Exchange")

    got = {(r["k"], r["cat"], r["v"])
           for r in decode_table(sortedc, df.schema).collect()}
    want = {(r["k"], r["cat"], r["v"]) for r in df.collect()}
    assert got == want
    df.unpersist()


def test_aggregate_pushdown_matches_sql_semantics(spark):
    """COUNT skips nulls, SUM is exact over the present values, MIN/MAX
    agree — checked against the decoded truth on a nullable int column."""
    from pysparkenc.engine import aggregate_chunks

    rows = [(i, None if i % 7 == 0 else (i - 500) * 1_000_003)
            for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, v long")
    chunks = encode_table(df, num_partitions=4, rows_per_chunk=256)
    (got,) = aggregate_chunks(chunks, ["v"]).collect()
    vals = [v for _, v in rows if v is not None]
    assert got["n_values"] == len(vals)
    assert got["sum_val"] == sum(vals)
    assert got["min_val"] == float(min(vals))
    assert got["max_val"] == float(max(vals))
    # float columns carry no exact sum: sum_val must be null, not wrong
    dff = spark.createDataFrame([(float(i) / 3,) for i in range(100)], "x double")
    (gf,) = aggregate_chunks(encode_table(dff, num_partitions=2), ["x"]).collect()
    assert gf["sum_val"] is None
    assert gf["n_values"] == 100


def test_aggregate_pushdown_sum_never_wraps_past_int64(spark):
    """Chunk sums fold in decimal(38,0): values near the int64 edge sum
    exactly while the total fits, and a total OUTSIDE int64 yields a
    null sum_val — never a silently wrapped long (r3 ADVICE)."""
    from pysparkenc.engine import aggregate_chunks, encode_table

    big = (1 << 62) - 17
    # 3 values: total = 3 * (2^62 - 17) > int64 max -> null, not wrapped
    df = spark.createDataFrame([(big,), (big,), (big,)], "v long")
    (r,) = aggregate_chunks(encode_table(df, num_partitions=1), ["v"]).collect()
    assert r["n_values"] == 3
    assert r["sum_val"] is None
    # 2 values: total = 2^63 - 34 still fits int64 -> exact
    df2 = spark.createDataFrame([(big,), (big,)], "v long")
    (r2,) = aggregate_chunks(encode_table(df2, num_partitions=1), ["v"]).collect()
    assert r2["sum_val"] == 2 * big
