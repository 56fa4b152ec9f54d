"""Every code example the README shows, executed verbatim-shaped: the
front door must work as documented. One test per README section, lean
inputs, asserting the documented behavior (not just absence of
exceptions)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tokens(spark):
    from pysparkenc.synth import make_tokens_table

    df = make_tokens_table(spark, 400, seed=7).persist()
    df.count()
    yield df
    df.unpersist()


def test_usage_encode_footer_decode(spark, tokens):
    from pysparkenc.engine import decode_table, encode_table, footer

    chunks = encode_table(tokens, partition_by=("source", "doc_id"))
    meta = footer(chunks)
    assert "data" not in meta.columns  # metadata only, no payload
    back = decode_table(chunks, tokens.schema)
    assert back.exceptAll(tokens).count() == 0
    assert tokens.exceptAll(back).count() == 0


def test_usage_spark_format(spark, tokens, tmp_path):
    from pysparkenc.datasource import register

    register(spark)
    path = str(tmp_path / "fmt")
    df = tokens.select("doc_id", "n_tok", "source")
    df.write.format("pysparkenc").mode("overwrite").save(path)
    got = (spark.read.format("pysparkenc").load(path)
           .where("n_tok >= 100 AND source = 'web'"))
    want = df.where("n_tok >= 100 AND source = 'web'")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def _cli(*args) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "pysparkenc.cli", *args],
        capture_output=True, text=True, timeout=600,
    )


def test_cli_encode_verify_audit_history_delete_decode(
    spark, tokens, tmp_path
):
    src = str(tmp_path / "tokens")
    enc = str(tmp_path / "enc")
    out = str(tmp_path / "t")
    tokens.write.parquet(src)
    r = _cli("encode", "--input", src, "--output", enc,
             "--partition-by", "source,doc_id", "--num-partitions", "2",
             "--resume")
    assert r.returncode == 0, r.stderr[-800:]
    assert _cli("verify", "--original", src, "--encoded", enc).returncode == 0
    assert _cli("audit", "--input", enc + "/chunks").returncode == 0
    h = _cli("history", "--input", enc)
    assert h.returncode == 0
    runs = [json.loads(line) for line in h.stdout.splitlines()
            if line.strip().startswith("{")]
    assert any(r0.get("operation") == "append" for r0 in runs)
    # takedown: delete two doc_ids, then decode applies it
    keys = str(tmp_path / "takedown.parquet")
    victims = tokens.select("doc_id").limit(2)
    victims.write.parquet(keys)
    assert _cli("delete", "--input", enc, "--keys", keys,
                "--key-cols", "doc_id").returncode == 0
    assert _cli("decode", "--input", enc, "--output", out).returncode == 0
    back = spark.read.parquet(out)
    assert back.count() == tokens.count() - 2
    vset = {r0["doc_id"] for r0 in victims.collect()}
    assert back.where(F.col("doc_id").isin(*vset)).count() == 0


def test_cli_decode_where_columns(spark, tokens, tmp_path):
    src = str(tmp_path / "tokens")
    enc = str(tmp_path / "enc")
    out = str(tmp_path / "t")
    tokens.write.parquet(src)
    assert _cli("encode", "--input", src, "--output", enc,
                "--num-partitions", "2").returncode == 0
    r = _cli("decode", "--input", enc, "--output", out,
             "--columns", "doc_id,n_tok", "--where", "n_tok >= 64")
    assert r.returncode == 0, r.stderr[-800:]
    back = spark.read.parquet(out)
    assert set(back.columns) == {"doc_id", "n_tok"}
    want = tokens.where("n_tok >= 64").select("doc_id", "n_tok")
    assert back.exceptAll(want).count() == 0
    assert want.exceptAll(back).count() == 0


def test_lineage_python_examples(spark, tokens, tmp_path):
    from pysparkenc.lineage import (
        delete_rows,
        encode_with_lineage,
        read_committed_chunks,
        read_store,
        snapshots,
        upsert_rows,
    )

    path = str(tmp_path / "store")
    encode_with_lineage(tokens, path, num_partitions=2)
    keys_df = tokens.select("doc_id").limit(3)
    delete_rows(spark, path, keys_df, key_cols=("doc_id",))
    new_df = tokens.limit(5).withColumn("n_tok", F.lit(1))
    upsert_rows(spark, path, new_df, key_cols=("doc_id",))
    got = read_store(spark, path, columns=["doc_id", "n_tok"])
    assert got.where(F.col("n_tok") == 1).count() == 5
    snaps = snapshots(spark, path).collect()
    assert {r["operation"] for r in snaps} >= {"append", "delete"}
    # VERSION AS OF run 1: the pre-delete table
    at1 = read_committed_chunks(spark, path, as_of_run=1)
    from pysparkenc.engine import decode_table

    assert decode_table(at1, tokens.schema).count() == tokens.count()


def test_scan_table_example(spark, tokens):
    from pysparkenc.engine import encode_table, scan_table

    chunks = encode_table(tokens, partition_by=("source",),
                          num_partitions=2).persist()
    chunks.count()
    got = scan_table(chunks, columns=["doc_id", "n_tok"],
                     where=[("source", "==", "web"),
                            ("n_tok", "between", (64, 512))])
    want = (tokens.where("source = 'web' AND n_tok BETWEEN 64 AND 512")
            .select("doc_id", "n_tok"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    chunks.unpersist()


def test_pipeline_examples(spark, tokens):
    from pysparkenc.pipeline import pack_sequences, stratified_sample

    sampled = stratified_sample(
        tokens, {"web": 1_000_000, "books": 250_000}, default_ppm=100_000
    )
    assert sampled.where("source = 'web'").count() == \
        tokens.where("source = 'web'").count()  # ppm 1e6 keeps all
    packed = pack_sequences(sampled, 128, shards=4)
    row = packed.first()
    if row is not None:
        assert len(row["seq_tokens"]) <= 128 and row["n_tok"] <= 128
