"""spark-submit CLI smoke: encode -> decode -> verify on a real table."""

from __future__ import annotations

import json

from pysparkenc.cli import main
from pysparkenc.synth import make_tokens_table


def test_encode_decode_verify_roundtrip(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    out = str(tmp_path / "out")
    make_tokens_table(spark, 300, seed=9).write.parquet(src)

    assert main([
        "encode", "--input", src, "--output", enc,
        "--partition-by", "source,doc_id", "--num-partitions", "4",
    ]) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["rows"] == 300
    assert metrics["compression_ratio"] > 1.0

    assert main(["decode", "--input", enc, "--output", out]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 300

    assert main(["verify", "--original", src, "--encoded", enc]) == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v == {"rows": 300, "mismatches": 0}


def test_audit_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    make_tokens_table(spark, 200, seed=4).write.parquet(src)
    assert main(["encode", "--input", src, "--output", enc]) == 0
    capsys.readouterr()
    assert main(["audit", "--input", enc + "/chunks"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["corrupt"] == 0 and rep["chunks"] > 0

    # flip one payload byte in one chunk file: exit 1, chunk identified
    import glob

    import pyarrow.parquet as pq

    f = sorted(glob.glob(enc + "/chunks/**/*.parquet", recursive=True))[0]
    orig = pq.read_table(f)
    t = orig.to_pylist()
    t[0]["data"] = bytes([t[0]["data"][0] ^ 0x01]) + t[0]["data"][1:]
    import pyarrow as pa

    pq.write_table(pa.Table.from_pylist(t, schema=orig.schema), f)
    # drop hadoop's local-fs checksum sidecar for the rewritten file,
    # or the read fails at the FS layer before our audit ever runs
    import os

    crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert main(["audit", "--input", enc + "/chunks"]) == 1
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["corrupt"] == 1


def test_verify_detects_corruption(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    src2 = str(tmp_path / "src2")
    enc = str(tmp_path / "enc")
    make_tokens_table(spark, 120, seed=1).write.parquet(src)
    # a different table pretending to be the original
    make_tokens_table(spark, 120, seed=2).write.parquet(src2)
    assert main(["encode", "--input", src, "--output", enc]) == 0
    capsys.readouterr()
    assert main(["verify", "--original", src2, "--encoded", enc]) == 1


def test_history_and_as_of_run_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    out1 = str(tmp_path / "out1")
    make_tokens_table(spark, 200, seed=11).write.parquet(src)
    # two commits: a crashed first run (one partition lost), then the fill-in
    from pysparkenc.lineage import encode_with_lineage

    df = spark.read.parquet(src)
    encode_with_lineage(df, enc, partition_by=("source", "doc_id"),
                        num_partitions=4, drop_part_ids=frozenset({0}))
    encode_with_lineage(df, enc, partition_by=("source", "doc_id"),
                        num_partitions=4)

    assert main(["history", "--input", enc]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["run_id"] for r in rows] == [2, 1]
    assert sum(r["n_rows"] for r in rows) == 200

    assert main(["decode", "--input", enc, "--output", out1,
                 "--as-of-run", "1"]) == 0
    n1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert 0 < n1 < 200


def test_encode_with_bloom_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    make_tokens_table(spark, 150, seed=17).write.parquet(src)
    assert main(["encode", "--input", src, "--output", enc,
                 "--bloom", "doc_id"]) == 0
    capsys.readouterr()
    import pyspark.sql.functions as F

    chunks = spark.read.parquet(enc + "/chunks")
    with_bloom = chunks.where(
        (F.col("col") == "doc_id") & (F.length("bloom") > 0)
    ).count()
    assert with_bloom > 0
    assert main(["verify", "--original", src, "--encoded", enc]) == 0


def test_stats_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    make_tokens_table(spark, 180, seed=23).write.parquet(src)
    assert main(["encode", "--input", src, "--output", enc]) == 0
    capsys.readouterr()
    assert main(["stats", "--input", enc]) == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[0] == {"total_rows": 180}  # metadata-only COUNT(*)
    rows = {r["col"]: r for r in lines if "col" in r}
    nt = rows["n_tok"]
    assert nt["n_values"] == 180
    df = spark.read.parquet(src)
    import pyspark.sql.functions as F

    true = df.agg(F.sum("n_tok").alias("s"), F.min("n_tok").alias("lo"),
                  F.max("n_tok").alias("hi")).collect()[0]
    assert nt["sum"] == true["s"]
    assert nt["min"] == float(true["lo"]) and nt["max"] == float(true["hi"])
    assert rows["tokens"]["ratio"] > 1.0


def test_decode_columns_projection_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    out = str(tmp_path / "out")
    make_tokens_table(spark, 120, seed=29).write.parquet(src)
    assert main(["encode", "--input", src, "--output", enc]) == 0
    capsys.readouterr()
    assert main(["decode", "--input", enc, "--output", out,
                 "--columns", "doc_id,n_tok"]) == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "n_tok"}
    assert got.count() == 120
    capsys.readouterr()
    assert main(["decode", "--input", enc, "--output", out,
                 "--columns", "doc_id,nope"]) == 2


def test_cli_compact_expire(spark, tmp_path, capsys):
    """pysparkenc compact --expire end-to-end through the CLI."""
    import json as _json

    from pyspark.sql import functions as F

    from pysparkenc.cli import main
    from pysparkenc.engine import decode_table
    from pysparkenc.lineage import encode_with_lineage, read_committed_chunks
    from pysparkenc.synth import make_tokens_table

    path = str(tmp_path / "store")
    for i in range(2):
        encode_with_lineage(
            make_tokens_table(spark, 120, seed=30 + i).withColumn(
                "doc_id", F.concat(F.lit(f"c{i}-"), "doc_id")),
            path, partition_by=("source", "doc_id"), num_partitions=2,
            resume=False, batch_id=i,
        )
    n_before = decode_table(read_committed_chunks(spark, path)).count()
    rc = main(["compact", "--input", path,
               "--partition-by", "source,doc_id",
               "--num-partitions", "2", "--expire"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["superseded"] > 0 and out["expired"] == [1, 2]
    assert decode_table(read_committed_chunks(spark, path)).count() == n_before


def test_cli_vacuum(spark, tmp_path, capsys):
    """pysparkenc vacuum reclaims an orphan run dir through the CLI."""
    import json as _json

    from pyspark.sql import functions as F

    from pysparkenc.cli import main
    from pysparkenc.engine import encode_table
    from pysparkenc.lineage import encode_with_lineage, read_store
    from pysparkenc.synth import make_tokens_table

    path = str(tmp_path / "store")
    df = make_tokens_table(spark, 120, seed=55)
    encode_with_lineage(df, path, num_partitions=2)
    # crash debris: chunk files under run_id=5 with no lineage commit
    (encode_table(df.limit(30), num_partitions=1)
     .withColumn("run_id", F.lit(5)).write.mode("append")
     .partitionBy("run_id").parquet(path + "/chunks"))
    capsys.readouterr()
    assert main(["vacuum", "--input", path, "--grace-sec", "0"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["vacuumed_runs"] == [5] and out["bytes_reclaimed"] > 0
    assert read_store(spark, path).count() == 120


def test_decode_where_predicates(spark, tmp_path, capsys):
    """decode --where routes through scan_table: pruned, filtered, projected."""
    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    out = str(tmp_path / "out")
    df = make_tokens_table(spark, 250, seed=7)
    df.write.parquet(src)
    want_src = df.select("source").distinct().limit(1).collect()[0][0]
    expect = df.where(
        (df.n_tok >= 8) & (df.source == want_src)).count()
    assert expect > 0

    assert main(["encode", "--input", src, "--output", enc]) == 0
    capsys.readouterr()
    assert main([
        "decode", "--input", enc, "--output", out,
        "--columns", "doc_id,n_tok,source",
        "--where", "n_tok >= 8",
        "--where", f"source == {want_src}",
    ]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["rows"] == expect
    got = spark.read.parquet(out)
    assert got.columns == ["doc_id", "n_tok", "source"]
    assert got.where(
        (got.n_tok < 8) | (got.source != want_src)).count() == 0


def test_decode_where_bad_predicate(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    make_tokens_table(spark, 60, seed=3).write.parquet(src)
    assert main(["encode", "--input", src, "--output", enc]) == 0
    capsys.readouterr()
    assert main([
        "decode", "--input", enc, "--output", str(tmp_path / "o"),
        "--where", "n_tok between 5",
    ]) == 2


def test_stats_distinct(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    make_tokens_table(spark, 120, seed=21).write.parquet(src)
    assert main(["encode", "--input", src, "--output", enc,
                 "--partition-by", "source,doc_id"]) == 0
    capsys.readouterr()
    assert main(["stats", "--input", enc, "--distinct", "source"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    rep = rows[-1]
    want = {r["source"] for r in
            spark.read.parquet(src).select("source").distinct().collect()}
    assert rep["distinct_col"] == "source"
    assert rep["ndv"] == len(want)
    assert set(rep["sample"]) == {str(v) for v in want}
