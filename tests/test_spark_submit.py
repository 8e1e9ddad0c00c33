"""North-rule deployment surface: the engine ships as a zip and runs
via ``spark-submit --py-files`` (the run.py docstring's exact launch
shape), executed for REAL against a local master in a clean working
directory — imports must resolve from the shipped zip, not the repo
checkout.  Reference analog: the CLI smoke tests
(/root/reference/tests/test_cli.py) exercise the deployed entry point,
not the library import path."""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import zipfile

import pytest

from investigraph_etl_spark.changelog import (
    gen_events_pandas,
    oracle_reduce,
    write_changelog,
)
from investigraph_etl_spark.sources.lake import HashLakeTable
from tests.conftest import assert_pdf_equal


def _build_zip(tmp_path: pathlib.Path) -> pathlib.Path:
    pkg = pathlib.Path(__file__).resolve().parents[1] / "investigraph_etl_spark"
    zpath = tmp_path / "investigraph_etl_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, f"investigraph_etl_spark/{p.relative_to(pkg)}")
    return zpath


def test_spark_submit_pyfiles_replay_roundtrip(spark, tmp_path):
    """``spark-submit --py-files engine.zip driver.py replay …`` in a
    scrubbed env (no PYTHONPATH, cwd away from the repo) replays a
    binlog into a lake whose final state equals the oracle — the full
    cluster-submission story minus only the multi-machine master."""
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    zpath = _build_zip(tmp_path)
    log_dir = tmp_path / "binlog"
    write_changelog(str(log_dir), 5000, chunk_size=2500, seed=7, n_docs=400)
    driver = tmp_path / "driver.py"
    driver.write_text(
        "import sys\n"
        "from investigraph_etl_spark.run import main\n"
        "main(sys.argv[1:])\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", str(zpath),
            str(driver),
            "replay",
            "--changelog", str(log_dir),
            "--lake", str(tmp_path / "lake"),
        ],
        cwd=str(tmp_path),  # imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert not stats["skipped"] and stats["version"] >= 1
    # the submitted job's final table state equals the oracle —
    # token-array equality included (assert_pdf_equal compares lists)
    lake = HashLakeTable(spark, str(tmp_path / "lake"))
    expected = oracle_reduce(gen_events_pandas(0, 5000, seed=7, n_docs=400))
    assert_pdf_equal(lake.read().toPandas(), expected)
