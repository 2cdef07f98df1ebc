"""Shipping: --py-files artifact build + a real spark-submit run.

North-rule requirement: the engine runs "via spark-submit --py-files"
— so the suite actually submits the tiling job with the package
shipped ONLY through the zip (script + cwd live in a temp dir, so a
successful import of optimizing_spark proves the artifact carries the
engine), mirroring how a 1000-executor cluster receives the code.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _spark_submit() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(pyspark.__path__[0], "bin", "spark-submit")
    return cand if os.path.exists(cand) else ""


def test_pyfiles_zip_is_reproducible(tmp_path):
    from optimizing_spark.plans.shipping import build_pyfiles_zip

    a = build_pyfiles_zip(str(tmp_path / "a.zip"))
    b = build_pyfiles_zip(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()
    names = zipfile.ZipFile(a).namelist()
    assert "optimizing_spark/__init__.py" in names
    assert "optimizing_spark/session.py" in names
    assert all(n.endswith(".py") for n in names)


def test_spark_submit_pyfiles_runs_tile_job(tmp_path):
    submit = _spark_submit()
    if not submit:
        pytest.skip("spark-submit launcher not found")
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"no test data at {SF_DIR}")
    from optimizing_spark.plans.shipping import build_pyfiles_zip

    zip_path = build_pyfiles_zip(str(tmp_path / "optimizing_spark.zip"))
    job = tmp_path / "job.py"
    shutil.copyfile(os.path.join(REPO, "scripts", "submit_tile_job.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    out = subprocess.run(
        [submit, "--py-files", zip_path, str(job),
         "--sf-dir", SF_DIR, "--cores", "4"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=280)
    assert out.returncode == 0, out.stderr[-2000:]
    payload = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert payload, out.stdout[-2000:]
    res = json.loads(payload[-1])

    expected = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"]).num_rows
    assert res["docs"] == expected
    assert res["docs_per_sec"] > 0
    # every doc landed on exactly one node at a legal depth
    assert sum(res["depth_hist"].values()) == expected
    assert all(0 <= int(d) <= 4 for d in res["depth_hist"])
