"""The north rule's deployment clause, exercised for real: the crawl
job ships via ``spark-submit --py-files <engine.zip>``.

The test copies ``jobs/crawl.py`` into a temp directory and runs the
actual ``spark-submit`` binary from there, so the engine package can
only resolve from the archive tools/package_engine.py built — exactly
what a multi-executor cluster submission looks like (in local mode the
executors share the driver's python path; on a real cluster the same
flag ships the zip to every executor).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_crawl_ships_via_spark_submit_py_files():
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package_engine

    work = tempfile.mkdtemp(prefix="submit_")
    zip_a = package_engine.build_zip(os.path.join(work, "engine_a.zip"))
    zip_b = package_engine.build_zip(os.path.join(work, "engine_b.zip"))
    with open(zip_a, "rb") as fa, open(zip_b, "rb") as fb:
        assert fa.read() == fb.read(), "archive build not reproducible"

    # foreign cwd + copied job file: the repo tree must NOT be importable
    job = os.path.join(work, "crawl.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "crawl.py"), job)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_SF_DIR")
    }
    out_dir = os.path.join(work, "run")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_a,
            job,
            "--n-urls", "300", "--hosts", "8", "--fanout", "5",
            "--seeds", "6", "--max-epochs", "4", "--partitions", "8",
            "--out", out_dir,
        ],
        cwd=work,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["fetched"] > 0
    assert stats["epochs"] >= 1
    # crawl state landed where the job said it would
    assert os.path.isdir(os.path.join(out_dir, "state"))
    shutil.rmtree(work, ignore_errors=True)
