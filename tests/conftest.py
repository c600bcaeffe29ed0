"""Shared Spark fixture (session-scoped; local[8], small shuffle) and
the jobs-CLI test harness."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/jobs")

from whakoom_webscrapper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def run_job(module, argv, capsys):
    """Drive a jobs/*.py main() in-process and return its stats line.

    The single source of the job CLI contract: argv passed as on a real
    command line, the LAST stdout line is one JSON object."""
    old = sys.argv
    sys.argv = [module.__name__] + argv
    try:
        module.main()
    finally:
        sys.argv = old
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])
