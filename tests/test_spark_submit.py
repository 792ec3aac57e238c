"""Packaging regression test for the spark-submit --py-files lane.

The north rule requires the job to run "via spark-submit --py-files"; the
scale evidence lives in BENCH/SUBMIT_SCALING.md (scripts/submit_scaling.py).
This test keeps the packaging itself green on every pytest run: one tiny
frontier job submitted through the real spark-submit binary, importing
navi_spark ONLY from the shipped zip (the job aborts if any module resolves
from the repo checkout — see scripts/submit_frontier.py).
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_launcher():
    spec = importlib.util.spec_from_file_location(
        "submit_scaling", os.path.join(REPO, "scripts", "submit_scaling.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not os.path.exists(
        os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"),
                     "bin", "spark-submit")
    ),
    reason="spark-submit binary not available",
)
def test_py_files_packaging_end_to_end():
    launcher = _load_launcher()
    staging = tempfile.mkdtemp(prefix="navi-submit-test-")
    try:
        zip_path = launcher.build_zip(staging)
        r = launcher.run_at(4, 50_000, staging, zip_path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    # the job itself asserts import isolation; re-check the evidence here
    assert ".zip" in r["pkg_origins"]["navi_spark"]
    assert not r["pkg_origins"]["bench"].startswith(REPO + "/")
    assert r["n_urls"] == 50_000
    # the wave actually scheduled rows through the full pipeline
    assert 0 < r["scheduled"] <= 50_000
    assert r["urls_per_sec"] > 0
