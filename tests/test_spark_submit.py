"""spark-submit --py-files launch-mode smoke test (VERDICT r3 #5).

The north rule's launch mode is ``spark-submit --py-files pkg.zip``; every
other test exercises the in-process PYTHONPATH route only. This builds the
real zip, launches a real spark-submit subprocess on a tiny generated
corpus — with PYTHONPATH scrubbed so the package can ONLY arrive via
--py-files — and asserts the one-line JSON metrics report.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

RUNNER = """\
import sys
from importtoneo4j_spark.__main__ import main
sys.exit(main(sys.argv[1:]))
"""


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit on PATH"
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    pkg_zip = str(tmp_path / "importtoneo4j_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(REPO, "importtoneo4j_spark")
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    runner = tmp_path / "run_kg.py"
    runner.write_text(RUNNER)
    work = str(tmp_path / "kg")

    env = {
        k: v
        for k, v in os.environ.items()
        # scrub every route by which the package could leak in besides
        # --py-files (the launch mode under test)
        if k not in ("PYTHONPATH",)
    }
    env["SPARK_GRAFT_CPUS"] = "2"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            pkg_zip,
            str(runner),
            "--workdir",
            work,
            "--gen-convs",
            "80",
            "--master",
            "local[2]",
        ],
        cwd=str(tmp_path),  # NOT the repo root: imports must use the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert json_lines, proc.stdout[-2000:]
    metrics = json.loads(json_lines[-1])
    assert metrics["materialize"]["triples"] > 0
    assert metrics["ingest"]["valid"] > 0
    assert ":" in metrics["materialize"]["checksum"]
