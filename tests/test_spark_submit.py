"""The north rule's deployment shape, tested literally: the maintenance job
launched via `spark-submit --py-files octocode_spark.zip` in a SEPARATE
process, with digest equality checked from this one."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_maintenance(spark, tmp_path):
    from octocode_spark.functions.digest import table_digest
    from octocode_spark.lakehouse import LakeTable
    from tests.conftest import make_sequences_table

    root = str(tmp_path / "tbl")
    t = make_sequences_table(spark, root, n_rows=1500, small_files=12)
    pre_digest = table_digest(t.read(spark))
    pre_files = len(t.files())

    zpath = str(tmp_path / "ocs.zip")
    subprocess.run(
        ["python", os.path.join(REPO, "tools", "submit_maintenance.py"),
         "--make-zip", zpath],
        check=True, capture_output=True,
    )
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zpath,
         os.path.join(REPO, "tools", "submit_maintenance.py"),
         "--root", root, "--cluster-by", "zorder", "--expire-now"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),  # NOT the repo: the package must come from --py-files
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["rows"] == 1500
    assert metrics["files_out"] < pre_files  # compaction actually compacted
    assert metrics["partitions_done"]

    post = LakeTable.load(root)
    assert table_digest(post.read(spark)) == pre_digest
    assert len(post.files()) == metrics["files_out"]
