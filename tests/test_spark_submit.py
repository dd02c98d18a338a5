"""North-rule deployment evidence: the pipeline runs via spark-submit
--py-files with the package shipped ONLY as a zip (reference deploy shape;
BASELINE.json north_rule: "run via spark-submit --py-files").

The test copies ``run_pipeline.py`` to an empty temp cwd and ships
``kgist_spark.zip`` via --py-files, so every ``import kgist_spark`` — driver
AND executors — must resolve from the zip; a repo-relative import leak would
fail with ModuleNotFoundError.
"""

import json
import shutil
import subprocess
import zipfile

import pytest

from tests.conftest import REPO_ROOT

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(dest):
    zip_path = dest / "kgist_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO_ROOT / "kgist_spark").rglob("*.py")):
            zf.write(p, p.relative_to(REPO_ROOT))
    return zip_path


@pytest.mark.spark
def test_spark_submit_py_files_pipeline(tmp_path):
    zip_path = _zip_package(tmp_path)
    shutil.copy(REPO_ROOT / "run_pipeline.py", tmp_path / "run_pipeline.py")
    out = tmp_path / "kg_out"
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--driver-memory", "4g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", str(zip_path),
        "run_pipeline.py",
        "--generate", "2000", "--out", str(out), "--buckets", "4",
    ]
    res = subprocess.run(
        cmd, cwd=tmp_path, capture_output=True, text=True, timeout=600
    )
    assert res.returncode == 0, res.stderr[-4000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["n_docs"] == 2000
    assert report["n_triples"] > 0
    # the materialized KG landed with its lineage manifest
    assert (out / "kg_triples").exists()
    manifest = [
        json.loads(l)
        for l in (out / "_manifest.json").read_text().splitlines()
        if l.strip()
    ]
    assert manifest and all(e["status"] == "done" for e in manifest)
