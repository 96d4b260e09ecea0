"""North-rule clause "runs via spark-submit --py-files": real
spark-submit subprocess, package shipped ONLY as a zip (clean cwd, no
PYTHONPATH), pipeline end-to-end with resume validation.

This is the sandbox analog of submitting to a cluster — same launcher,
same code-distribution mechanism; only the master differs
(local[2] instead of a cluster manager).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "ner_spark.zip")
    pkg = os.path.join(REPO, "ner_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in sorted(os.walk(pkg)):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if fn.endswith((".py", ".npz")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_pyfiles_pipeline(spark, tmp_path):
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    from ner_spark.fixtures.transcripts import transcripts_df

    inp = str(tmp_path / "transcripts.parquet")
    transcripts_df(spark, 30).write.parquet(inp)

    zpath = _build_zip(str(tmp_path))
    script = str(tmp_path / "submit_main.py")
    # the submitted script imports the package strictly from --py-files
    with open(os.path.join(REPO, "ner_spark", "pipeline.py")) as f:
        body = f.read()
    with open(script, "w") as f:
        f.write(body)
        # after main(): print the EFFECTIVE master, so this test fails
        # if get_spark ever clobbers the launcher's --master again
        f.write(
            "\nfrom pyspark.sql import SparkSession as _S\n"
            "print({'effective_master':"
            " _S.getActiveSession().sparkContext.master})\n"
        )

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME_CONF")
    }
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[2]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zpath,
            script,
            "--input",
            inp,
            "--root",
            str(tmp_path / "kg_root"),
            "--mode",
            "gazetteer",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=570,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = proc.stdout
    assert "'validated':" in out and "False" not in out, out[-2000:]
    assert "'triples':" in out, out[-2000:]
    assert "'effective_master': 'local[2]'" in out, out[-2000:]
