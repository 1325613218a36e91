"""North-rule evidence: the pipeline runs via ``spark-submit
--py-files graphrole_spark.zip`` in a SEPARATE JVM/driver process and
produces bit-identical features to the in-process engine.

The script copy runs from a temp directory so the repo root is NOT on
its sys.path — the ``graphrole_spark`` import can only be satisfied by
the ``--py-files`` zip, which is exactly what a multi-executor cluster
submission exercises (reference packaging: setup.py of
dkaslovsky/GraphRole; here the unit shipped to executors is the zip).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "graphrole_spark.zip")
    pkg = os.path.join(REPO, "graphrole_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    tmp = str(tmp_path)
    zpath = _build_zip(tmp)
    script = os.path.join(tmp, "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), script)
    out = os.path.join(tmp, "feats")

    spark_home = os.path.dirname(
        __import__("pyspark").__file__
    )
    submit = os.path.join(spark_home, "bin", "spark-submit")
    env = dict(
        os.environ,
        SPARK_HOME=spark_home,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            script,
            "--synthesize", "40",
            "--generations", "3",
            "--output", out,
        ],
        cwd=tmp,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert stats["rows"] > 0 and stats["rows_per_sec"] > 0

    # the submitted run must match the in-process engine bit-for-bit
    from graphrole_spark.pipeline import extract_transcript_features
    from graphrole_spark.sources.transcripts import synthesize_transcripts

    want = extract_transcript_features(
        synthesize_transcripts(spark, 40, seed=42), max_generations=3
    )
    if "node" in want.columns and "conv_id" in want.columns:
        want = want.drop("node")
    wp = (
        want.toPandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
        .sort_index(axis=1)
    )
    gp = (
        spark.read.parquet(out)
        .toPandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
        .sort_index(axis=1)
    )
    assert list(wp.columns) == list(gp.columns)
    assert len(wp) == stats["rows"]
    assert np.allclose(wp.values, gp.values)
