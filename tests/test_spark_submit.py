"""True ``spark-submit --py-files`` launch — the north rule's named
launch shape, executed for real rather than simulated in-process.

The driver script is ``graft/cli.py`` exactly as the README documents;
the master is ``local-cluster[2,2,1024]`` — TWO separate executor JVMs
(not local-mode threads), so broadcasts travel TorrentBroadcast, the
shuffle crosses process boundaries, and the ``graft`` package reaches
the executors ONLY through the ``--py-files`` zip (the pickled pandas
UDFs resolve their module on the executor side, which fails loudly if
the zip is missing or malformed). This is the closest a single box
gets to a multi-executor cluster and it exercises the exact artifact a
real deployment ships.

Input transcripts are written with pyarrow (no Spark needed for the
fixture) from the same deterministic rows as graft.fixtures, and the
output parquet is read back with pyarrow — the test never touches the
test-session SparkSession, so the subprocess JVMs own the machine for
their ~90 s.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from graft.fixtures import synth_transcripts_rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


def _write_transcripts_parquet(path: str) -> None:
    rows = synth_transcripts_rows(n_conv=60, seed=7)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "conv_id": pa.array(cols[0], pa.string()),
            "turn_idx": pa.array(cols[1], pa.int32()),
            "role": pa.array(cols[2], pa.string()),
            "text": pa.array(cols[3], pa.string()),
            "tool": pa.array(cols[4], pa.string()),
            "ts": pa.array(cols[5], pa.timestamp("us")),
        }
    )
    pq.write_table(table, path)


def _zip_package(zip_path: str) -> None:
    pkg = os.path.join(REPO, "graft")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_local_cluster(tmp_path):
    tx = str(tmp_path / "transcripts.parquet")
    out = str(tmp_path / "ranks")
    zip_path = str(tmp_path / "graft.zip")
    _write_transcripts_parquet(tx)
    _zip_package(zip_path)

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local-cluster[2,2,1024]",
        "--driver-memory", "1g",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "graft", "cli.py"),
        "--algo", "pagerank",
        "--input", tx,
        "--output", out,
    ]
    # cwd OUTSIDE the repo: the driver resolves graft/ from the script
    # dir shim, the executors resolve it from the zip alone
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    stats_lines = [
        ln for ln in proc.stdout.strip().splitlines()
        if ln.startswith("{")
    ]
    assert stats_lines, f"no stats line in stdout: {proc.stdout[-500:]}"
    stats = json.loads(stats_lines[-1])
    assert stats["algo"] == "pagerank"
    assert stats["sym_edge_rows"] > 0

    got = pq.read_table(out)
    assert {"actor", "rank"} <= set(got.column_names)
    assert got.num_rows > 0
    ranks = got.column("rank").to_pylist()
    assert all(r > 0 for r in ranks)
    # PageRank mass conservation (cugraph convention: scores sum to 1)
    assert abs(sum(ranks) - 1.0) < 1e-6
