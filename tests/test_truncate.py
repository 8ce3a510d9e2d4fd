"""truncate() spill-dir semantics (VERDICT r1 'wrong' #2): the spill
root must be configurable to a shared filesystem for cluster runs, and
retired spills must be deletable so convergence loops don't accumulate
unbounded directories."""

from __future__ import annotations

import os

import pytest

from graft import checkpoint
from graft.checkpoint import drop_spill, truncate


@pytest.fixture()
def fresh_spill_root():
    """Reset the module-level spill root around a test."""
    old_root, old_n = checkpoint._spill_root, checkpoint._spill_n
    checkpoint._spill_root = None
    yield
    checkpoint._spill_root, checkpoint._spill_n = old_root, old_n


def test_truncate_honors_configured_dir(spark, tmp_path, fresh_spill_root):
    spark.conf.set("spark.graft.spillDir", str(tmp_path))
    try:
        df = truncate(spark.range(10))
        assert df.count() == 10
        path = df._graft_spill_path
        assert path.startswith(str(tmp_path))
        assert os.path.isdir(path)
    finally:
        spark.conf.unset("spark.graft.spillDir")


def test_truncate_honors_env_dir(spark, tmp_path, fresh_spill_root, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPILL_DIR", str(tmp_path))
    df = truncate(spark.range(5))
    assert df.count() == 5
    assert df._graft_spill_path.startswith(str(tmp_path))


def test_drop_spill_deletes_retired_state(spark, tmp_path, fresh_spill_root):
    spark.conf.set("spark.graft.spillDir", str(tmp_path))
    try:
        a = truncate(spark.range(10))
        b = truncate(a.selectExpr("id + 1 AS id"))
        pa = a._graft_spill_path
        drop_spill(a)
        assert not os.path.exists(pa)
        # the successor is intact and readable
        assert b.count() == 10
        # no-op on non-truncated frames
        drop_spill(spark.range(3))
    finally:
        spark.conf.unset("spark.graft.spillDir")
