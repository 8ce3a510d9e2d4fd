"""spark-submit CLI entry point: argument plumbing + output shape."""

import json

from graft import fixtures
from graft.cli import main


def _write_transcripts(spark, tmp_path):
    path = str(tmp_path / "tx")
    fixtures.synth_transcripts(spark, n_conv=50).write.mode("overwrite").parquet(path)
    return path


def test_cli_pagerank_roundtrip(spark, tmp_path, capsys):
    src = _write_transcripts(spark, tmp_path)
    out = str(tmp_path / "ranks")
    main(["--algo", "pagerank", "--input", src, "--output", out])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["algo"] == "pagerank" and stats["sym_edge_rows"] > 0
    got = spark.read.parquet(out)
    assert {"actor", "rank"} <= set(got.columns)
    assert got.count() > 0


def test_cli_edge_betweenness_sampled(spark, tmp_path, capsys):
    src = _write_transcripts(spark, tmp_path)
    out = str(tmp_path / "eb")
    main(["--algo", "edge-betweenness", "--input", src, "--output", out,
          "--k-sources", "8"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["algo"] == "edge-betweenness"
    got = spark.read.parquet(out)
    assert {"actor_u", "actor_v", "betweenness"} <= set(got.columns)
    assert got.count() > 0
    assert got.where("betweenness < 0").count() == 0


def test_cli_half_life_changes_weights_not_vertices(spark, tmp_path, capsys):
    src = _write_transcripts(spark, tmp_path)
    out_static = str(tmp_path / "pr_static")
    out_decay = str(tmp_path / "pr_decay")
    main(["--algo", "pagerank", "--input", src, "--output", out_static])
    main(["--algo", "pagerank", "--input", src, "--output", out_decay,
          "--half-life-s", "3600"])
    a = spark.read.parquet(out_static)
    b = spark.read.parquet(out_decay)
    # same vertex set (decay rescales weights, never drops edges) ...
    assert sorted(r.actor for r in a.select("actor").collect()) == \
        sorted(r.actor for r in b.select("actor").collect())
    # ... but the ranking genuinely responds to recency weighting
    ra = {r.actor: r.rank for r in a.collect()}
    rb = {r.actor: r.rank for r in b.collect()}
    assert any(abs(ra[k] - rb[k]) > 1e-9 for k in ra)


def test_cli_snapshot_drift(spark, tmp_path, capsys):
    src = _write_transcripts(spark, tmp_path)
    out = str(tmp_path / "drift")
    main(["--algo", "snapshot-drift", "--input", src, "--output", out,
          "--granularity", "hour"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["algo"] == "snapshot-drift"
    got = spark.read.parquet(out)
    assert {"win", "next_win", "jaccard", "weight_delta"} <= set(got.columns)
    # every pair is consecutive-hour: jaccard in [0, 1]
    assert got.where("jaccard < 0 OR jaccard > 1").count() == 0
