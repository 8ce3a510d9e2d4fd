"""The one-time engine warmup in graft.session (r6).

The warmup must (a) run at most once per Spark context, (b) honor the
GRAFT_NO_SESSION_WARM opt-out, and (c) never touch caller data — it is
pure engine initialization, so a warmed session returns identical query
results (the whole oracle battery runs through get_spark and pins
that globally).
"""

import graft.session as gs
from graft.session import get_spark


def test_warmup_runs_once_per_context():
    spark = get_spark("warm-test")
    app_id = spark.sparkContext.applicationId
    assert app_id in gs._warmed_app_ids
    n_before = len(gs._warmed_app_ids)
    # getOrCreate reuse path: no second warmup entry for the same JVM
    again = get_spark("warm-test-2")
    assert again.sparkContext.applicationId == app_id
    assert len(gs._warmed_app_ids) == n_before


def test_warmup_opt_out(monkeypatch):
    spark = get_spark("warm-test")
    app_id = spark.sparkContext.applicationId
    monkeypatch.setenv("GRAFT_NO_SESSION_WARM", "1")
    gs._warmed_app_ids.discard(app_id)
    gs._warm_session(spark)
    # opt-out: the guard returns before recording (and before running)
    assert app_id not in gs._warmed_app_ids
    monkeypatch.delenv("GRAFT_NO_SESSION_WARM")
    gs._warm_session(spark)
    assert app_id in gs._warmed_app_ids


def test_warmed_session_queries_normally():
    spark = get_spark("warm-test")
    assert spark.range(10).count() == 10
    assert spark.sql("select 1 + 1 as v").collect()[0]["v"] == 2
