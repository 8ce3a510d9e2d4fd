"""Transcript analytics: sessionization, conversation stats, role
transitions."""

import datetime as dt

import pytest

from graft import fixtures
from graft.transcripts import (
    conversation_stats,
    role_transitions,
    sessionize,
)


def _tx(spark, rows):
    """rows: (conv_id, turn_idx, role, text, tool, ts_offset_seconds)."""
    base = dt.datetime(2026, 1, 1)
    data = [
        (c, i, r, t, tl, base + dt.timedelta(seconds=off))
        for c, i, r, t, tl, off in rows
    ]
    return spark.createDataFrame(data, schema=fixtures.TRANSCRIPT_SCHEMA)


def test_sessionize_gap_split(spark):
    t = _tx(spark, [
        ("c", 0, "user", "a", None, 0),
        ("c", 1, "assistant", "b", None, 10),
        ("c", 2, "user", "c", None, 5000),      # > 3600 gap → session 1
        ("c", 3, "assistant", "d", None, 5020),
        ("c", 4, "user", "e", None, 99999),     # → session 2
        ("d", 0, "user", "x", None, 0),         # other conv: session 0
    ])
    got = {
        (r.conv_id, r.turn_idx): r.session_idx
        for r in sessionize(t, gap_seconds=3600).collect()
    }
    assert got == {
        ("c", 0): 0, ("c", 1): 0, ("c", 2): 1,
        ("c", 3): 1, ("c", 4): 2, ("d", 0): 0,
    }


def test_sessionize_boundary_is_strict(spark):
    """A gap of exactly gap_seconds does NOT split (strict >)."""
    t = _tx(spark, [
        ("c", 0, "user", "a", None, 0),
        ("c", 1, "user", "b", None, 3600),
        ("c", 2, "user", "c", None, 7201),  # 3601 > 3600 → splits
    ])
    got = [
        r.session_idx
        for r in sessionize(t, 3600).orderBy("turn_idx").collect()
    ]
    assert got == [0, 0, 1]


def test_conversation_stats(spark):
    t = _tx(spark, [
        ("c", 0, "user", "hello", None, 0),
        ("c", 1, "assistant", "hi!", None, 60),
        ("c", 2, "assistant", "ok", "search", 120),
        ("c", 3, "user", "bye", None, 300),
    ])
    r = conversation_stats(t).first()
    assert r.conv_id == "c"
    assert r.n_turns == 4
    # actors: role:user, role:assistant, tool:search
    assert r.n_actors == 3
    assert abs(r.tool_rate - 0.25) < 1e-9
    assert abs(r.avg_text_len - (5 + 3 + 2 + 3) / 4) < 1e-6
    assert r.duration_s == 300


def test_role_transitions(spark):
    t = _tx(spark, [
        ("c", 0, "user", "", None, 0),
        ("c", 1, "assistant", "", None, 1),
        ("c", 2, "user", "", None, 2),
        ("c", 3, "assistant", "", None, 3),
        ("d", 0, "user", "", None, 0),
        ("d", 1, "tool", "", None, 1),
    ])
    got = {
        (r.prev_role, r.role): (r.n, r.p)
        for r in role_transitions(t).collect()
    }
    # user → assistant twice, user → tool once; assistant → user once
    assert got[("user", "assistant")] == (2, round(2 / 3, 6))
    assert got[("user", "tool")] == (1, round(1 / 3, 6))
    assert got[("assistant", "user")] == (1, 1.0)
    assert len(got) == 3


def test_sessionize_then_stats_composes(spark):
    """Sessionized sub-conversations feed the same downstream ops: the
    per-(conv, session) turn counts sum to the original depth."""
    from pyspark.sql import functions as F

    t = _tx(spark, [
        ("c", 0, "user", "a", None, 0),
        ("c", 1, "user", "b", None, 10000),
        ("c", 2, "user", "c", None, 20000),
    ])
    s = sessionize(t, 3600)
    per = (
        s.groupBy("conv_id", "session_idx")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert per == 3
    assert s.select("session_idx").distinct().count() == 3


def test_turn_gap_stats(spark):
    from graft.transcripts import turn_gap_stats

    t = _tx(spark, [
        ("c", 0, "user", "a", None, 0),
        ("c", 1, "assistant", "b", None, 60),
        ("c", 2, "user", "c", None, 300),     # gaps 60, 240
        ("d", 0, "user", "x", None, 0),       # single turn → no row
        ("e", 0, "user", "x", None, 50),
        ("e", 1, "user", "y", None, 50),      # gap 0 → burstiness guard
    ])
    got = {r.conv_id: r for r in turn_gap_stats(t).collect()}
    assert set(got) == {"c", "e"}
    c = got["c"]
    # mu = 150, sigma_pop = 90, B = (90-150)/(90+150) = -0.25
    assert (c.n_gaps, c.mean_gap, c.std_gap) == (2, 150.0, 90.0)
    assert c.burstiness == -0.25
    assert c.max_gap == 240
    e = got["e"]
    assert (e.n_gaps, e.mean_gap, e.std_gap) == (1, 0.0, 0.0)
    assert e.burstiness == 0.0 and e.max_gap == 0


def test_turn_gap_periodic_is_minus_one_like(spark):
    """Perfectly periodic turns: sigma = 0 → burstiness = -1."""
    from graft.transcripts import turn_gap_stats

    t = _tx(spark, [("c", i, "user", "a", None, i * 30) for i in range(5)])
    row = turn_gap_stats(t).first()
    assert row.std_gap == 0.0
    assert row.burstiness == -1.0


def test_actor_pmi(spark):
    import math

    from graft.transcripts import actor_pmi

    t = _tx(spark, [
        ("c1", 0, "user", "a", None, 0),
        ("c1", 1, "assistant", "b", None, 1),
        ("c1", 2, "error", "b", "t1", 2),     # actor tool:t1
        ("c2", 0, "user", "a", None, 0),
        ("c2", 1, "assistant", "b", None, 1),
        ("c3", 0, "user", "a", None, 0),
    ])
    got = {(r.a, r.b): (r.n_ab, r.pmi) for r in actor_pmi(t).collect()}
    # N=3; n(user)=3, n(assistant)=2, n(tool:t1)=1
    assert got[("role:assistant", "role:user")] == (2, 0.0)
    assert got[("role:assistant", "tool:t1")] == (
        1, round(math.log(3 / 2), 6)
    )
    assert got[("role:user", "tool:t1")] == (1, 0.0)
    assert len(got) == 3


def test_actor_pmi_repeated_turns_count_conversations_once(spark):
    """PMI is set-cooccurrence: many turns by the same actor pair in
    one conversation count once."""
    from graft.transcripts import actor_pmi

    t = _tx(spark, [
        ("c", i, "user" if i % 2 == 0 else "assistant", "x", None, i)
        for i in range(10)
    ])
    got = {(r.a, r.b): r.n_ab for r in actor_pmi(t).collect()}
    assert got == {("role:assistant", "role:user"): 1}


def test_conversation_entropy_hand_values(spark):
    import math

    from graft.transcripts import conversation_entropy

    rows = [
        # ping-pong: a->b, b->a, a->b -> pairs {(a,b):2,(b,a):1}, t=3
        ("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "a"), ("c1", 3, "b"),
        # single turn: zero row
        ("c2", 0, "a"),
        # uniform over 2 distinct pairs -> h = 1, h_norm = 1
        ("c3", 0, "a"), ("c3", 1, "b"), ("c3", 2, "c"),
    ]
    t = spark.createDataFrame(
        [(c, i, r, None, None) for c, i, r in rows],
        "conv_id string, turn_idx int, role string, tool string, ts timestamp",
    )
    got = {r["conv_id"]: r for r in conversation_entropy(t).collect()}
    assert got["c2"]["n_transitions"] == 0
    assert got["c2"]["h_bits"] == 0.0 and got["c2"]["h_norm"] == 0.0
    h1 = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert got["c1"]["n_transitions"] == 3 and got["c1"]["k_pairs"] == 2
    assert got["c1"]["h_bits"] == pytest.approx(h1, abs=1e-6)
    assert got["c1"]["h_norm"] == pytest.approx(h1, abs=1e-6)  # /log2(2)
    assert got["c3"]["h_bits"] == pytest.approx(1.0, abs=1e-6)
    assert got["c3"]["h_norm"] == pytest.approx(1.0, abs=1e-6)
