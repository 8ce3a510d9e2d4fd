"""Deterministic in-code test fixtures (FIXTURES.md F1–F6).

The golden graphs reproduce the *data* of the reference's validation
files (/root/reference/validation/clique_ring.txt:1-44 etc.) — they are
test inputs with known community structure, not code.
"""

from __future__ import annotations

import datetime as _dt
import itertools

import numpy as np
from pyspark.sql import DataFrame, SparkSession

EDGE_SCHEMA = "src long, dst long, weight double"
TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["search", "python", "browser", "calculator", "retrieval"]


def clique_ring_edges() -> list[tuple[int, int, float]]:
    """Ring of five 4-cliques: cliques {4k..4k+3}, bridges (4k+3, 4k+4 mod 20).

    Data fixture per /root/reference/validation/clique_ring.txt:1-44.
    Expected Leiden/Louvain answer at moderate resolution: 5 communities.
    """
    edges = []
    for c in range(5):
        base = 4 * c
        for i, j in itertools.combinations(range(4), 2):
            edges.append((base + i, base + j, 1.0))
        edges.append((base + 3, (base + 4) % 20, 1.0))
    return edges


def clique_ring_weighted_edges() -> list[tuple[int, int, float]]:
    """Same topology, bridge edges weighted 0.5
    (/root/reference/validation/clique_ring_weighted.txt:1-44)."""
    edges = []
    for c in range(5):
        base = 4 * c
        for i, j in itertools.combinations(range(4), 2):
            edges.append((base + i, base + j, 1.0))
        edges.append((base + 3, (base + 4) % 20, 0.5))
    return edges


def weighted_triangle_edges() -> list[tuple[int, int, float]]:
    """3-node weighted triangle (/root/reference/validation/weighted_edges.txt:1-3)."""
    return [(0, 1, 0.3), (1, 2, 0.4), (2, 0, 0.1)]


def bridged_cliques_edges() -> list[tuple[int, int, float]]:
    """Two K4s joined by one bridge (reference's in-code unit fixture,
    custom_leiden.py:759-787). m = 13."""
    edges = []
    for base in (0, 4):
        for i, j in itertools.combinations(range(4), 2):
            edges.append((base + i, base + j, 1.0))
    edges.append((3, 4, 1.0))
    return edges


def edges_df(spark: SparkSession, rows: list[tuple[int, int, float]]) -> DataFrame:
    return spark.createDataFrame(rows, schema=EDGE_SCHEMA)


def synth_transcripts_rows(
    n_conv: int = 200,
    seed: int = 42,
    min_turns: int = 3,
    max_turns: int = 30,
    skew: bool = False,
) -> list[tuple]:
    """Deterministic synthetic transcript rows (FIXTURES.md F1).

    ``skew=True`` adds one mega-conversation (50x the max turn count) and
    routes most tool calls through a single hub tool — the adversarial
    shape for the skew-handling tests (SURVEY.md §4 P11).
    """
    rng = np.random.default_rng(seed)
    base_ts = _dt.datetime(2024, 1, 1)
    rows: list[tuple] = []
    n_turns = rng.integers(min_turns, max_turns + 1, size=n_conv)
    if skew:
        n_turns = np.append(n_turns, max_turns * 50)
    for c, nt in enumerate(n_turns):
        conv = f"conv_{c:05d}"
        for t in range(int(nt)):
            # alternate user/assistant with occasional system/tool turns
            r = rng.random()
            if t == 0 and rng.random() < 0.3:
                role = "system"
            elif r < 0.15:
                role = "tool"
            else:
                role = _ROLES[t % 2]
            if role == "tool":
                if skew and rng.random() < 0.9:
                    tool = _TOOLS[0]  # hub tool
                else:
                    tool = _TOOLS[int(rng.integers(len(_TOOLS)))]
            else:
                tool = None
            rows.append(
                (
                    conv,
                    t,
                    role,
                    f"{conv}:{t}:{role}",
                    tool,
                    base_ts + _dt.timedelta(minutes=t, seconds=c % 60),
                )
            )
    return rows


def synth_transcripts(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(synth_transcripts_rows(**kw), schema=TRANSCRIPT_SCHEMA)
