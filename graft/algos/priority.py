"""Deterministic vertex priorities reproducible outside Spark.

Luby MIS and Jones–Plassmann coloring need a fixed random-looking
priority per vertex. r3 used ``xxhash64(id, seed)``, which is
JVM-private — no external system can replay it, so those contract rows
could only be checked rows-only. The md5-prefix priority here is
bit-identical in any engine with md5 (DuckDB, Postgres, Python
hashlib): the first 15 hex digits of ``md5(f"{id}:{seed}")`` parsed as
a base-16 integer — 60 bits, collision-free in practice at any
realistic vertex count, and ties are broken by vertex id anyway. md5
is a JVM codegen built-in like xxhash64; the priority is computed once
per vertex per round over the (small, shrinking) undecided set, so the
swap costs nothing at scale while making the driver's DuckDB oracle an
exact replay.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_priority(col: Column, seed: int) -> Column:
    """60-bit deterministic priority: int(md5(f"{v}:{seed}")[:15], 16).

    SQL twin (DuckDB): ``('0x' || substr(md5(v || ':seed'), 1, 15))
    ::BIGINT`` — verified bit-identical in tests/test_mis.py and
    tests/test_coloring.py oracle-certificate tests."""
    return F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(col.cast("string"), F.lit(f":{seed}")),
                    "UTF-8",
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
