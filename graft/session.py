"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; on a real cluster the same settings
apply (AQE, Arrow, adaptive skew-join) and only executor topology changes
— the engine is launched via ``spark-submit --py-files graft.zip``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100-TB design point, harmless locally:
# - AQE on: runtime shuffle-partition coalescing + skew-join splitting is
#   the first line of defense against transcript-graph hub skew.
# - Arrow on: every pandas UDF (Leiden refinement kernel, CSR packing)
#   moves batches, not rows.
# - shuffle.partitions is a local default; clusters override via
#   spark-submit --conf (AQE coalescing makes the initial number mostly
#   a ceiling, not a tuning knob).
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.ui.enabled": "false",
    # local mode: the driver JVM hosts every executor thread. 16g is the
    # measured sweet spot on this 32-core box: 8g thrashes GC under 32
    # concurrent task buffers, while 48g made the identical superstep
    # job 1.8-2.6x SLOWER at local[32] (G1 with a huge young gen —
    # repeated profiling rounds r2, tools/prof_scaling2.py).
    "spark.driver.memory": "16g",
}


def get_spark(
    app_name: str = "graft",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the bench harness can run the identical job at two parallelism
    levels (the sandbox stand-in for N vs 4N executors).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
