"""Round-6 optimization measurement harness (bench.py stays frozen).

Re-runs the exact query cells bench.py times — same functions, same
inputs, same methodology — without the scaling cells, so an optimization
round can iterate on before/after numbers in ~10 minutes instead of the
full bench's ~50. Usage:

    python bench_extra.py [sections...]   # sections: queries powerlaw
                                          #           streaming warm

Prints one JSON line per section plus a combined line at the end.
"""

from __future__ import annotations

import json
import sys
import time

import bench
from graft.session import get_spark


def main() -> None:
    sections = sys.argv[1:] or ["queries", "powerlaw", "streaming", "warm"]
    out: dict = {}
    t0 = time.perf_counter()
    if "queries" in sections:
        spark = get_spark("graft-bench", master=f"local[{bench.CPUS}]")
        tq = time.perf_counter()
        out.update(bench.run_queries(spark))
        out["_headline_value"] = round(time.perf_counter() - tq, 3)
        spark.stop()
        time.sleep(5)
    if "powerlaw" in sections:
        out.update(bench.powerlaw_throughput())
        time.sleep(5)
    if "streaming" in sections:
        out.update(bench.streaming_ingest_bench())
        time.sleep(5)
    if "warm" in sections:
        out.update(bench.warm_refresh_bench())
    out["_total_wall"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
