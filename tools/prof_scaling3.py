"""Validate the bench scaling configuration across core counts on the
current code (co-partitioned transition, chained supersteps).

Usage: python tools/prof_scaling3.py [cores ...]   (default: 1 4 32)
"""
from __future__ import annotations

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import scaling_run  # noqa: E402


def main() -> None:
    cores_list = [int(c) for c in sys.argv[1:]] or [1, 4, 32]
    out = {}
    for cores in cores_list:
        for rep in range(2):
            key = f"local[{cores}]#{rep}"
            try:
                r = scaling_run(cores)
                out[key] = {
                    "sec": r["seconds"],
                    "eps": r["edges_per_sec_per_superstep"],
                }
            except Exception as e:  # noqa: BLE001
                out[key] = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"[prof3] {key}: {out[key]}", file=sys.stderr, flush=True)
            time.sleep(3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
