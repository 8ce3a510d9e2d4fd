"""North-rule launch shape, measured literally: the same job submitted
via ``spark-submit --py-files graft.zip`` to a multi-executor cluster
at N and 4N EXECUTORS (separate JVMs, fixed 4-core / 4 GiB executor
size — ``local-cluster[1,4,4096]`` vs ``local-cluster[4,4,4096]``),
reporting throughput at both sizes plus scaling efficiency.

Single-box caveat (measured in BENCH/BASELINE.md): 4 executors x 4
cores = 16 cores share this host's one memory controller, so the
shuffle-/DRAM-bound jobs (sweep, PageRank) are expected to show the
bus ceiling at the high end, while the CPU-bound source-parallel
Brandes job tracks the host's own concurrency ceiling. On a real
cluster every executor node brings its own memory bus.

Usage::

    python tools/cluster_scaling.py [out.json]  # default BENCH/CLUSTER_SCALING_latest.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)
N_LO, N_HI = 1, 4
EXEC_CORES, EXEC_MB = 4, 4096


def _zip_package(zip_path: str) -> None:
    pkg = os.path.join(REPO, "graft")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    zf.write(full, os.path.relpath(full, REPO))


def _run(n_workers: int, edges: str, zip_path: str) -> dict:
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local-cluster[{n_workers},{EXEC_CORES},{EXEC_MB}]",
        "--driver-memory", "4g",
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "cluster_job.py"),
        "--edges", edges,
        "--reps", "2",
    ]
    print(
        f"[cluster] spark-submit local-cluster[{n_workers},{EXEC_CORES},"
        f"{EXEC_MB}] ...", file=sys.stderr, flush=True,
    )
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, env=env,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"spark-submit failed rc={proc.returncode}")
    line = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ][-1]
    out = json.loads(line)
    out["n_executors"] = n_workers
    out["executor_cores"] = EXEC_CORES
    print(f"[cluster] N={n_workers}: {line}", file=sys.stderr, flush=True)
    return out


def _merge_runs(a: dict, b: dict) -> dict:
    """Pool a second cluster run into a first (same statistic family as
    bench.py): per-index sweep minima, pooled (lo, hi) wall pairs with
    the consistent (min hi − min lo)/span marginal."""
    out = dict(a)
    reps = a["sweep"]["durations_per_rep"] + b["sweep"]["durations_per_rep"]
    n_idx = min(len(r) for r in reps)
    per_idx = [min(r[i] for r in reps) for i in range(n_idx)]
    sm = sum(per_idx) / len(per_idx)
    out["sweep"] = {
        **a["sweep"],
        "durations_per_rep": reps,
        "marginal_sec_per_sweep": round(sm, 3),
        "rows_per_sec": round(a["sym_edge_rows"] / sm, 1),
    }

    def pool(job: str, span: float, m_key: str, r_key: str, rate_num: float):
        pairs = a[job]["wall_sec_pairs"] + b[job]["wall_sec_pairs"]
        m = (min(p[1] for p in pairs) - min(p[0] for p in pairs)) / span
        d = {**a[job], "wall_sec_pairs": pairs}
        d[m_key] = round(m, 5)
        d[r_key] = round(rate_num / m, 3) if m > 0 else None
        out[job] = d

    pool("pagerank", 5.0, "marginal_sec_per_superstep", "rows_per_sec",
         float(a["sym_edge_rows"]))
    pool("brandes", float(a["brandes"]["k_hi"] - a["brandes"]["k_lo"]),
         "marginal_sec_per_source", "sources_per_sec", 1.0)
    return out


def main() -> None:
    from bench import synth_powerlaw_parquet

    edges = synth_powerlaw_parquet(4_000_000)
    zip_path = os.path.join(REPO, "graft.zip")
    _zip_package(zip_path)
    lo = _run(N_LO, edges, zip_path)
    hi = _run(N_HI, edges, zip_path)

    def eff(job: str, key: str) -> float | None:
        lo_r, hi_r = lo[job][key], hi[job][key]
        if not lo_r or not hi_r:
            return None  # a side with no usable pair: no honest ratio
        return round(hi_r / (4.0 * lo_r), 3)

    # retry-and-pool (bounded, one extra run pair) when the CPU-bound
    # cell — the one expected to scale on this box — reads abnormal:
    # same both-direction rationale as bench.py._abnormal
    br = eff("brandes", "sources_per_sec")
    if br is None or br < 0.82 or br > 1.05:
        print(f"[cluster] brandes eff {br} abnormal; pooling an extra "
              "run pair", file=sys.stderr, flush=True)
        lo = _merge_runs(lo, _run(N_LO, edges, zip_path))
        hi = _merge_runs(hi, _run(N_HI, edges, zip_path))

    result = {
        "protocol": (
            "spark-submit --py-files graft.zip tools/cluster_job.py at "
            f"local-cluster[{N_LO},{EXEC_CORES},{EXEC_MB}] vs "
            f"local-cluster[{N_HI},{EXEC_CORES},{EXEC_MB}] — N vs 4N "
            "separate executor JVMs, fixed executor size; interleaved "
            "(lo, hi) wall pairs after warm-up, min positive per-pair "
            "differenced marginal (load cancels within a pair)"
        ),
        "low": lo,
        "high": hi,
        "efficiency": {
            "sweep": eff("sweep", "rows_per_sec"),
            "pagerank": eff("pagerank", "rows_per_sec"),
            "brandes": eff("brandes", "sources_per_sec"),
        },
    }
    dest = (sys.argv[1] if len(sys.argv) > 1 else
            os.path.join(REPO, "BENCH", "CLUSTER_SCALING_latest.json"))
    with open(dest, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"efficiency": result["efficiency"], "detail": dest}))


if __name__ == "__main__":
    main()
