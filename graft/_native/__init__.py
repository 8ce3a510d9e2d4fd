"""ctypes loader for the native sequential-tail kernels.

The C sources in ``kernels.c`` are exact replicas of the Python/numpy
reference implementations (see the file header there); this module
compiles them on first use with the system C compiler (``cc -O2
-ffp-contract=off``), caches the shared object under a content-hashed
path, and exposes thin numpy wrappers.  Everything degrades gracefully:
no compiler, a failed compile, or ``GRAFT_NO_CKERN=1`` simply leaves
``lib() is None`` and the callers keep their pure-Python paths.

The RNG-dependent refine path is additionally gated on an import-time
self-check that the C permutation generator reproduces
``np.random.default_rng(seed).permutation(n)`` bit-for-bit for a spread
of seeds and lengths; if numpy's stream ever changes, the check fails
and only the permutation-free kernels stay in use.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "kernels.c")

_lib = None
_tried = False
_rng_ok: bool | None = None

_I64 = ctypes.POINTER(ctypes.c_int64)
_F64 = ctypes.POINTER(ctypes.c_double)


def _compile() -> ctypes.CDLL | None:
    with open(_SRC, "rb") as fh:
        src = fh.read()
    digest = hashlib.sha256(src).hexdigest()[:16]
    cache = os.environ.get("GRAFT_CKERN_CACHE") or os.path.join(
        tempfile.gettempdir(), "graft-ckern"
    )
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"kernels-{digest}.so")
    if not os.path.exists(so_path):
        fd, tmp = tempfile.mkstemp(dir=cache, suffix=".so.tmp")
        os.close(fd)
        try:
            subprocess.run(
                [
                    "cc", "-O2", "-ffp-contract=off", "-fPIC", "-shared",
                    "-o", tmp, _SRC,
                ],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)  # atomic; concurrent compiles race benignly
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    lib = ctypes.CDLL(so_path)
    lib.np_permutation.argtypes = [ctypes.c_uint64, ctypes.c_int64, _I64]
    lib.np_permutation.restype = None
    lib.csr_build.argtypes = [
        ctypes.c_int64, ctypes.c_int64, _I64, _I64, _F64, _I64, _I64, _F64,
    ]
    lib.csr_build.restype = None
    lib.local_move.argtypes = [
        ctypes.c_int64, ctypes.c_int64, _I64, _I64, _F64, _I64, _F64,
        _I64, _I64, _F64, _I64, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, _I64, _I64,
    ]
    lib.local_move.restype = None
    lib.refine_batch.argtypes = [
        ctypes.c_int64, _I64, _I64, _I64, _I64, _I64, _I64, _I64, _F64,
        ctypes.c_double, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _I64,
    ]
    lib.refine_batch.restype = None
    return lib


def lib() -> ctypes.CDLL | None:
    """The compiled kernel library, or None when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("GRAFT_NO_CKERN"):
        return None
    try:
        _lib = _compile()
    except Exception:
        _lib = None
    return _lib


def _as_i64(a: np.ndarray) -> ctypes.POINTER(ctypes.c_int64):
    return a.ctypes.data_as(_I64)


def _as_f64(a: np.ndarray) -> ctypes.POINTER(ctypes.c_double):
    return a.ctypes.data_as(_F64)


def rng_ok() -> bool:
    """True when the C permutation matches numpy's stream exactly."""
    global _rng_ok
    if _rng_ok is not None:
        return _rng_ok
    L = lib()
    if L is None:
        _rng_ok = False
        return False
    try:
        rs = np.random.default_rng(99)
        seeds = [0, 1, 2, 1234, 2**32 - 1, 2**32, 2**62 + 12345] + [
            int(x) for x in rs.integers(0, 2**63, size=40)
        ]
        lens = [1, 2, 3, 5, 17, 64, 255, 1000]
        for sd in seeds:
            for n in lens:
                out = np.empty(n, dtype=np.int64)
                L.np_permutation(
                    ctypes.c_uint64(sd), ctypes.c_int64(n), _as_i64(out)
                )
                ref = np.random.default_rng(sd).permutation(n)
                if not np.array_equal(out, ref):
                    _rng_ok = False
                    return False
        _rng_ok = True
    except Exception:
        _rng_ok = False
    return _rng_ok


def permutation(seedval: int, n: int) -> np.ndarray:
    """np.random.default_rng(seedval).permutation(n) via the C stream."""
    L = lib()
    out = np.empty(n, dtype=np.int64)
    L.np_permutation(ctypes.c_uint64(seedval), ctypes.c_int64(n), _as_i64(out))
    return out


def csr_build(
    n: int, eu: np.ndarray, ev: np.ndarray, ew: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    L = lib()
    if L is None:
        return None
    mh = len(eu)
    eu = np.ascontiguousarray(eu, dtype=np.int64)
    ev = np.ascontiguousarray(ev, dtype=np.int64)
    ew = np.ascontiguousarray(ew, dtype=np.float64)
    indptr = np.empty(n + 1, dtype=np.int64)
    nbr = np.empty(2 * mh, dtype=np.int64)
    wgt = np.empty(2 * mh, dtype=np.float64)
    L.csr_build(
        ctypes.c_int64(n), ctypes.c_int64(mh), _as_i64(eu), _as_i64(ev),
        _as_f64(ew), _as_i64(indptr), _as_i64(nbr), _as_f64(wgt),
    )
    return indptr, nbr, wgt


def local_move(
    indptr: np.ndarray,
    nbr: np.ndarray,
    wgt: np.ndarray,
    size: np.ndarray,
    strength: np.ndarray,
    comm: np.ndarray,
    n_c: np.ndarray,
    stot: np.ndarray,
    perm: np.ndarray,
    objective: str,
    gamma: float,
    m: float,
) -> tuple[int, int] | None:
    """Run the queue-greedy local moving in C; mutates ``comm`` (and the
    aggregate arrays) in place.  Returns (visits, moves) or None when the
    library is unavailable."""
    L = lib()
    if L is None:
        return None
    n = len(comm)
    n_slots = len(n_c)
    visits = np.zeros(1, dtype=np.int64)
    moves = np.zeros(1, dtype=np.int64)
    L.local_move(
        ctypes.c_int64(n), ctypes.c_int64(n_slots), _as_i64(indptr),
        _as_i64(nbr), _as_f64(wgt), _as_i64(size), _as_f64(strength),
        _as_i64(comm), _as_i64(n_c), _as_f64(stot), _as_i64(perm),
        ctypes.c_int(1 if objective == "cpm" else 0),
        ctypes.c_double(gamma), ctypes.c_double(m),
        _as_i64(visits), _as_i64(moves),
    )
    return int(visits[0]), int(moves[0])


def refine_batch(
    node_start: np.ndarray,
    edge_start: np.ndarray,
    sizes: np.ndarray,
    s_tot: np.ndarray,
    comm_label: np.ndarray,
    eu: np.ndarray,
    ev: np.ndarray,
    ew: np.ndarray,
    gamma: float,
    seed: int,
) -> np.ndarray | None:
    """Batched _refine_core over groups (see kernels.c); returns
    group-local founder indices per member, or None when unavailable or
    the RNG self-check failed."""
    if not rng_ok():
        return None
    L = lib()
    n_groups = len(node_start) - 1
    node_start = np.ascontiguousarray(node_start, dtype=np.int64)
    edge_start = np.ascontiguousarray(edge_start, dtype=np.int64)
    sizes = np.ascontiguousarray(sizes, dtype=np.int64)
    s_tot = np.ascontiguousarray(s_tot, dtype=np.int64)
    comm_label = np.ascontiguousarray(comm_label, dtype=np.int64)
    eu = np.ascontiguousarray(eu, dtype=np.int64)
    ev = np.ascontiguousarray(ev, dtype=np.int64)
    ew = np.ascontiguousarray(ew, dtype=np.float64)
    out = np.empty(int(node_start[-1]), dtype=np.int64)
    max_k = int(np.max(np.diff(node_start))) if n_groups else 0
    max_e = int(np.max(np.diff(edge_start))) if n_groups else 0
    L.refine_batch(
        ctypes.c_int64(n_groups), _as_i64(node_start), _as_i64(edge_start),
        _as_i64(sizes), _as_i64(s_tot), _as_i64(comm_label), _as_i64(eu),
        _as_i64(ev), _as_f64(ew), ctypes.c_double(gamma),
        ctypes.c_int64(seed), ctypes.c_int64(max_k), ctypes.c_int64(max_e),
        _as_i64(out),
    )
    return out
