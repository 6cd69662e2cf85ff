"""ctypes bindings to the native C++ QP solver (rnm_qp.cpp, shipped in-package).

The shared library is compiled on demand with g++ and cached next to the
source (falling back to ~/.cache/rnm_qp when the package directory is not
writable, e.g. a system-site wheel install). This is the native-runtime
counterpart of the reference's code-generated OSQP C extension
(solver/qp_jit.py backends), minus the codegen workflow: one solver binary
handles every problem shape.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent / "rnm_qp.cpp"


def _pick_build_dir() -> Path:
    cand = _SRC.parent / "build"
    if os.access(_SRC.parent, os.W_OK):
        return cand
    return Path(os.path.expanduser("~/.cache/rnm_qp"))


_BUILD_DIR = _pick_build_dir()
_LIB = _BUILD_DIR / "librnm_qp.so"

_lib = None


def _build():
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", str(_LIB), str(_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native library. Returns the ctypes lib."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    d = ctypes.POINTER(ctypes.c_double)
    lib.rnm_qp_solve.restype = ctypes.c_int
    lib.rnm_qp_solve.argtypes = (
        [ctypes.c_int] * 5
        + [d] * 14
        + [ctypes.c_int, ctypes.c_double]
        + [d] * 6
    )
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _arr(a):
    a = np.ascontiguousarray(np.asarray(a, dtype=np.float64))
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def qp_solve_native(stat, data, max_iter=50, tol=1e-9):
    """Solve a structured QP with the native backend.

    stat/data mirror ops.qp_ipm.QPStatics/QPData with *time-invariant*
    (2-D) statics. Returns a dict with X, U, lam, lam_f, nu_dyn, cost,
    kkt_res, iters, success.
    """
    lib = load()
    A = np.asarray(data.A, np.float64)
    N, nx, _ = A.shape
    nu = np.asarray(data.B).shape[2]
    Gx = np.asarray(stat.Gx, np.float64)
    assert Gx.ndim == 2, "native backend takes time-invariant statics"
    ni = Gx.shape[0]
    ni_f = np.asarray(stat.Gf).shape[0]

    ins = [
        _arr(data.A), _arr(data.B), _arr(data.c),
        _arr(stat.Hx), _arr(stat.Hu), _arr(stat.HxN),
        _arr(stat.Gx), _arr(stat.Gu), _arr(stat.Gf),
        _arr(data.qx), _arr(data.qu), _arr(data.h), _arr(data.hf),
        _arr(data.xinit),
    ]
    X = np.zeros((N + 1, nx))
    U = np.zeros((N, nu))
    lam = np.zeros((N, ni))
    lam_f = np.zeros(ni_f)
    nu_dyn = np.zeros((N, nx))
    info = np.zeros(3)
    outs = [_arr(X), _arr(U), _arr(lam), _arr(lam_f), _arr(nu_dyn), _arr(info)]

    status = lib.rnm_qp_solve(
        N, nx, nu, ni, ni_f,
        *[p for (_, p) in ins],
        int(max_iter), float(tol),
        *[p for (_, p) in outs],
    )
    X, U, lam, lam_f, nu_dyn, info = [a for (a, _) in outs]
    return {
        "X": X, "U": U, "lam": lam, "lam_f": lam_f, "nu_dyn": nu_dyn,
        "cost": float(info[2]), "kkt_res": float(info[0]),
        "iters": int(info[1]), "success": status == 0,
        "status": status,
    }
