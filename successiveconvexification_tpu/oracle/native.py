"""ctypes bindings for the native C++ SOCP oracle (csrc/scvx_oracle.cpp).

Builds the shared library on demand with g++ (cached next to the source; rebuilt
when the source is newer). API mirrors oracle.dense_socp.solve.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

from successiveconvexification_tpu.oracle.dense_socp import DenseSOCPResult

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "scvx_oracle.cpp")
_LIB = os.path.join(_REPO, "csrc", "liboracle.so")

_lib = None


def _build() -> str:
    if (not os.path.exists(_LIB)) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
        )
    return _LIB


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.scvx_oracle_solve.restype = ctypes.c_int
        lib.scvx_oracle_solve.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            dp, dp, dp, dp, dp,
            ctypes.c_int, ip, ip,
            dp,
            ctypes.c_double, ctypes.c_int, ctypes.c_double,
            dp, dp, dp, dp, dp,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _get_lib()
        return True
    except Exception:
        return False


def solve(
    c: np.ndarray,
    A: np.ndarray,
    b: np.ndarray,
    G: np.ndarray,
    h: np.ndarray,
    cones: List[Tuple[str, int]],
    P: np.ndarray | None = None,
    max_iters: int = 100,
    tol: float = 1e-10,
    reg: float = 1e-11,
) -> DenseSOCPResult:
    lib = _get_lib()
    n = int(c.shape[0])
    p = int(b.shape[0])
    m = int(h.shape[0])
    kinds = np.asarray([0 if k == "lin" else 1 for k, _ in cones], np.int32)
    dims = np.asarray([d for _, d in cones], np.int32)
    pdiag = None
    if P is not None:
        full = np.asarray(P, np.float64)
        pdiag = np.ascontiguousarray(np.diag(full))
        if not np.allclose(full, np.diag(pdiag)):
            raise ValueError("native oracle supports diagonal P only")

    def cd(a):
        return np.ascontiguousarray(np.asarray(a, np.float64)).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)
        )

    x = np.zeros(n)
    y = np.zeros(max(p, 1))
    z = np.zeros(m)
    s = np.zeros(m)
    stats = np.zeros(5)
    cA = np.ascontiguousarray(np.asarray(A, np.float64))
    cG = np.ascontiguousarray(np.asarray(G, np.float64))
    cc = np.ascontiguousarray(np.asarray(c, np.float64))
    cb = np.ascontiguousarray(np.asarray(b, np.float64))
    ch = np.ascontiguousarray(np.asarray(h, np.float64))
    ret = lib.scvx_oracle_solve(
        n, p, m,
        cc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cA.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cG.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ch.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(cones),
        kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cd(pdiag) if pdiag is not None else None,
        tol, max_iters, reg,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if ret != 0:
        raise RuntimeError(f"native oracle failed with code {ret}")
    return DenseSOCPResult(
        x=x, y=y[:p], z=z, s=s, iters=int(stats[3]),
        gap=float(stats[0]), pres=float(stats[1]), dres=float(stats[2]),
        converged=bool(stats[4]),
    )
