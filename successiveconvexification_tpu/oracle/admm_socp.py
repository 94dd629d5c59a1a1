"""Dense float64 ADMM (operator-splitting) SOCP oracle — third solver family.

The reference cross-checks its subproblems against a SECOND independent conic
solver (SURVEY.md §2.1 C9: ECOS vs Mosek). Our dense NumPy IPM oracle
(``oracle/dense_socp.py``) and the in-graph TPU IPM share the published
NT-scaling/Mehrotra algorithm family, so their independence is limited to the
implementation level. This module restores ALGORITHM-level independence: an
OSQP/SCS-style ADMM splitting with conic projections — no NT scalings, no
Jordan algebra, no KKT Mehrotra steps — sharing nothing with the IPMs beyond
the problem definition.

Problem form (same as dense_socp.solve):

    min 1/2 x'Px + c'x   s.t.  A x = b,   G x + s = h,   s in K

Splitting: z = Cx with C = [A; G] must lie in Z = {b} x (h - K). Iteration
(OSQP with a general projectable set; alpha-relaxed):

    [P + sig*I  C'    ] [xt]   [sig*x^k - c          ]
    [C          -I/rho] [nu] = [z^k - y^k/rho        ]
    zt   = z^k + (nu - y^k) / rho
    x^+  = a*xt + (1-a)*x^k
    z^+  = Proj_Z(a*zt + (1-a)*z^k + y^k/rho)
    y^+  = y^k + rho*(a*zt + (1-a)*z^k - z^+)

The KKT matrix is constant: one dense factorization, O(iters) cheap solves.
First-order method: expect 1e-5-ish accuracy in a few thousand iterations —
plenty for an independent cross-check gate, not a production path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import scipy.linalg


@dataclasses.dataclass
class ADMMResult:
    x: np.ndarray
    y: np.ndarray          # multipliers for [A; G] rows (G rows = cone duals)
    z: np.ndarray          # final z = Cx iterate (constraint-space)
    iters: int
    pres: float
    dres: float
    converged: bool


def _proj_soc(v: np.ndarray) -> np.ndarray:
    """Euclidean projection onto the scalar-first second-order cone."""
    t, u = v[0], v[1:]
    nu = float(np.linalg.norm(u))
    if nu <= t:
        return v
    if nu <= -t:
        return np.zeros_like(v)
    a = 0.5 * (1.0 + t / nu)
    out = np.concatenate([[a * nu], a * u])
    return out


def _proj_cone(cones: List[Tuple[str, int]], v: np.ndarray) -> np.ndarray:
    out = np.empty_like(v)
    off = 0
    for kind, dim in cones:
        blk = v[off : off + dim]
        out[off : off + dim] = np.maximum(blk, 0.0) if kind == "lin" else _proj_soc(blk)
        off += dim
    return out


def solve(
    c: np.ndarray,
    A: np.ndarray,
    b: np.ndarray,
    G: np.ndarray,
    h: np.ndarray,
    cones: List[Tuple[str, int]],
    P: np.ndarray | None = None,
    rho: float = 1.0,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    max_iters: int = 20000,
    tol: float = 1e-7,
    check_every: int = 25,
) -> ADMMResult:
    n = c.shape[0]
    p_eq = A.shape[0] if A.size else 0
    m = G.shape[0]
    C = np.vstack([A.reshape(p_eq, n), G])
    q = np.concatenate([b.reshape(p_eq), h])
    nc = p_eq + m
    Pm = np.zeros((n, n)) if P is None else np.asarray(P, float)

    def proj_Z(v: np.ndarray) -> np.ndarray:
        out = v.copy()
        out[:p_eq] = q[:p_eq]
        out[p_eq:] = q[p_eq:] - _proj_cone(cones, q[p_eq:] - v[p_eq:])
        return out

    # per-row rho: equality rows get a much stiffer penalty (OSQP practice)
    rvec = np.full(nc, rho)
    rvec[:p_eq] = rho * 1e3

    KKT = np.block([
        [Pm + sigma * np.eye(n), C.T],
        [C, -np.diag(1.0 / rvec)],
    ])
    lu, piv = scipy.linalg.lu_factor(KKT)

    x = np.zeros(n)
    z = proj_Z(C @ x)
    y = np.zeros(nc)
    pres = dres = np.inf
    scale_p = max(1.0, float(np.linalg.norm(q)))
    scale_d = max(1.0, float(np.linalg.norm(c)))

    it = 0
    for it in range(1, max_iters + 1):
        rhs = np.concatenate([sigma * x - c, z - y / rvec])
        sol = scipy.linalg.lu_solve((lu, piv), rhs)
        xt, nu = sol[:n], sol[n:]
        zt = z + (nu - y) / rvec
        x = alpha * xt + (1.0 - alpha) * x
        zr = alpha * zt + (1.0 - alpha) * z
        z_new = proj_Z(zr + y / rvec)
        y = y + rvec * (zr - z_new)
        z = z_new

        if it % check_every == 0 or it == max_iters:
            Cx = C @ x
            pres = float(np.linalg.norm(Cx - z)) / scale_p
            dres = float(np.linalg.norm(Pm @ x + c + C.T @ y)) / scale_d
            if pres < tol and dres < tol:
                break

    return ADMMResult(
        x=x, y=y, z=z, iters=it, pres=pres, dres=dres,
        converged=bool(pres < tol and dres < tol),
    )
