"""Dense float64 SOCP interior-point oracle (NumPy, CPU).

Ground-truth conic solver for testing the in-graph TPU IPM (SURVEY.md §4.2: the
reference's ECOS cannot run here — no Julia, no network — so correctness is anchored
to this independently-implemented high-accuracy solver plus KKT-residual
certificates). Standard form:

    min c'x   s.t.  A x = b,   G x + s = h,   s in K = R+^l x SOC(d1) x ...

Same mathematical algorithm family as the structured solver (NT scaling + Mehrotra),
but a completely separate code path: dense NumPy linear algebra, full KKT matrix,
scipy LU — so shared-bug risk is limited to the published textbook formulas, which
tests/test_cones.py verifies against first principles independently.

Also used for small random-SOCP property tests with constructed primal-dual optimal
pairs (tests/test_ipm_oracle.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import scipy.linalg


@dataclasses.dataclass
class DenseSOCPResult:
    x: np.ndarray
    y: np.ndarray
    z: np.ndarray
    s: np.ndarray
    iters: int
    gap: float
    pres: float
    dres: float
    converged: bool


def _cone_slices(cones: List[Tuple[str, int]]):
    out = []
    off = 0
    for kind, d in cones:
        out.append((kind, slice(off, off + d)))
        off += d
    return out, off


def _degree(cones):
    return sum(d if kind == "lin" else 1 for kind, d in cones)


def _identity(cones, m):
    e = np.zeros(m)
    for kind, sl in cones:
        if kind == "lin":
            e[sl] = 1.0
        else:
            e[sl.start] = 1.0
    return e


def _interior_shift(cones, v):
    alpha = 0.0
    for kind, sl in cones:
        vv = v[sl]
        if kind == "lin":
            alpha = max(alpha, -vv.min() if vv.size else 0.0)
        else:
            alpha = max(alpha, np.linalg.norm(vv[1:]) - vv[0])
    return alpha


def _nt_scaling(cones, m, s, z):
    """Return W and W^-1 as dense matrices (oracle only; O(m^2) fine)."""
    W = np.zeros((m, m))
    Winv = np.zeros((m, m))
    for kind, sl in cones:
        ss, zz = s[sl], z[sl]
        if kind == "lin":
            w = np.sqrt(ss / zz)
            W[sl, sl] = np.diag(w)
            Winv[sl, sl] = np.diag(1.0 / w)
        else:
            d = ss.shape[0]
            J = np.diag([1.0] + [-1.0] * (d - 1))
            # iterates can graze the cone boundary in late iterations; floor
            # the quadratic residues so the NT scaling stays finite (the
            # solver then terminates on its own residual checks)
            rs = max(ss @ J @ ss, 1e-300)
            rz = max(zz @ J @ zz, 1e-300)
            sbar = ss / np.sqrt(rs)
            zbar = zz / np.sqrt(rz)
            gamma = np.sqrt((1.0 + sbar @ zbar) / 2.0)
            wbar = (sbar + J @ zbar) / (2.0 * gamma)
            eta = (rs / rz) ** 0.25
            a, bb = wbar[0], wbar[1:]
            M = np.zeros((d, d))
            M[0, 0] = a
            M[0, 1:] = bb
            M[1:, 0] = bb
            M[1:, 1:] = np.eye(d - 1) + np.outer(bb, bb) / (1.0 + a)
            W[sl, sl] = eta * M
            Minv = np.zeros((d, d))
            Minv[0, 0] = a
            Minv[0, 1:] = -bb
            Minv[1:, 0] = -bb
            Minv[1:, 1:] = np.eye(d - 1) + np.outer(bb, bb) / (1.0 + a)
            Winv[sl, sl] = Minv / eta
    return W, Winv


def _jordan_mul(cones, u, v):
    out = np.zeros_like(u)
    for kind, sl in cones:
        uu, vv = u[sl], v[sl]
        if kind == "lin":
            out[sl] = uu * vv
        else:
            out[sl.start] = uu @ vv
            out[sl.start + 1 : sl.stop] = uu[0] * vv[1:] + vv[0] * uu[1:]
    return out


def _jordan_solve(cones, lam, d):
    out = np.zeros_like(d)
    for kind, sl in cones:
        ll, dd = lam[sl], d[sl]
        if kind == "lin":
            out[sl] = dd / ll
        else:
            det = ll[0] ** 2 - ll[1:] @ ll[1:]
            x0 = (ll[0] * dd[0] - ll[1:] @ dd[1:]) / det
            out[sl.start] = x0
            out[sl.start + 1 : sl.stop] = (dd[1:] - x0 * ll[1:]) / ll[0]
    return out


def _max_step(cones, s, ds):
    alpha = np.inf
    for kind, sl in cones:
        ss, dd = s[sl], ds[sl]
        if kind == "lin":
            neg = dd < 0
            if neg.any():
                alpha = min(alpha, np.min(-ss[neg] / dd[neg]))
        else:
            J = np.diag([1.0] + [-1.0] * (ss.shape[0] - 1))
            c = ss @ J @ ss
            b = ss @ J @ dd
            a = dd @ J @ dd
            if abs(a) < 1e-300:
                if b < 0:
                    alpha = min(alpha, -c / (2 * b))
            else:
                disc = b * b - a * c
                if disc >= 0:
                    sq = np.sqrt(disc)
                    for r in ((-b - sq) / a, (-b + sq) / a):
                        if r > 0:
                            alpha = min(alpha, r)
            if dd[0] < 0:
                alpha = min(alpha, -ss[0] / dd[0])
    return alpha


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
    """Mehrotra predictor-corrector conic IPM, dense f64.

    ``P`` is an optional PSD quadratic-cost/pin diagonal matrix (min 0.5 x'Px + c'x).
    """
    cones_s, m = _cone_slices(cones)
    n = c.shape[0]
    p = b.shape[0]
    deg = _degree(cones)
    e = _identity(cones_s, m)
    if P is None:
        P = np.zeros((n, n))

    def kkt_factor(W):
        """LU-factor the regularized KKT once per NT scaling (the predictor
        and corrector share it — the factorization is the dominant cost)."""
        WtW = W @ W
        Kmat = np.zeros((n + p + m, n + p + m))
        Kmat[:n, :n] = P + reg * np.eye(n)
        Kmat[:n, n : n + p] = A.T
        Kmat[:n, n + p :] = G.T
        Kmat[n : n + p, :n] = A
        Kmat[n : n + p, n : n + p] = -reg * np.eye(p)
        Kmat[n + p :, :n] = G
        Kmat[n + p :, n + p :] = -WtW
        lu = scipy.linalg.lu_factor(Kmat)
        Ktrue = Kmat.copy()
        Ktrue[:n, :n] = P
        Ktrue[n : n + p, n : n + p] = 0.0
        return lu, Ktrue

    def kkt_solve_fac(fac, bx, by, bz):
        """Solve against a cached factorization + one refinement pass vs the
        unregularized system."""
        lu, Ktrue = fac
        rhs = np.concatenate([bx, by, bz])
        sol = scipy.linalg.lu_solve(lu, rhs)
        sol = sol + scipy.linalg.lu_solve(lu, rhs - Ktrue @ sol)
        return sol[:n], sol[n : n + p], sol[n + p :]

    # --- init (W = I; both solves share one factorization) ----------------
    fac0 = kkt_factor(np.eye(m))
    x, y, _ = kkt_solve_fac(fac0, np.zeros(n), b, h)
    s = h - G @ x
    a = _interior_shift(cones_s, s)
    s = s + (1.0 + a) * e
    xd, y, z = kkt_solve_fac(fac0, -c, np.zeros(p), np.zeros(m))
    a = _interior_shift(cones_s, z)
    z = z + (1.0 + a) * e

    cnorm = max(1.0, np.linalg.norm(c))
    bnorm = max(1.0, np.linalg.norm(b))
    hnorm = max(1.0, np.linalg.norm(h))

    gap = pres = dres = np.inf
    it = 0
    for it in range(1, max_iters + 1):
        rx = P @ x + c + A.T @ y + G.T @ z
        ry = A @ x - b
        rz = G @ x + s - h
        sz = s @ z
        mu = sz / deg
        gap = sz / max(1.0, abs(c @ x))
        pres = np.sqrt(np.linalg.norm(ry) ** 2 + np.linalg.norm(rz) ** 2) / max(
            bnorm, hnorm
        )
        dres = np.linalg.norm(rx) / cnorm
        if gap < tol and pres < tol and dres < tol:
            return DenseSOCPResult(x, y, z, s, it - 1, gap, pres, dres, True)

        W, Winv = _nt_scaling(cones_s, m, s, z)
        if not (np.all(np.isfinite(W)) and np.all(np.isfinite(Winv))):
            # scaling broke down at the cone boundary; current iterate is final
            return DenseSOCPResult(x, y, z, s, it, gap, pres, dres,
                                   gap < 1e-7 and pres < 1e-7 and dres < 1e-7)
        lam = W @ z

        ds_t = _jordan_mul(cones_s, lam, lam)
        bz_a = -rz + W @ _jordan_solve(cones_s, lam, ds_t)
        fac = kkt_factor(W)
        dx_a, dy_a, dz_a = kkt_solve_fac(fac, -rx, -ry, bz_a)
        ds_a = -rz - G @ dx_a

        alpha_aff = min(
            1.0, _max_step(cones_s, s, ds_a), _max_step(cones_s, z, dz_a)
        )
        mu_aff = (s + alpha_aff * ds_a) @ (z + alpha_aff * dz_a) / deg
        eta = np.clip((mu_aff / mu) ** 3, 0.0, 1.0)

        gamma = _jordan_mul(cones_s, Winv @ ds_a, W @ dz_a)
        ds_t2 = ds_t + gamma - eta * mu * e
        bz_c = -rz + W @ _jordan_solve(cones_s, lam, ds_t2)
        dx, dy, dz = kkt_solve_fac(fac, -rx, -ry, bz_c)
        ds = -rz - G @ dx

        if not all(np.all(np.isfinite(v)) for v in (dx, dy, dz, ds)):
            # numerically exhausted (typically mu ~ machine eps on degenerate
            # problems): return the current iterate
            return DenseSOCPResult(x, y, z, s, it, gap, pres, dres,
                                   gap < 1e-7 and pres < 1e-7 and dres < 1e-7)
        alpha = min(
            1.0, 0.98 * min(_max_step(cones_s, s, ds), _max_step(cones_s, z, dz))
        )
        x = x + alpha * dx
        y = y + alpha * dy
        z = z + alpha * dz
        s = s + alpha * ds

    return DenseSOCPResult(x, y, z, s, it, gap, pres, dres, False)
