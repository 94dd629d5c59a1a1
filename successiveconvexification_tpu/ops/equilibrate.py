"""Structured Ruiz equilibration of the stage SOCP (SURVEY §7 hard-part-1).

The reference's external conic solver presolves every subproblem with a
Ruiz-style scaling pass (SURVEY.md §3.3: "presolve/scaling (Ruiz-like
equilibration)"). This module is the TPU-native equivalent, specialized to the
structured ``StageSOCP`` operators instead of a general sparse matrix: a few
fixed in-graph iterations of row/column infinity-norm balancing over the
implicit constraint matrix [A; G], plus a scalar objective scaling.

Why it matters here: the subproblem data mixes O(1) nondimensionalized
dynamics rows with penalty objective coefficients of 1e2-1e3 and trust radii
spanning 1e-4..1e2. The f32 in-graph IPM's NT scalings and KKT factorizations
see that spread directly; equilibration compresses it, which cuts IPM
iteration counts and makes warm starts robust enough that the conelp cold
init does not have to be recomputed on every call.

Structure (see ops/socp.py::StageSOCP):

  variables   w (K, nw), p,q (K-1, nx), sigma ()
  equalities  E w_k + F w_{k+1} + g_sig*sig - p + q = b       rows (K-1, nrx)
  cones       G_lin w <= h_lin, (p,q) >= 0, G_sig*sig <= h_sig,
              SOC groups G_soc w + s = h_soc (incl. the trust-region cone)

Scalings: positive column scales ``dw`` (per w entry) and ``dsig``; positive
row scales per equality row (``ry``) and per cone row, with SOC groups scaled
by ONE scalar per cone (anything else would destroy cone membership). The
p/q columns are scaled analytically by ``dp = 1/ry[:, :nx]`` so their entries
in the equality rows AND the (p,q) orthant rows stay exactly 1 — they never
participate in the iteration. A final scalar ``tau`` normalizes the objective
(CVXOPT-style cost scaling), which is where the big penalty weights go.

All scalings are plain elementwise multiplies / small reductions: the pass
costs a fraction of one KKT factorization and runs per-lane under ``vmap``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from successiveconvexification_tpu.ops.socp import Primal, StageSOCP


class EqScales(NamedTuple):
    """Positive scale factors mapping the raw problem to the equilibrated one."""

    dw: jnp.ndarray             # (K, nw)   column scales for w
    dsig: jnp.ndarray           # ()        column scale for sigma
    ry: jnp.ndarray             # (K-1, nrx) equality row scales
    rlin: jnp.ndarray           # (K, nl)   linear cone row scales
    rsocs: Tuple[jnp.ndarray, ...]  # each (K,) one scalar per SOC (last = tr)
    rsig: jnp.ndarray           # (4,)      sigma-row scales
    tau: jnp.ndarray            # ()        objective scale


def _inv(x):
    """Safe reciprocal-sqrt style guard: 1/x where x > 0, else 1."""
    return jnp.where(x > 0.0, 1.0 / jnp.maximum(x, 1e-30), 1.0)


def _rs(norm):
    """Ruiz update factor 1/sqrt(norm) with zero-row/col guard."""
    return jnp.where(norm > 0.0, jax.lax.rsqrt(jnp.maximum(norm, 1e-30)), 1.0)


def equilibrate(d: StageSOCP, iters: int = 3) -> Tuple[StageSOCP, EqScales]:
    """Ruiz-equilibrate a StageSOCP. Returns (scaled problem, scales).

    ``iters`` is static (unrolled): 2-3 passes get the scaled matrix's
    row/col norms within a small factor of 1, which is all the IPM needs.
    """
    K, nw = d.c_w.shape
    nx = d.c_p.shape[-1]
    dtype = d.c_w.dtype

    aG_lin = jnp.abs(d.G_lin)                       # (K, nl, nw)
    aG_socs = tuple(jnp.abs(G) for G in d.G_socs)   # (K, di, nw)
    aG_sig = jnp.abs(d.G_sig)                       # (4,)
    aE = jnp.abs(d.E)                               # (K-1, nrx, nw)
    aF = jnp.abs(d.F)                               # (K-1, nrx, nw)
    ag_sig = jnp.abs(d.g_sig)                       # (K-1, nrx)

    dw = jnp.ones((K, nw), dtype)
    dsig = jnp.ones((), dtype)
    ry = jnp.ones_like(d.b)
    rlin = jnp.ones_like(d.h_lin)
    rsocs = tuple(jnp.ones((K,), dtype) for _ in d.G_socs)
    rsig = jnp.ones((4,), dtype)

    for _ in range(iters):
        # ---- row norms of the currently-scaled matrix, row-scale update ----
        n_lin = rlin * jnp.max(aG_lin * dw[:, None, :], axis=-1)
        rlin = rlin * _rs(n_lin)

        new_rsocs = []
        for aG, rs in zip(aG_socs, rsocs):
            # one norm per cone: max over the cone's rows and columns
            n = rs * jnp.max(aG * dw[:, None, :], axis=(-2, -1))
            new_rsocs.append(rs * _rs(n))
        rsocs = tuple(new_rsocs)

        n_sig = rsig * aG_sig * dsig
        rsig = rsig * _rs(n_sig)

        n_eq = jnp.maximum(
            jnp.max(aE * dw[:-1, None, :], axis=-1),
            jnp.max(aF * dw[1:, None, :], axis=-1),
        )
        n_eq = jnp.maximum(n_eq, ag_sig * dsig)
        n_eq = ry * n_eq
        # the p/q entries on the dynamics rows are pinned at exactly 1 by the
        # dp = 1/ry construction, independent of ry — include them
        n_eq = n_eq.at[:, :nx].max(1.0)
        ry = ry * _rs(n_eq)

        # ---- column norms, column-scale update -----------------------------
        cw = jnp.max(aG_lin * rlin[:, :, None], axis=-2)            # (K, nw)
        for aG, rs in zip(aG_socs, rsocs):
            cw = jnp.maximum(cw, rs[:, None] * jnp.max(aG, axis=-2))
        ce = jnp.max(aE * ry[:, :, None], axis=-2)                  # (K-1, nw)
        cf = jnp.max(aF * ry[:, :, None], axis=-2)                  # (K-1, nw)
        pad = jnp.zeros((1, nw), dtype)
        cw = jnp.maximum(cw, jnp.concatenate([ce, pad], 0))
        cw = jnp.maximum(cw, jnp.concatenate([pad, cf], 0))
        cw = dw * cw
        dw = dw * _rs(cw)

        c_sig_col = dsig * jnp.maximum(
            jnp.max(rsig * aG_sig), jnp.max(ry * ag_sig)
        )
        dsig = dsig * _rs(c_sig_col)

    # ---- objective scaling (the penalty weights live here) -----------------
    dp = _inv(ry[:, :nx])  # p/q column scales (see module docstring)
    cmax = jnp.maximum(
        jnp.max(jnp.abs(d.c_w) * dw),
        jnp.abs(d.c_sig) * dsig,
    )
    cmax = jnp.maximum(cmax, jnp.max(jnp.abs(d.c_p) * dp))
    cmax = jnp.maximum(cmax, jnp.max(jnp.abs(d.c_q) * dp))
    tau = _inv(jnp.maximum(cmax, 1.0))

    d_eq = d._replace(
        c_w=tau * dw * d.c_w,
        c_p=tau * dp * d.c_p,
        c_q=tau * dp * d.c_q,
        c_sig=tau * dsig * d.c_sig,
        Q_w=tau * dw * dw * d.Q_w,
        Q_sig=tau * dsig * dsig * d.Q_sig,
        Q_r1=jnp.sqrt(tau) * d.Q_r1 * dw[:, None, :],
        G_lin=rlin[:, :, None] * d.G_lin * dw[:, None, :],
        h_lin=rlin * d.h_lin,
        G_socs=tuple(
            rs[:, None, None] * G * dw[:, None, :]
            for rs, G in zip(rsocs, d.G_socs)
        ),
        h_socs=tuple(
            rs[:, None] * h for rs, h in zip(rsocs, d.h_socs)
        ),
        G_sig=rsig * d.G_sig * dsig,
        h_sig=rsig * d.h_sig,
        E=ry[:, :, None] * d.E * dw[:-1, None, :],
        F=ry[:, :, None] * d.F * dw[1:, None, :],
        g_sig=ry * d.g_sig * dsig,
        b=ry * d.b,
    )
    return d_eq, EqScales(
        dw=dw, dsig=dsig, ry=ry, rlin=rlin, rsocs=rsocs, rsig=rsig, tau=tau
    )


def _row_scales(eq: EqScales, nx: int) -> Dict[str, jnp.ndarray]:
    """Cone-vector of row scales R_G matching socp.cone_h's key layout."""
    rpq = eq.ry[:, :nx]
    out = {
        "lin": eq.rlin,
        "pq": jnp.concatenate([rpq, rpq], axis=-1),
        "sig": eq.rsig,
    }
    for i, rs in enumerate(eq.rsocs[:-1]):
        out[f"soc{i}"] = rs[:, None]
    out["tr"] = eq.rsocs[-1][:, None]
    return out


def scale_primal(eq: EqScales, x: Primal, to_scaled: bool) -> Primal:
    """x_scaled = D^-1 x  (to_scaled) or x = D x_scaled (inverse)."""
    nx = x.p.shape[-1]
    dp = _inv(eq.ry[:, :nx])
    if to_scaled:
        return Primal(w=x.w / eq.dw, p=x.p / dp, q=x.q / dp, sig=x.sig / eq.dsig)
    return Primal(w=x.w * eq.dw, p=x.p * dp, q=x.q * dp, sig=x.sig * eq.dsig)


def scale_state(eq: EqScales, st, nx: int, to_scaled: bool):
    """Map an IPMState between raw and equilibrated coordinates.

    y_scaled = tau * y / R_A,  z_scaled = tau * z / R_G,  s_scaled = R_G * s
    (derivation in the module docstring; duals pick up the objective scale).
    The residual metrics (gap/pres/dres) are NOT coordinates — they are left
    untouched (callers treat them as diagnostics / validity sentinels only).
    """
    rg = _row_scales(eq, nx)
    if to_scaled:
        return st._replace(
            x=scale_primal(eq, st.x, True),
            y=eq.tau * st.y / eq.ry,
            z={k: eq.tau * st.z[k] / rg[k] for k in st.z},
            s={k: rg[k] * st.s[k] for k in st.s},
        )
    return st._replace(
        x=scale_primal(eq, st.x, False),
        y=eq.ry * st.y / eq.tau,
        z={k: rg[k] * st.z[k] / eq.tau for k in st.z},
        s={k: st.s[k] / rg[k] for k in st.s},
    )
