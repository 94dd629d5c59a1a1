"""Convex-subproblem assembly: model + discretization -> structured stage SOCP.

This is the reference's L4 (JuMP model building, SURVEY.md §1/§2.2) re-designed for
TPU: instead of a sparse row/col triplet soup for a general solver, the subproblem is
kept in its natural *stage-block* form the whole way down, so the IPM's KKT system is
block-tridiagonal-with-arrow by construction and every operator application is a
batched small einsum (MXU food under vmap over scenarios).

Decision variables, all DELTAS about the reference trajectory (xbar, ubar, sigmabar):
  per node k = 0..K-1:  w_k = (dx_k [nx], du_k [nu], t_k [1])
      t_k >= 0 is a per-stage feasibility buffer added to the s0-row of every state
      cone (heavily penalized; keeps every subproblem strictly feasible and bounded
      so the fixed-iteration batched IPM never meets an infeasible lane);
  per interval k = 0..K-2:  p_k, q_k in R^nx_+, the split virtual control
      nu_k = p_k - q_k (L1-penalized — reference C6's virtual control slack);
  global: dsigma (time-dilation delta; pinned when final time is fixed).

Equalities (dynamics, reference C5 output):
  dx_{k+1} - A_k dx_k - Bm_k du_k - Bp_k du_{k+1} - S_k dsigma - p_k + q_k = b_k,
  b_k = A_k xbar_k + Bm_k ubar_k + Bp_k ubar_{k+1} + S_k sigmabar + z_k - xbar_{k+1}.

Cones: the model's per-node linear rows and SOCs (SURVEY §2.2 inventory), a per-node
trust-region SOC ||(dx, du)|| <= Delta, p/q/t >= 0 orthants, and time trust-region
rows on dsigma.

Boundary conditions are *pin masks*: pinned coordinates get all their constraint
columns zeroed and a unit diagonal in the KKT, so the stage block sizes stay uniform
(K identical blocks — the TPU-friendly alternative to the reference's per-node JuMP
variable fixing).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from successiveconvexification_tpu.config import ScvxConfig
from successiveconvexification_tpu.models.base import Model
from successiveconvexification_tpu.ops.discretize import Discretization
from successiveconvexification_tpu.ops.precision import full_precision


class StageSOCP(NamedTuple):
    """All traced data of one scenario's convex subproblem (leading axes = K or K-1)."""

    # objective (linear + diagonal quadratic; the quadratic part carries the
    # SOFT trust-region damping - Szmuk-style - and is zero in hard-TR mode)
    c_w: jnp.ndarray      # (K, nw)
    c_p: jnp.ndarray      # (K-1, nx)
    c_q: jnp.ndarray      # (K-1, nx)
    c_sig: jnp.ndarray    # ()
    Q_w: jnp.ndarray      # (K, nw) diagonal quadratic weights on w
    Q_sig: jnp.ndarray    # ()
    Q_r1: jnp.ndarray     # (K, n_dirs, nw) rank-one quadratic rows v (H += v'v)
    # stage cones
    G_lin: jnp.ndarray    # (K, nl, nw)
    h_lin: jnp.ndarray    # (K, nl)
    G_socs: Tuple[jnp.ndarray, ...]  # each (K, d_i, nw); LAST entry = trust region
    h_socs: Tuple[jnp.ndarray, ...]  # each (K, d_i)
    G_sig: jnp.ndarray    # (4,)  rows on dsigma
    h_sig: jnp.ndarray    # (4,)
    # dynamics equalities in reduced (tangent) rows
    E: jnp.ndarray        # (K-1, nrx, nw)
    F: jnp.ndarray        # (K-1, nrx, nw)
    g_sig: jnp.ndarray    # (K-1, nrx)
    b: jnp.ndarray        # (K-1, nrx)
    eq_row_free: jnp.ndarray  # (K-1, nrx) 0 marks structurally-zero rows
    # pin masks (1.0 = free, 0.0 = pinned)
    free_w: jnp.ndarray   # (K, nw)
    free_sig: jnp.ndarray # ()
    # per-node tangent basis mapping reduced state deltas to full space
    Bx: jnp.ndarray       # (K, nx, nrx)


def cone_spec(model: Model) -> Dict[str, str]:
    """Static cone-group spec for this model's subproblems."""
    spec = {"lin": "lin", "pq": "lin", "sig": "lin"}
    for i in range(len(model.soc_dims)):
        spec[f"soc{i}"] = "soc"
    spec["tr"] = "soc"
    return spec


def dims(model: Model, K: int):
    nx, nu = model.nx, model.nu
    nw = nx + nu + 1
    return dict(nx=nx, nu=nu, nw=nw, K=K, nl=model.n_lin + 1, ntr=1 + nx + nu)


# ----------------------------------------------------------------- assembly
@full_precision
def assemble(
    model: Model,
    cfg: ScvxConfig,
    params,
    disc: Discretization,
    X: jnp.ndarray,
    U: jnp.ndarray,
    sigma: jnp.ndarray,
    tr_radius: jnp.ndarray,
    free_final_time: bool = True,
    penalty_scale=1.0,
) -> StageSOCP:
    K, nx = X.shape[0], model.nx
    nu = model.nu
    dtype = X.dtype

    # ---- manifold-SCP state reduction (base.Model.state_basis) ----------
    # All state-delta columns are expressed in the per-node tangent basis
    # dx_k = B_k dx~_k; B_k orthonormal (nx, nrx). Identity when no manifold.
    if model.state_basis is not None:
        nrx = model.nr
        Bx = jax.vmap(lambda xk: model.state_basis(params, xk))(X)
    else:
        nrx = nx
        Bx = jnp.broadcast_to(jnp.eye(nx, dtype=dtype), (K, nx, nx))

    nw = nrx + nu + 1
    it_col = nrx + nu  # feasibility-buffer column

    def reduce_cols(G):
        """(K, rows, nx+nu) -> (K, rows, nrx+nu): x-cols through B_k."""
        Gx = jnp.einsum("kiw,kwr->kir", G[..., :nx], Bx)
        return jnp.concatenate([Gx, G[..., nx:]], axis=-1)

    # ---- stage cones from the model, expanded to nw columns -------------
    G_lin_m, h_lin_m, socs_m = jax.vmap(
        lambda xk, uk: model.stage_cones(params, xk, uk)
    )(X, U)
    G_lin_m = reduce_cols(G_lin_m)
    socs_m = tuple((reduce_cols(G_s), h_s) for (G_s, h_s) in socs_m)

    # append feasibility-buffer column (-1 on every linear row) and t>=0 row
    G_lin = jnp.concatenate(
        [G_lin_m, -jnp.ones(G_lin_m.shape[:-1] + (1,), dtype)], axis=-1
    )
    t_row_G = jnp.zeros((K, 1, nw), dtype).at[:, 0, it_col].set(-1.0)
    t_row_h = jnp.zeros((K, 1), dtype)
    G_lin = jnp.concatenate([G_lin, t_row_G], axis=1)
    h_lin = jnp.concatenate([h_lin_m, t_row_h], axis=1)

    G_socs = []
    h_socs = []
    for (G_s, h_s) in socs_m:
        d = G_s.shape[1]
        tcol = jnp.zeros((K, d, 1), dtype).at[:, 0, 0].set(-1.0)
        G_socs.append(jnp.concatenate([G_s, tcol], axis=-1))
        h_socs.append(h_s)

    # trust-region SOC: s = (Delta, dx~, du); no feasibility buffer (hard cone).
    # In soft (LM-damped) mode the cone is a fixed outer safeguard and the
    # adaptive limiting happens through the quadratic damping below.
    ntr = 1 + nrx + nu
    if cfg.tr_mode == "soft":
        cone_radius = jnp.asarray(cfg.soft_tr_cap, dtype) + 0.0 * tr_radius
    else:
        cone_radius = tr_radius
    G_tr = jnp.zeros((K, ntr, nw), dtype)
    G_tr = G_tr.at[:, 1:, : nrx + nu].set(-jnp.eye(nrx + nu, dtype=dtype))
    h_tr = jnp.zeros((K, ntr), dtype).at[:, 0].set(cone_radius)
    G_socs.append(G_tr)
    h_socs.append(h_tr)

    # ---- sigma rows ------------------------------------------------------
    # Hard mode: the time trust region is COUPLED to the state trust radius (when
    # rejections shrink tr_radius, |dsigma| shrinks too — otherwise sigma keeps
    # taking large, nonlinearly-unjustified steps while the state is frozen).
    # Soft mode: fixed relative bound; the LM damping does the sizing.
    if cfg.tr_mode == "soft":
        tr_sig = jnp.asarray(cfg.tr_sigma_frac, dtype) * sigma
    else:
        tr_sig = (
            jnp.asarray(cfg.tr_sigma_frac, dtype) * sigma
            * jnp.minimum(tr_radius, 1.0)
        )
    sig_lo = sigma - jnp.asarray(cfg.sigma_min_frac, dtype) * sigma  # sigma >= frac*sig0? see note
    # Note: bounds are relative to the CURRENT sigmabar; combined with the per-
    # iteration trust region this keeps sigma positive and bounded.
    sig_hi = jnp.asarray(cfg.sigma_max_frac, dtype) * sigma - sigma
    G_sig = jnp.asarray([1.0, -1.0, -1.0, 1.0], dtype)
    h_sig = jnp.stack([tr_sig, tr_sig, sig_lo, sig_hi])

    # ---- dynamics equalities (reduced rows AND columns) ------------------
    # Row-project the dynamics onto the tangent space at node k+1 (B'_{k+1}),
    # column-reduce state deltas at nodes k and k+1: the radial quaternion
    # defect component (second-order, closed by retraction) drops out entirely.
    BT = jnp.swapaxes(Bx, 1, 2)                       # (K, nrx, nx)
    A_r = jnp.einsum("kri,kij,kjs->krs", BT[1:], disc.A, Bx[:-1])
    Bm_r = jnp.einsum("kri,kij->krj", BT[1:], disc.Bm)
    Bp_r = jnp.einsum("kri,kij->krj", BT[1:], disc.Bp)
    eye = jnp.broadcast_to(jnp.eye(nrx, dtype=dtype), (K - 1, nrx, nrx))
    zero_t = jnp.zeros((K - 1, nrx, 1), dtype)
    E = jnp.concatenate([-A_r, -Bm_r, zero_t], axis=-1)
    F = jnp.concatenate([eye, -Bp_r, zero_t], axis=-1)
    g_sig = -jnp.einsum("kri,ki->kr", BT[1:], disc.S)
    # Anchor the affine model at the NONLINEAR propagation: at delta = 0 the
    # model's defect then equals J_nl's (reduced) defect BITWISE. Anchoring at
    # the affine reconstruction instead differs by integrator consistency
    # (~1e-6), which flips L1 subgradient signs on near-zero defect components
    # and corrupts the SCvx acceptance ratio at first order.
    b = jnp.einsum("kri,ki->kr", BT[1:], disc.defect)

    # ---- cost ------------------------------------------------------------
    pscale = jnp.asarray(penalty_scale, dtype)
    c_w = jnp.zeros((K, nw), dtype).at[:, it_col].set(
        jnp.asarray(cfg.w_feas, dtype) * pscale
    )
    if model.mass_index is not None and cfg.w_mass:
        c_w = c_w.at[K - 1, model.mass_index].add(-jnp.asarray(cfg.w_mass, dtype))
    c_p = jnp.full((K - 1, nrx), cfg.w_nu, dtype) * pscale
    c_q = jnp.full((K - 1, nrx), cfg.w_nu, dtype) * pscale
    c_sig = jnp.asarray(cfg.w_sigma if free_final_time else 0.0, dtype)

    # soft trust-region quadratic damping (zero in hard mode): LM-style, the
    # damping is the INVERSE of the adaptive tr_radius state — rejections shrink
    # tr_radius which raises the damping, strong accepts lower it
    Q_w = jnp.zeros((K, nw), dtype)
    Q_sig = jnp.zeros((), dtype)
    if cfg.tr_mode == "soft":
        # damping scales with the penalty-continuation scale so the subproblem
        # geometry (step sizes) is invariant under pscale; only the
        # objective-vs-feasibility tradeoff shifts
        lam = pscale / tr_radius
        Q_w = Q_w.at[:, : nrx + nu].set(jnp.asarray(cfg.soft_tr_weight, dtype) * lam)
        Q_sig = jnp.asarray(cfg.soft_tr_sigma_weight, dtype) * lam

    # manifold-direction rank-one penalties (scaled so H gets W_dir * v v')
    if model.penalized_dirs is not None:
        dirs = jax.vmap(lambda xk, uk: model.penalized_dirs(params, xk, uk))(X, U)
        dirs = reduce_cols(dirs)
        dirs = jnp.concatenate(
            [dirs, jnp.zeros(dirs.shape[:-1] + (1,), dtype)], axis=-1
        )  # t column
        Q_r1 = jnp.sqrt(jnp.asarray(cfg.w_dir_penalty, dtype)) * dirs
    else:
        Q_r1 = jnp.zeros((K, 0, nw), dtype)

    # ---- pins (reduced coordinates) --------------------------------------
    free_w = jnp.ones((K, nw), dtype)
    if model.state_basis is not None:
        init_pin = jnp.asarray(model.init_pinned_r, dtype)
        term_pin = jnp.asarray(model.term_pinned_r, dtype)
    else:
        init_pin = jnp.asarray(model.init_pinned, dtype)
        term_pin = jnp.asarray(model.term_pinned, dtype)
    term_u_pin = jnp.asarray(model.term_u_pinned, dtype)
    free_w = free_w.at[0, :nrx].set(1.0 - init_pin)
    free_w = free_w.at[K - 1, :nrx].set(1.0 - term_pin)
    free_w = free_w.at[K - 1, nrx : nrx + nu].set(1.0 - term_u_pin)
    free_sig = jnp.asarray(1.0 if free_final_time else 0.0, dtype)

    # zero all columns of pinned coordinates
    G_lin = G_lin * free_w[:, None, :]
    G_socs = tuple(G * free_w[:, None, :] for G in G_socs)
    Q_r1 = Q_r1 * free_w[:, None, :]
    E = E * free_w[:-1][:, None, :]
    F = F * free_w[1:][:, None, :]
    G_sig = G_sig * free_sig
    g_sig = g_sig * free_sig
    c_w = c_w * free_w
    c_sig = c_sig * free_sig

    eq_row_free = jnp.ones((K - 1, nrx), dtype)

    return StageSOCP(
        c_w=c_w, c_p=c_p, c_q=c_q, c_sig=c_sig, Q_w=Q_w, Q_sig=Q_sig, Q_r1=Q_r1,
        G_lin=G_lin, h_lin=h_lin, G_socs=tuple(G_socs), h_socs=tuple(h_socs),
        G_sig=G_sig, h_sig=h_sig,
        E=E, F=F, g_sig=g_sig, b=b, eq_row_free=eq_row_free,
        free_w=free_w, free_sig=free_sig, Bx=Bx,
    )


# ----------------------------------------------------------- operator applies
class Primal(NamedTuple):
    w: jnp.ndarray     # (K, nw)
    p: jnp.ndarray     # (K-1, nx)
    q: jnp.ndarray     # (K-1, nx)
    sig: jnp.ndarray   # ()


def primal_zeros(d: StageSOCP) -> Primal:
    return Primal(
        w=jnp.zeros_like(d.c_w),
        p=jnp.zeros_like(d.c_p),
        q=jnp.zeros_like(d.c_q),
        sig=jnp.zeros_like(d.c_sig),
    )


def apply_G(d: StageSOCP, x: Primal) -> Dict[str, jnp.ndarray]:
    out = {
        "lin": jnp.einsum("kiw,kw->ki", d.G_lin, x.w),
        "pq": jnp.concatenate([-x.p, -x.q], axis=-1),
        "sig": d.G_sig * x.sig,
    }
    for i, G in enumerate(d.G_socs[:-1]):
        out[f"soc{i}"] = jnp.einsum("kiw,kw->ki", G, x.w)
    out["tr"] = jnp.einsum("kiw,kw->ki", d.G_socs[-1], x.w)
    return out


def apply_GT(d: StageSOCP, lam: Dict[str, jnp.ndarray]) -> Primal:
    nx = d.c_p.shape[-1]
    w = jnp.einsum("kiw,ki->kw", d.G_lin, lam["lin"])
    for i, G in enumerate(d.G_socs[:-1]):
        w = w + jnp.einsum("kiw,ki->kw", G, lam[f"soc{i}"])
    w = w + jnp.einsum("kiw,ki->kw", d.G_socs[-1], lam["tr"])
    return Primal(
        w=w,
        p=-lam["pq"][:, :nx],
        q=-lam["pq"][:, nx:],
        sig=jnp.sum(d.G_sig * lam["sig"]),
    )


def cone_h(d: StageSOCP) -> Dict[str, jnp.ndarray]:
    out = {
        "lin": d.h_lin,
        "pq": jnp.zeros_like(jnp.concatenate([d.c_p, d.c_q], axis=-1)),
        "sig": d.h_sig,
    }
    for i, h in enumerate(d.h_socs[:-1]):
        out[f"soc{i}"] = h
    out["tr"] = d.h_socs[-1]
    return out


def apply_A(d: StageSOCP, x: Primal) -> jnp.ndarray:
    """(K-1, nx+n_tc) equality LHS (virtual control only on the nx dynamics rows)."""
    nx = d.c_p.shape[-1]
    out = (
        jnp.einsum("kiw,kw->ki", d.E, x.w[:-1])
        + jnp.einsum("kiw,kw->ki", d.F, x.w[1:])
        + d.g_sig * x.sig
    )
    return out.at[:, :nx].add(-x.p + x.q)


def apply_AT(d: StageSOCP, y: jnp.ndarray) -> Primal:
    nx = d.c_p.shape[-1]
    w = jnp.zeros_like(d.c_w)
    w = w.at[:-1].add(jnp.einsum("kiw,ki->kw", d.E, y))
    w = w.at[1:].add(jnp.einsum("kiw,ki->kw", d.F, y))
    return Primal(w=w, p=-y[:, :nx], q=y[:, :nx], sig=jnp.sum(d.g_sig * y))


def linear_merit_terms(d: StageSOCP, x: Primal):
    """Evaluate the LINEAR model's defect and cone violation at a candidate.

    Returns (nu_l1, viol_sum): the L1 norm of the linearized-dynamics residual
    and the sum over stages of the max linearized-cone violation — computed from
    the candidate deltas directly, NOT from the IPM's slack variables. The IPM's
    (p, q, t) match these only to solver tolerance; with large penalty weights
    that slack noise would corrupt the SCvx acceptance ratio (rho) at first
    order, so the outer loop must use these evaluated quantities.
    """
    nx = d.c_p.shape[-1]
    x0 = Primal(w=x.w, p=jnp.zeros_like(x.p), q=jnp.zeros_like(x.q), sig=x.sig)
    nu_eval = (apply_A(d, x0) - d.b)[:, :nx]  # dynamics rows only
    nu_l1 = jnp.sum(jnp.abs(nu_eval))

    # zero the per-stage buffer column so cones are evaluated without relaxation
    nw = d.c_w.shape[-1]
    wt0 = x.w.at[:, nw - 1].set(0.0)
    s_lin = d.h_lin - jnp.einsum("kiw,kw->ki", d.G_lin, wt0)
    viol = jnp.max(jnp.maximum(-s_lin[:, :-1], 0.0), axis=1)  # last row is t>=0
    for G, h in zip(d.G_socs[:-1], d.h_socs[:-1]):             # exclude TR cone
        s = h - jnp.einsum("kiw,kw->ki", G, wt0)
        v = jnp.maximum(
            jnp.sqrt(jnp.sum(s[:, 1:] ** 2, axis=1) + 1e-16) - s[:, 0], 0.0
        )
        viol = jnp.maximum(viol, v)
    return nu_l1, jnp.sum(viol)


def objective(d: StageSOCP) -> Primal:
    return Primal(w=d.c_w, p=d.c_p, q=d.c_q, sig=d.c_sig)


def primal_inner(a: Primal, b: Primal) -> jnp.ndarray:
    return (
        jnp.sum(a.w * b.w) + jnp.sum(a.p * b.p) + jnp.sum(a.q * b.q) + a.sig * b.sig
    )


def primal_axpy(a: Primal, b: Primal, alpha) -> Primal:
    return Primal(
        w=a.w + alpha * b.w,
        p=a.p + alpha * b.p,
        q=a.q + alpha * b.q,
        sig=a.sig + alpha * b.sig,
    )
