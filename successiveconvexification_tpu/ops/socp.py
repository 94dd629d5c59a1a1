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
    # stage cones
    G_lin: jnp.ndarray    # (K, nl, nw)
    h_lin: jnp.ndarray    # (K, nl)
    G_socs: Tuple[jnp.ndarray, ...]  # each (K, d_i, nw); LAST entry = trust region
    h_socs: Tuple[jnp.ndarray, ...]  # each (K, d_i)
    G_sig: jnp.ndarray    # (4,)  rows on dsigma
    h_sig: jnp.ndarray    # (4,)
    # dynamics equalities
    E: jnp.ndarray        # (K-1, nx, nw)
    F: jnp.ndarray        # (K-1, nx, nw)
    g_sig: jnp.ndarray    # (K-1, nx)
    b: jnp.ndarray        # (K-1, nx)
    # pin masks (1.0 = free, 0.0 = pinned)
    free_w: jnp.ndarray   # (K, nw)
    free_sig: jnp.ndarray # ()


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
) -> StageSOCP:
    K, nx = X.shape[0], model.nx
    nu = model.nu
    nw = nx + nu + 1
    dtype = X.dtype
    it_col = nx + nu  # feasibility-buffer column

    # ---- stage cones from the model, expanded to nw columns -------------
    G_lin_m, h_lin_m, socs_m = jax.vmap(
        lambda xk, uk: model.stage_cones(params, xk, uk)
    )(X, U)

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

    # trust-region SOC: s = (Delta, dx, du); no feasibility buffer (hard cone).
    # In soft (LM-damped) mode the cone is a fixed outer safeguard at tr_max and
    # the adaptive limiting happens through the quadratic damping below.
    ntr = 1 + nx + nu
    if cfg.tr_mode == "soft":
        cone_radius = jnp.asarray(cfg.tr_max, dtype) + 0.0 * tr_radius
    else:
        cone_radius = tr_radius
    G_tr = jnp.zeros((K, ntr, nw), dtype)
    G_tr = G_tr.at[:, 1:, : nx + nu].set(-jnp.eye(nx + nu, dtype=dtype))
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

    # ---- dynamics equalities --------------------------------------------
    eye = jnp.broadcast_to(jnp.eye(nx, dtype=dtype), (K - 1, nx, nx))
    zero_t = jnp.zeros((K - 1, nx, 1), dtype)
    E = jnp.concatenate([-disc.A, -disc.Bm, zero_t], axis=-1)
    F = jnp.concatenate([eye, -disc.Bp, zero_t], axis=-1)
    g_sig = -disc.S
    recon = (
        jnp.einsum("kij,kj->ki", disc.A, X[:-1])
        + jnp.einsum("kij,kj->ki", disc.Bm, U[:-1])
        + jnp.einsum("kij,kj->ki", disc.Bp, U[1:])
        + disc.S * sigma
        + disc.z
    )
    b = recon - X[1:]

    # ---- cost ------------------------------------------------------------
    c_w = jnp.zeros((K, nw), dtype).at[:, it_col].set(jnp.asarray(cfg.w_feas, dtype))
    if model.mass_index is not None and cfg.w_mass:
        c_w = c_w.at[K - 1, model.mass_index].add(-jnp.asarray(cfg.w_mass, dtype))
    c_p = jnp.full((K - 1, nx), cfg.w_nu, dtype)
    c_q = jnp.full((K - 1, nx), cfg.w_nu, dtype)
    c_sig = jnp.asarray(cfg.w_sigma if free_final_time else 0.0, dtype)

    # soft trust-region quadratic damping (zero in hard mode): LM-style, the
    # damping is the INVERSE of the adaptive tr_radius state — rejections shrink
    # tr_radius which raises the damping, strong accepts lower it
    Q_w = jnp.zeros((K, nw), dtype)
    Q_sig = jnp.zeros((), dtype)
    if cfg.tr_mode == "soft":
        lam = 1.0 / tr_radius
        Q_w = Q_w.at[:, : nx + nu].set(jnp.asarray(cfg.soft_tr_weight, dtype) * lam)
        Q_sig = jnp.asarray(cfg.soft_tr_sigma_weight, dtype) * lam

    # ---- pins ------------------------------------------------------------
    free_w = jnp.ones((K, nw), dtype)
    init_pin = jnp.asarray(model.init_pinned, dtype)       # 1 where pinned
    term_pin = jnp.asarray(model.term_pinned, dtype)
    term_u_pin = jnp.asarray(model.term_u_pinned, dtype)
    free_w = free_w.at[0, :nx].set(1.0 - init_pin)
    free_w = free_w.at[K - 1, :nx].set(1.0 - term_pin)
    free_w = free_w.at[K - 1, nx : nx + nu].set(1.0 - term_u_pin)
    free_sig = jnp.asarray(1.0 if free_final_time else 0.0, dtype)

    # zero all columns of pinned coordinates
    G_lin = G_lin * free_w[:, None, :]
    G_socs = tuple(G * free_w[:, None, :] for G in G_socs)
    E = E * free_w[:-1][:, None, :]
    F = F * free_w[1:][:, None, :]
    G_sig = G_sig * free_sig
    g_sig = g_sig * free_sig
    c_w = c_w * free_w
    c_sig = c_sig * free_sig

    return StageSOCP(
        c_w=c_w, c_p=c_p, c_q=c_q, c_sig=c_sig, Q_w=Q_w, Q_sig=Q_sig,
        G_lin=G_lin, h_lin=h_lin, G_socs=tuple(G_socs), h_socs=tuple(h_socs),
        G_sig=G_sig, h_sig=h_sig,
        E=E, F=F, g_sig=g_sig, b=b,
        free_w=free_w, free_sig=free_sig,
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
    """(K-1, nx) equality LHS."""
    return (
        jnp.einsum("kiw,kw->ki", d.E, x.w[:-1])
        + jnp.einsum("kiw,kw->ki", d.F, x.w[1:])
        + d.g_sig * x.sig
        - x.p
        + x.q
    )


def apply_AT(d: StageSOCP, y: jnp.ndarray) -> Primal:
    K = d.c_w.shape[0]
    w = jnp.zeros_like(d.c_w)
    w = w.at[:-1].add(jnp.einsum("kiw,ki->kw", d.E, y))
    w = w.at[1:].add(jnp.einsum("kiw,ki->kw", d.F, y))
    return Primal(w=w, p=-y, q=y, sig=jnp.sum(d.g_sig * y))


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
