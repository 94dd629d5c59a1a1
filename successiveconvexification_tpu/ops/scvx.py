"""SCvx outer loop: successive convexification with a hard trust region.

Reference L6 / C10-C11 (SURVEY.md §3.1): linearize -> assemble -> conic solve ->
nonlinear propagation -> acceptance ratio -> trust-region update, iterated to
convergence. TPU-first design: ``scvx_iteration`` is ONE pure function over a
fixed-shape carry (SURVEY §7 design stance) — all accept/reject control flow is
``jnp.where`` masking, so the same function drives a single solve (wrapped in
``lax.while_loop``) and vmapped Monte-Carlo batches with per-lane divergence
(SURVEY §2.3 P8), with no recompilation between the two.

Acceptance test (C11): the candidate is accepted when the ratio

    rho = (J_nl(current) - J_nl(candidate)) / (J_nl(current) - J_lin(candidate))

of actual-to-predicted nonlinear cost decrease exceeds ``rho0``; the trust radius
shrinks/holds/grows by (rho1, rho2) exactly as the reference's shrink/grow logic.
J_nl penalizes the true multiple-shooting defects (L1, weight w_nu) plus the
linearized-nonconvex thrust-lower-bound violation; J_lin is the subproblem's own
objective evaluated at its optimum.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from successiveconvexification_tpu.config import SolverConfig
from successiveconvexification_tpu.models.base import Model, safe_norm
from successiveconvexification_tpu.ops import ipm, socp
from successiveconvexification_tpu.ops.discretize import discretize, propagate


class ScvxState(NamedTuple):
    """Fixed-shape SCvx carry (one scenario; vmap adds the batch axis)."""

    X: jnp.ndarray          # (K, nx) reference trajectory
    U: jnp.ndarray          # (K, nu)
    sigma: jnp.ndarray      # () time dilation (= time of flight, tau in [0,1])
    tr_radius: jnp.ndarray  # () trust-region radius
    J_nl: jnp.ndarray       # () nonlinear penalty cost of (X, U, sigma)
    converged: jnp.ndarray  # () bool
    iterations: jnp.ndarray # () int32 — accepted+rejected iterations executed
    accepted: jnp.ndarray   # () bool — last step accepted
    rho: jnp.ndarray        # () last acceptance ratio
    nu_norm: jnp.ndarray    # () last candidate's virtual-control L1 norm
    dx_max: jnp.ndarray     # () last candidate's max |delta|
    ipm_gap: jnp.ndarray    # () last subproblem's final relative gap
    ipm_iters: jnp.ndarray  # () int32


def cone_violation(model: Model, params, X, U):
    """Per-node max violation of the model's state/control cones at (X, U).

    Evaluated at delta = 0 the stage data gives: linear rows violated by
    max(0, -h); SOC rows by max(0, ||h1|| - h0). This is the exact nonlinear
    counterpart of the per-stage feasibility buffer t in the subproblem (the
    thrust lower bound evaluates its LINEARIZATION at ubar, where it equals the
    true constraint ||u|| >= T_min).
    """

    def one(xk, uk):
        _, h_lin, socs = model.stage_cones(params, xk, uk)
        # ONE shared buffer t_k per stage covers every cone -> needed t is the
        # MAX violation across the stage's cones, matching the subproblem cost
        v = jnp.max(jnp.maximum(-h_lin, 0.0))
        for (_, h_s) in socs:
            v = jnp.maximum(
                v,
                jnp.maximum(jnp.sqrt(jnp.sum(h_s[1:] ** 2) + 1e-16) - h_s[0], 0.0),
            )
        return v

    return jnp.sum(jax.vmap(one)(X, U))


def nonlinear_cost(model: Model, cfg: SolverConfig, params, X, U, sigma):
    """J_nl: true objective + penalties on dynamics defects and cone violations.

    MUST be the faithful nonlinear counterpart of the subproblem objective
    (sigma/mass terms + w_nu * L1 defects + w_feas * cone buffers): the
    acceptance ratio compares the two, and any term present in one but not the
    other corrupts rho.
    """
    s = cfg.scvx
    x_prop = propagate(model, params, X, U, sigma,
                       substeps=cfg.disc.substeps, foh=cfg.disc.foh)
    defect = jnp.sum(jnp.abs(x_prop - X[1:]))
    J = s.w_sigma * sigma + s.w_nu * defect
    if model.mass_index is not None and s.w_mass:
        J = J - s.w_mass * X[-1, model.mass_index]
    J = J + s.w_feas * cone_violation(model, params, X, U)
    return J


def scvx_init(model: Model, params, cfg: SolverConfig) -> ScvxState:
    """Straight-line initial trajectory (SURVEY §3.1 initialize_trajectory)."""
    X, U, sigma = model.initial_guess(params, cfg.disc.K)
    dtype = X.dtype
    J0 = nonlinear_cost(model, cfg, params, X, U, sigma)
    z = jnp.zeros((), dtype)
    return ScvxState(
        X=X, U=U, sigma=jnp.asarray(sigma, dtype),
        tr_radius=jnp.asarray(cfg.scvx.tr_init, dtype),
        J_nl=J0,
        converged=jnp.asarray(False),
        iterations=jnp.asarray(0, jnp.int32),
        accepted=jnp.asarray(False),
        rho=z, nu_norm=z + jnp.inf, dx_max=z + jnp.inf,
        ipm_gap=z, ipm_iters=jnp.asarray(0, jnp.int32),
    )


@functools.partial(jax.jit, static_argnums=(0, 2))
def scvx_iteration(model: Model, params, cfg: SolverConfig, st: ScvxState
                   ) -> ScvxState:
    """One full SCvx iteration (discretize + assemble + IPM + accept/reject)."""
    s = cfg.scvx
    dtype = st.X.dtype
    active = ~st.converged

    # 1) linearize + discretize about the current reference (L3)
    disc = discretize(model, params, st.X, st.U, st.sigma,
                      substeps=cfg.disc.substeps, foh=cfg.disc.foh)

    # 2) assemble the stage SOCP (L4)
    d = socp.assemble(
        model, s, params, disc, st.X, st.U, st.sigma, st.tr_radius,
        free_final_time=cfg.free_final_time,
    )

    # 3) solve it in-graph (L5)
    sol = ipm.ipm_solve(d, cfg.ipm)

    nx, nu = model.nx, model.nu
    dX = sol.x.w[:, :nx]
    dU = sol.x.w[:, nx : nx + nu]
    X_new = st.X + dX
    U_new = st.U + dU
    sigma_new = st.sigma + sol.x.sig
    nu_l1 = jnp.sum(sol.x.p) + jnp.sum(sol.x.q)
    t_sum = jnp.sum(sol.x.w[:, nx + nu])
    # step-size measure: state/control deltas plus the RELATIVE sigma delta
    dx_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.concatenate([dX, dU], axis=1))),
        jnp.abs(sol.x.sig) / st.sigma,
    )

    # 4) nonlinear propagation + acceptance ratio (C11)
    J_new = nonlinear_cost(model, cfg, params, X_new, U_new, sigma_new)
    J_lin = s.w_sigma * sigma_new + s.w_nu * nu_l1 + s.w_feas * t_sum
    if model.mass_index is not None and s.w_mass:
        J_lin = J_lin - s.w_mass * X_new[-1, model.mass_index]

    predicted = st.J_nl - J_lin
    actual = st.J_nl - J_new
    # predicted >= -O(discretization error) by construction (the subproblem's
    # linear objective at its optimum cannot exceed its value at delta = 0,
    # which equals J_nl up to integrator error); floor it so a tiny negative
    # denominator cannot flip the sign of rho
    denom = jnp.maximum(predicted, 1e-10)
    rho = actual / denom

    ipm_ok = jnp.all(jnp.isfinite(dX)) & jnp.isfinite(J_new)
    accept = (rho >= s.rho0) & ipm_ok

    # 5) trust-region update (shrink / hold / grow). In soft mode tr_radius is the
    # INVERSE LM damping — the same shrink/grow schedule adapts the damping.
    tr_shrunk = st.tr_radius * s.tr_shrink
    tr_grown = st.tr_radius * s.tr_grow
    tr_next = jnp.where(
        ~accept | (rho < s.rho1), tr_shrunk,
        jnp.where(rho < s.rho2, st.tr_radius, tr_grown),
    )
    tr_next = jnp.clip(tr_next, s.tr_min, s.tr_max)

    # 6) masked state update (P8: per-lane divergence under vmap)
    upd = active & accept

    def pick(new, old):
        return jnp.where(upd, new, old)

    # convergence: the subproblem's optimal step is tiny and virtual control has
    # vanished — whether or not the (already negligible) step was accepted
    conv_now = ipm_ok & (dx_max < s.conv_tol_tr) & (nu_l1 + t_sum < s.conv_tol_nu)

    return ScvxState(
        X=pick(X_new, st.X),
        U=pick(U_new, st.U),
        sigma=pick(sigma_new, st.sigma),
        tr_radius=jnp.where(active, tr_next, st.tr_radius),
        J_nl=pick(J_new, st.J_nl),
        converged=st.converged | (active & conv_now),
        iterations=st.iterations + active.astype(jnp.int32),
        accepted=jnp.where(active, accept, st.accepted),
        rho=jnp.where(active, rho, st.rho),
        nu_norm=jnp.where(active, nu_l1, st.nu_norm),
        dx_max=jnp.where(active, dx_max, st.dx_max),
        ipm_gap=jnp.where(active, sol.gap, st.ipm_gap),
        ipm_iters=jnp.where(active, sol.iters, st.ipm_iters),
    )


@functools.partial(jax.jit, static_argnums=(0, 2))
def scvx_solve(model: Model, params, cfg: SolverConfig) -> ScvxState:
    """Full single-scenario solve: init + masked fixed-point loop (L6 entry)."""
    st0 = scvx_init(model, params, cfg)

    def cond(st: ScvxState):
        return (~st.converged) & (st.iterations < cfg.scvx.max_iters)

    def body(st: ScvxState):
        return scvx_iteration(model, params, cfg, st)

    return jax.lax.while_loop(cond, body, st0)
