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
from successiveconvexification_tpu.ops.precision import full_precision


class ScvxState(NamedTuple):
    """Fixed-shape SCvx carry (one scenario; vmap adds the batch axis)."""

    X: jnp.ndarray          # (K, nx) reference trajectory
    U: jnp.ndarray          # (K, nu)
    sigma: jnp.ndarray      # () time dilation (= time of flight, tau in [0,1])
    tr_radius: jnp.ndarray  # () trust-region radius / inverse LM damping
    penalty_scale: jnp.ndarray  # () continuation multiplier on w_nu / w_feas
    obj_nl: jnp.ndarray     # () true objective part (sigma / mass terms)
    defect_nl: jnp.ndarray  # () L1 multiple-shooting defect of (X, U, sigma)
    viol_nl: jnp.ndarray    # () total stage-cone violation
    converged: jnp.ndarray  # () bool
    iterations: jnp.ndarray # () int32 — accepted+rejected iterations executed
    # Where the iterations go (VERDICT r2 item 4: committed breakdown so the
    # convergence work targets the dominant bucket, not a guess):
    n_accept: jnp.ndarray   # () int32 — accepted steps
    n_reject: jnp.ndarray   # () int32 — rejected steps (shrink cascades)
    n_bump: jnp.ndarray     # () int32 — penalty-continuation rounds
    accepted: jnp.ndarray   # () bool — last step accepted
    rho: jnp.ndarray        # () last acceptance ratio
    nu_norm: jnp.ndarray    # () last candidate's virtual-control L1 norm
    dx_max: jnp.ndarray     # () last candidate's max |delta|
    pred_dec: jnp.ndarray   # () last subproblem's predicted merit decrease
    ipm_gap: jnp.ndarray    # () last subproblem's final relative gap
    ipm_iters: jnp.ndarray  # () int32
    ipm_carry: object       # ipm.IPMState — warm start for the next subproblem

    @property
    def J_nl(self):
        """Convenience: merit at unit penalty scale (diagnostics only)."""
        return self.obj_nl + self.defect_nl + self.viol_nl


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


def merit_components(model: Model, cfg: SolverConfig, params, X, U, sigma):
    """(obj, defect_l1, viol_sum): the pieces of the nonlinear penalty merit.

    The merit MUST be the faithful nonlinear counterpart of the subproblem
    objective (sigma/mass terms + w_nu * L1 defects + w_feas * cone buffers):
    the acceptance ratio compares the two, and any term present in one but not
    the other corrupts rho. Kept decomposed so the penalty-continuation scale
    can be applied consistently.
    """
    s = cfg.scvx
    x_prop = propagate(model, params, X, U, sigma,
                       substeps=cfg.disc.substeps, foh=cfg.disc.foh)
    raw = x_prop - X[1:]
    if model.state_basis is not None:
        # measure the defect in the tangent rows, exactly like the subproblem
        B1 = jax.vmap(lambda xk: model.state_basis(params, xk))(X[1:])
        raw = jnp.einsum("kxr,kx->kr", B1, raw)
    defect = jnp.sum(jnp.abs(raw))
    obj = s.w_sigma * sigma
    if model.mass_index is not None and s.w_mass:
        obj = obj - s.w_mass * X[-1, model.mass_index]
    viol = cone_violation(model, params, X, U)
    return obj, defect, viol


def nonlinear_cost(model: Model, cfg: SolverConfig, params, X, U, sigma,
                   penalty_scale=1.0):
    """Scalar penalized merit (see merit_components)."""
    s = cfg.scvx
    obj, defect, viol = merit_components(model, cfg, params, X, U, sigma)
    return obj + penalty_scale * (s.w_nu * defect + s.w_feas * viol)


def _unit_ipm_carry(model: Model, cfg: SolverConfig, params, X, U, sigma):
    """Interior unit starting point shaped like this problem's IPM state."""
    from successiveconvexification_tpu.ops import cones as C
    from successiveconvexification_tpu.ops import ipm

    dtype = X.dtype
    d0 = socp.assemble(
        model, cfg.scvx, params,
        discretize(model, params, X, U, sigma,
                   substeps=cfg.disc.substeps, foh=cfg.disc.foh),
        X, U, sigma, jnp.asarray(cfg.scvx.tr_init, dtype),
        free_final_time=cfg.free_final_time,
    )
    spec = ipm._spec_of(d0)
    e = C.identity(spec, socp.cone_h(d0))
    z = jnp.zeros((), dtype)
    # gap = inf is the "carry invalid" sentinel: the first iteration's solve
    # starts from the cold conelp init rather than this placeholder.
    return ipm.IPMState(
        x=socp.primal_zeros(d0), y=jnp.zeros_like(d0.b), s=e, z=e,
        converged=jnp.asarray(False), iters=jnp.asarray(0, jnp.int32),
        gap=z + jnp.inf, pres=z, dres=z, stalled=jnp.asarray(False),
        prim_infeas=jnp.asarray(False), dual_infeas=jnp.asarray(False),
    )


def scvx_init(model: Model, params, cfg: SolverConfig) -> ScvxState:
    """Straight-line initial trajectory (SURVEY §3.1 initialize_trajectory)."""
    X, U, sigma = model.initial_guess(params, cfg.disc.K)
    dtype = X.dtype
    obj, defect, viol = merit_components(model, cfg, params, X, U, sigma)
    z = jnp.zeros((), dtype)
    return ScvxState(
        X=X, U=U, sigma=jnp.asarray(sigma, dtype),
        tr_radius=jnp.asarray(cfg.scvx.tr_init, dtype),
        penalty_scale=jnp.ones((), dtype),
        obj_nl=obj, defect_nl=defect, viol_nl=viol,
        converged=jnp.asarray(False),
        iterations=jnp.asarray(0, jnp.int32),
        n_accept=jnp.asarray(0, jnp.int32),
        n_reject=jnp.asarray(0, jnp.int32),
        n_bump=jnp.asarray(0, jnp.int32),
        accepted=jnp.asarray(False),
        rho=z, nu_norm=z + jnp.inf, dx_max=z + jnp.inf, pred_dec=z + jnp.inf,
        ipm_gap=z, ipm_iters=jnp.asarray(0, jnp.int32),
        ipm_carry=_unit_ipm_carry(model, cfg, params, X, U, sigma),
    )


def apply_boundary_conditions(model: Model, params, X: jnp.ndarray) -> jnp.ndarray:
    """Overwrite the pinned components of the first/last node with the BCs
    implied by ``params`` (via the model's initial guess)."""
    Xg, _, _ = model.initial_guess(params, X.shape[0])
    init_pin = jnp.asarray(model.init_pinned, X.dtype)
    term_pin = jnp.asarray(model.term_pinned, X.dtype)
    X = X.at[0].set(init_pin * Xg[0] + (1.0 - init_pin) * X[0])
    X = X.at[-1].set(term_pin * Xg[-1] + (1.0 - term_pin) * X[-1])
    return X


def scvx_warm_start(model: Model, params, cfg: SolverConfig,
                    X, U, sigma, tr_radius=None,
                    stm_correct: bool = True) -> ScvxState:
    """Build an ScvxState from a previous solution (real-time replanning).

    The pinned boundary components are overwritten with the NEW params' BCs
    (the subproblem pins deltas to zero at those coordinates, so the reference
    must carry the new boundary values); everything else reuses the previous
    trajectory, which typically converges in a small fraction of a cold
    start's iterations.

    ``stm_correct``: propagate the BC-induced node-0 shift through the
    previous solution's linearized dynamics — delta_k = Phi_{0->k} delta_0,
    with the condensed STMs composed in log depth by
    ``discretize.condense`` (associative_scan, SURVEY §2.3 P4a) — tapered to
    zero toward the pinned terminal node. The corrected warm start is
    dynamically consistent to first order, so the initial-condition mismatch
    is spread across the horizon instead of concentrated in one interval's
    defect, which keeps the first subproblem inside the trust region.

    ``tr_radius``: initial trust radius. Default: the warm state's own
    nonlinear defect (clipped to [8 tr_min, tr_init]) — the defect created by
    the rewritten BCs is the natural scale of the correction the replan needs,
    and starting at the full tr_init wastes a reject/shrink cascade when the
    previous solution is already near-optimal.
    """
    from successiveconvexification_tpu.ops.discretize import condense

    dtype = X.dtype
    X_prev = X
    X = apply_boundary_conditions(model, params, X)
    if stm_correct:
        delta0 = X[0] - X_prev[0]
        disc0 = discretize(model, params, X_prev, U, sigma,
                           substeps=cfg.disc.substeps, foh=cfg.disc.foh)
        Phi = condense(disc0)                       # (K-1, nx, nx)
        K = X.shape[0]
        # taper 1 -> 0 so the pinned terminal node stays put
        w = 1.0 - jnp.arange(1, K, dtype=dtype) / (K - 1)
        X = X.at[1:].add(w[:, None] * jnp.einsum("kij,j->ki", Phi, delta0))
        X = apply_boundary_conditions(model, params, X)
    if model.project_state is not None:
        X = model.project_state(X)
    obj, defect, viol = merit_components(model, cfg, params, X, U, sigma)
    if tr_radius is None:
        tr_radius = jnp.clip(
            defect + viol, 8.0 * cfg.scvx.tr_min, cfg.scvx.tr_init
        )
    z = jnp.zeros((), dtype)
    return ScvxState(
        X=X, U=U, sigma=jnp.asarray(sigma, dtype),
        tr_radius=jnp.asarray(tr_radius, dtype),
        penalty_scale=jnp.ones((), dtype),
        obj_nl=obj, defect_nl=defect, viol_nl=viol,
        converged=jnp.asarray(False),
        iterations=jnp.asarray(0, jnp.int32),
        n_accept=jnp.asarray(0, jnp.int32),
        n_reject=jnp.asarray(0, jnp.int32),
        n_bump=jnp.asarray(0, jnp.int32),
        accepted=jnp.asarray(False),
        rho=z, nu_norm=z + jnp.inf, dx_max=z + jnp.inf, pred_dec=z + jnp.inf,
        ipm_gap=z, ipm_iters=jnp.asarray(0, jnp.int32),
        ipm_carry=_unit_ipm_carry(model, cfg, params, X, U, sigma),
    )


@functools.partial(jax.jit, static_argnums=(0, 2), static_argnames=("assume_warm_valid",))
@full_precision
def scvx_iteration(model: Model, params, cfg: SolverConfig, st: ScvxState,
                   assume_warm_valid: bool = False) -> ScvxState:
    """One full SCvx iteration (discretize + assemble + IPM + accept/reject).

    ``assume_warm_valid``: static fast path — skip the conelp cold-init
    computation entirely and warm-start unconditionally from the carry. Only
    sound when the CALLER certifies every lane's carry is valid (gap finite);
    the batch drivers check that with one cheap all-reduce and lax.cond
    between the two variants, so the cold init (an extra factorize + two KKT
    solves per call) is paid only on iterations where some lane actually got
    invalidated (VERDICT r1 weak #1: the always-on recovery path cost ~9%)."""
    s = cfg.scvx
    dtype = st.X.dtype
    active = ~st.converged
    scale = st.penalty_scale

    # 1) linearize + discretize about the current reference (L3)
    disc = discretize(model, params, st.X, st.U, st.sigma,
                      substeps=cfg.disc.substeps, foh=cfg.disc.foh)

    # 2) assemble the stage SOCP (L4)
    d = socp.assemble(
        model, s, params, disc, st.X, st.U, st.sigma, st.tr_radius,
        free_final_time=cfg.free_final_time, penalty_scale=scale,
    )

    # 3) solve it in-graph (L5), warm-started from the previous subproblem.
    # carry.gap == inf is the "carry invalidated" sentinel (failed solve or
    # penalty rescale last iteration): those lanes restart from the cold init.
    if cfg.ipm.warm_start and assume_warm_valid:
        # hot path: every lane warm-starts from a near-solution carry, which
        # is already well-scaled — skip the Ruiz presolve here (measured 26%
        # of flagship wall, see IPMConfig.equilibrate_cold_only)
        ipm_cfg = cfg.ipm
        if cfg.ipm.equilibrate and cfg.ipm.equilibrate_cold_only:
            import dataclasses as _dc

            ipm_cfg = _dc.replace(cfg.ipm, equilibrate=False)
        sol = ipm.ipm_solve(d, ipm_cfg, init=st.ipm_carry)
    elif cfg.ipm.warm_start:
        sol = ipm.ipm_solve(
            d, cfg.ipm, init=st.ipm_carry,
            init_valid=jnp.isfinite(st.ipm_carry.gap),
        )
    else:
        sol = ipm.ipm_solve(d, cfg.ipm)

    nx, nu = model.nx, model.nu
    nrx = model.nr if model.state_basis is not None else nx
    dXr = sol.x.w[:, :nrx]
    dX = jnp.einsum("kxr,kr->kx", d.Bx, dXr)   # reduced -> full state deltas
    dU = sol.x.w[:, nrx : nrx + nu]
    X_new = st.X + dX
    if model.project_state is not None:
        X_new = model.project_state(X_new)
    U_new = st.U + dU
    sigma_new = st.sigma + sol.x.sig
    # evaluate the linear model's defect/violation AT the candidate (robust to
    # IPM slack tolerance — see socp.linear_merit_terms)
    nu_l1, t_sum = socp.linear_merit_terms(d, sol.x)
    # step-size measure: state/control deltas plus the RELATIVE sigma delta
    dx_max = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(dXr)), jnp.max(jnp.abs(dU))),
        jnp.abs(sol.x.sig) / st.sigma,
    )

    # 4) nonlinear propagation + acceptance ratio (C11)
    J_cur = st.obj_nl + scale * (s.w_nu * st.defect_nl + s.w_feas * st.viol_nl)
    obj2, def2, viol2 = merit_components(model, cfg, params, X_new, U_new,
                                         sigma_new)
    J_new = obj2 + scale * (s.w_nu * def2 + s.w_feas * viol2)
    obj_lin = s.w_sigma * sigma_new
    if model.mass_index is not None and s.w_mass:
        obj_lin = obj_lin - s.w_mass * X_new[-1, model.mass_index]
    J_lin = obj_lin + scale * (s.w_nu * nu_l1 + s.w_feas * t_sum)
    if s.tr_mode == "soft":
        # LM gain ratio: the model cost the subproblem actually minimized
        # includes the damping quadratic, so the damping paid by the step is
        # part of the PREDICTED cost. Without this, heavy damping caps rho at
        # ~actual/(actual + damping) < rho2 forever and the radius never grows
        # (constant-step tail creep).
        q_cost = 0.5 * (jnp.sum(d.Q_w * sol.x.w**2) + d.Q_sig * sol.x.sig**2)
        if d.Q_r1.shape[1]:
            q_cost = q_cost + 0.5 * jnp.sum(
                jnp.einsum("kiw,kw->ki", d.Q_r1, sol.x.w) ** 2
            )
        J_lin = J_lin + q_cost

    predicted = J_cur - J_lin
    actual = J_cur - J_new
    # predicted >= -O(discretization error) by construction (the subproblem's
    # linear objective at its optimum cannot exceed its value at delta = 0,
    # which equals J_nl up to integrator error); floor it so a tiny negative
    # denominator cannot flip the sign of rho
    denom = jnp.maximum(predicted, 1e-10)
    rho = actual / denom

    ipm_ok = jnp.all(jnp.isfinite(dX)) & jnp.isfinite(J_new)
    # solve-quality gate: a subproblem whose evaluated linear merit EXCEEDS the
    # delta=0 value (predicted << 0) or whose residuals are far above solver
    # tolerance did not actually solve the subproblem; its candidate can be
    # rejected by rho as usual, but it must not certify stationarity (else a
    # failed solve right after a strong accept triggers a spurious penalty-
    # continuation cascade) and its duals must not seed the next warm start.
    solve_ok = (
        ipm_ok
        & jnp.isfinite(sol.gap)
        & (sol.pres < s.solve_fail_res)
        & (sol.dres < s.solve_fail_res)
        & (predicted > -s.conv_tol_pred * jnp.maximum(1.0, jnp.abs(J_cur)))
    )
    # two-track acceptance: merit ratio OR strict feasibility progress (filter)
    h_cur = st.defect_nl + st.viol_nl
    h_new = def2 + viol2
    feas_step = h_new <= s.filter_gamma * h_cur
    accept = ((rho >= s.rho0) | feas_step) & ipm_ok

    # 5) trust-region update (shrink / hold / grow). In soft mode tr_radius is the
    # INVERSE LM damping — the same shrink/grow schedule adapts the damping.
    tr_shrunk = st.tr_radius * s.tr_shrink
    tr_grown = st.tr_radius * s.tr_grow
    # soft/LM mode: grow gently on EVERY healthy accept (see config.tr_grow_mid)
    # hard mode: leak the radius down in the hold band (see config.tr_hold)
    tr_mid = st.tr_radius * (s.tr_grow_mid if s.tr_mode == "soft" else s.tr_hold)
    tr_next = jnp.where(
        ~accept | (rho < s.rho1), tr_shrunk,
        jnp.where(rho < s.rho2, tr_mid, tr_grown),
    )
    tr_next = jnp.clip(tr_next, s.tr_min, s.tr_max)

    # 6) masked state update (P8: per-lane divergence under vmap)
    upd = active & accept

    def pick(new, old):
        return jnp.where(upd, new, old)

    defect_after = pick(def2, st.defect_nl)
    viol_after = pick(viol2, st.viol_nl)

    # convergence and penalty continuation: a STATIONARY point that is FEASIBLE
    # converges; stationary-but-infeasible is a spurious minimum of the
    # penalized merit -> raise the penalty scale and reset the trust state.
    # Stationarity = tiny step OR tiny predicted decrease (the subproblem's own
    # optimality certificate: the convexification can find no descent within
    # the trust region, so waiting for the TR to collapse is pure creep).
    small_step = solve_ok & (dx_max < s.conv_tol_tr)
    small_pred = solve_ok & (
        predicted < s.conv_tol_pred * jnp.maximum(1.0, jnp.abs(J_cur))
    )
    stationary = small_step | small_pred
    # dtype-aware feasibility floor: an n-term L1 sum of O(1) quantities has a
    # round-off floor ~ eps * n; demanding less is unreachable in f32 and
    # sends the penalty continuation to its cap (see config.conv_feas_eps_mult)
    tol_feas = max(
        s.conv_tol_feas,
        s.conv_feas_eps_mult * float(jnp.finfo(dtype).eps) * st.X.size,
    )
    feasible = (defect_after + viol_after) < tol_feas
    # continuation triggers on stationarity OR an exhausted trust state (the
    # reject/accept cycle can hold dx above conv_tol_tr indefinitely)
    stalled = stationary | (tr_next <= 8.0 * s.tr_min)
    bump = active & stalled & (~feasible) & (
        st.penalty_scale < s.penalty_scale_max
    )
    conv_now = stationary & feasible

    tr_out = jnp.where(active, tr_next, st.tr_radius)
    # bump re-opens the trust state proportionally to the working radius
    # (full tr_init reset wastes a shrink cascade every continuation round)
    tr_bumped = jnp.clip(
        tr_next * s.tr_bump_grow, s.tr_min, jnp.asarray(s.tr_init, dtype)
    )
    tr_out = jnp.where(bump, tr_bumped, tr_out)
    pscale = jnp.where(bump, st.penalty_scale * s.penalty_grow, st.penalty_scale)

    # A failed subproblem solve (huge/non-finite gap) or a penalty-scale bump
    # invalidates the warm-start carry: the stale duals re-poison every later
    # solve (the IPM never recovers -> permanent reject loop). Mark the carry
    # with the gap = inf sentinel; the next ipm_solve cold-starts those lanes.
    ipm_bad = (~solve_ok) | (sol.gap > s.carry_reset_gap)
    reset_carry = bump | (active & ipm_bad)

    # Warm-start carry: duals (y, z) are reused as-is; the PRIMAL delta is
    # re-centered to the next subproblem's frame. On accept the reference
    # moves to the candidate, so the old delta is exactly 0 in the new
    # coordinates; on reject the reference stays but the radius shrinks, so
    # the delta is scaled into the smaller trust region. (Slacks in the carry
    # are ignored — ipm_solve re-derives s = h - G x from the new problem.)
    carry_x_scale = jnp.where(upd, 0.0, jnp.asarray(s.tr_shrink, dtype))
    carry_sol = sol._replace(
        x=jax.tree.map(lambda a: a * carry_x_scale, sol.x)
    )

    return ScvxState(
        X=pick(X_new, st.X),
        U=pick(U_new, st.U),
        sigma=pick(sigma_new, st.sigma),
        tr_radius=tr_out,
        penalty_scale=pscale,
        obj_nl=pick(obj2, st.obj_nl),
        defect_nl=defect_after,
        viol_nl=viol_after,
        converged=st.converged | (active & conv_now),
        iterations=st.iterations + active.astype(jnp.int32),
        n_accept=st.n_accept + (active & accept).astype(jnp.int32),
        n_reject=st.n_reject + (active & ~accept).astype(jnp.int32),
        n_bump=st.n_bump + bump.astype(jnp.int32),
        accepted=jnp.where(active, accept, st.accepted),
        rho=jnp.where(active, rho, st.rho),
        nu_norm=jnp.where(active, nu_l1, st.nu_norm),
        dx_max=jnp.where(active, dx_max, st.dx_max),
        pred_dec=jnp.where(active, predicted, st.pred_dec),
        ipm_gap=jnp.where(active, sol.gap, st.ipm_gap),
        ipm_iters=jnp.where(active, sol.iters, st.ipm_iters),
        ipm_carry=jax.tree.map(
            lambda new, old: jnp.where(active, new, old), carry_sol, st.ipm_carry
        )._replace(
            gap=jnp.where(
                reset_carry, jnp.asarray(jnp.inf, dtype),
                jnp.where(active, sol.gap, st.ipm_carry.gap),
            )
        ),
    )


@functools.partial(jax.jit, static_argnums=(0, 2))
def scvx_solve(model: Model, params, cfg: SolverConfig) -> ScvxState:
    """Full single-scenario solve: init + masked fixed-point loop (L6 entry)."""
    st0 = scvx_init(model, params, cfg)

    def cond(st: ScvxState):
        return (~st.converged) & (st.iterations < cfg.scvx.max_iters)

    def body(st: ScvxState):
        if not cfg.ipm.warm_start:
            return scvx_iteration(model, params, cfg, st)
        # pay the conelp cold-init only on iterations whose carry was
        # invalidated (first iteration, failed solve, penalty rescale)
        return jax.lax.cond(
            jnp.isfinite(st.ipm_carry.gap),
            lambda s: scvx_iteration(model, params, cfg, s,
                                     assume_warm_valid=True),
            lambda s: scvx_iteration(model, params, cfg, s),
            st,
        )

    return jax.lax.while_loop(cond, body, st0)
