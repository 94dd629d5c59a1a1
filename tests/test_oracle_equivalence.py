"""Full-trajectory oracle equivalence (the BASELINE <1e-3 control gate).

The reference's accuracy gate is "control deviation < 1e-3 vs the ECOS/JuMP
solution at the same K" (BASELINE.json). ECOS cannot run here (SURVEY §0), so
the gate is anchored to the in-repo native C++ oracle: along the ENGINE's own
SCvx solution path, every subproblem is re-solved by the independent native
solver and the candidate controls must agree within 1e-3 — which by induction
pins the whole control trajectory to what an external-native-solver pipeline
would produce.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dense_ref
import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import ipm, socp
from successiveconvexification_tpu.ops.discretize import discretize
from successiveconvexification_tpu.ops.scvx import scvx_init, scvx_iteration
from successiveconvexification_tpu.oracle import native

F64 = jnp.float64

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ build failed")


def test_controls_match_native_oracle_along_solution_path():
    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=10, substeps=5),
        # 50-iteration budget: the while_loop exits early on convergence, so
        # the headroom is free when a solve finishes sooner; the equilibrated
        # hard-TR K=50 subproblem's gap tail needs a few more iterations to
        # cross 1e-9 than the raw-space solve did
        ipm=scvx.IPMConfig(max_iters=50, refine_steps=2, tol_gap=1e-9,
                           tol_feas=1e-9),
        # soft mode: the LM damping makes every subproblem strictly convex, so
        # the primal solution is unique and control-level comparison against
        # the independent solver is well-posed. (Hard-TR subproblems can be
        # degenerate — equal objectives, different optimal controls — covered
        # by the objective-equivalence tests in test_ipm_structured.py.)
        scvx=dataclasses.replace(
            scvx.ScvxConfig(), tr_mode="soft", w_feas=1000.0, tr_init=0.1
        ),
    )
    it_jit = jax.jit(lambda p, stt: scvx_iteration(model, p, cfg, stt))
    ipm_jit = jax.jit(lambda d: ipm.ipm_solve(d, cfg.ipm))

    st = scvx_init(model, params, cfg)
    nrx, nu = model.nr, model.nu
    max_du = 0.0
    checked = 0
    for i in range(8):
        disc = discretize(model, params, st.X, st.U, st.sigma,
                          substeps=cfg.disc.substeps)
        d = socp.assemble(model, cfg.scvx, params, disc, st.X, st.U, st.sigma,
                          st.tr_radius, True, st.penalty_scale)
        sol = ipm_jit(d)

        # independent native C++ solve of the same subproblem
        c, A, b, G, h, cones, P = dense_ref.materialize(d)
        res = native.solve(c, A, b, G, h, cones,
                           P=np.ascontiguousarray(P), tol=1e-11, max_iters=100)
        x_or = dense_ref.unflatten_primal(d, jnp.asarray(res.x))

        du = float(jnp.max(jnp.abs(
            sol.x.w[:, nrx:nrx + nu] - x_or.w[:, nrx:nrx + nu]
        )))
        dsig = abs(float(sol.x.sig) - float(x_or.sig))
        max_du = max(max_du, du, dsig)
        checked += 1

        st = it_jit(params, st)
        if bool(st.converged):
            break

    assert checked >= 5
    assert max_du < 1e-3, max_du


# ---------------------------------------------------------------------------
# Flagship-horizon (K=50) gates — BASELINE.json: "<1e-3 control deviation at
# the SAME K-node horizon". The hand-rolled dense C++ LU is O((n+p+m)^3) per
# iteration and needs ~30 min per K=50 subproblem, so these gates anchor to
# the LAPACK-backed NumPy oracle (oracle/dense_socp.py) — the designated
# second independent solver (SURVEY C9): same textbook NT/Mehrotra formulas,
# fully independent dense implementation. ~105 s per oracle solve.
# ---------------------------------------------------------------------------

_K50 = 50


def _k50_cfg(tr_mode):
    extra = {"tr_mode": tr_mode}
    if tr_mode == "soft":
        extra.update(w_feas=1000.0, tr_init=0.1)
    return scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=_K50, substeps=5),
        # 50-iteration budget: the while_loop exits early on convergence, so
        # the headroom is free when a solve finishes sooner; the equilibrated
        # hard-TR K=50 subproblem's gap tail needs a few more iterations to
        # cross 1e-9 than the raw-space solve did
        ipm=scvx.IPMConfig(max_iters=50, refine_steps=2, tol_gap=1e-9,
                           tol_feas=1e-9),
        scvx=dataclasses.replace(scvx.ScvxConfig(), **extra),
    )


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("SCVX_SKIP_SLOW") == "1",
                    reason="explicitly disabled")
def test_controls_match_oracle_at_flagship_k50():
    """Soft-mode <1e-3 control gate AT the flagship horizon: the first 5
    subproblems along the engine's own K=50 solution path are re-solved by the
    independent NumPy oracle; candidate controls must agree element-wise."""
    from successiveconvexification_tpu.oracle import dense_socp

    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    cfg = _k50_cfg("soft")
    it_jit = jax.jit(lambda p, stt: scvx_iteration(model, p, cfg, stt))
    ipm_jit = jax.jit(lambda d: ipm.ipm_solve(d, cfg.ipm))

    st = scvx_init(model, params, cfg)
    nrx, nu = model.nr, model.nu
    max_du = 0.0
    for i in range(5):
        disc = discretize(model, params, st.X, st.U, st.sigma,
                          substeps=cfg.disc.substeps)
        d = socp.assemble(model, cfg.scvx, params, disc, st.X, st.U, st.sigma,
                          st.tr_radius, True, st.penalty_scale)
        sol = ipm_jit(d)

        c, A, b, G, h, cones, P = dense_ref.materialize(d)
        res = dense_socp.solve(
            np.asarray(c), np.asarray(A), np.asarray(b), np.asarray(G),
            np.asarray(h), cones, P=np.ascontiguousarray(np.asarray(P)),
            tol=1e-10, max_iters=40,
        )
        assert res.converged, (i, res.gap, res.pres, res.dres)
        x_or = dense_ref.unflatten_primal(d, jnp.asarray(res.x))

        du = float(jnp.max(jnp.abs(
            sol.x.w[:, nrx:nrx + nu] - x_or.w[:, nrx:nrx + nu]
        )))
        dsig = abs(float(sol.x.sig) - float(x_or.sig))
        max_du = max(max_du, du, dsig)

        st = it_jit(params, st)

    assert max_du < 1e-3, max_du


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("SCVX_SKIP_SLOW") == "1",
                    reason="explicitly disabled")
def test_hard_mode_objective_matches_oracle_at_k50():
    """Hard-TR (shipped default) K=50 subproblem vs the oracle. Hard-TR
    subproblems can be primal-degenerate (equal objective, different optimal
    controls), so the degeneracy-aware gate compares the OBJECTIVE values and
    the oracle's own optimality certificates, not element-wise controls."""
    from successiveconvexification_tpu.oracle import dense_socp
    from successiveconvexification_tpu.ops.socp import objective, primal_inner

    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    cfg = _k50_cfg("hard")
    it_jit = jax.jit(lambda p, stt: scvx_iteration(model, p, cfg, stt))
    ipm_jit = jax.jit(lambda d: ipm.ipm_solve(d, cfg.ipm))

    # step twice so the subproblem is a mid-path one, not the cold init
    st = scvx_init(model, params, cfg)
    for _ in range(2):
        st = it_jit(params, st)

    disc = discretize(model, params, st.X, st.U, st.sigma,
                      substeps=cfg.disc.substeps)
    d = socp.assemble(model, cfg.scvx, params, disc, st.X, st.U, st.sigma,
                      st.tr_radius, True, st.penalty_scale)
    sol = ipm_jit(d)
    assert bool(sol.converged), (float(sol.gap), float(sol.pres))

    c, A, b, G, h, cones, P = dense_ref.materialize(d)
    # tol=3e-8: the K=50 hard-TR subproblem's relative gap floors around
    # 1e-8 in the oracle's 50-iteration budget (pres/dres reach 1e-15) —
    # still three orders tighter than the 1e-5 objective gate below.
    res = dense_socp.solve(
        np.asarray(c), np.asarray(A), np.asarray(b), np.asarray(G),
        np.asarray(h), cones, P=np.ascontiguousarray(np.asarray(P)),
        tol=3e-8, max_iters=50,
    )
    assert res.converged, (res.gap, res.pres, res.dres)

    cvec = objective(d)
    obj_engine = float(primal_inner(cvec, sol.x))
    obj_oracle = float(np.asarray(c) @ res.x)
    # P is the quadratic part (pins / penalized directions)
    Pm = np.ascontiguousarray(np.asarray(P))
    x_eng_flat = np.asarray(dense_ref.flatten_primal(sol.x))
    obj_engine += 0.5 * float(x_eng_flat @ Pm @ x_eng_flat)
    obj_oracle += 0.5 * float(res.x @ Pm @ res.x)
    assert abs(obj_engine - obj_oracle) < 1e-5 * max(1.0, abs(obj_oracle)), (
        obj_engine, obj_oracle
    )


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("SCVX_SKIP_SLOW") == "1",
                    reason="explicitly disabled")
def test_controls_match_NATIVE_oracle_at_flagship_k50():
    """The <1e-3 control gate at K=50 against the NATIVE C++ solver
    (VERDICT r2 item 10): the banded stage-structured KKT backend
    (scvx_oracle_solve_banded, O(N bw^2) per iteration) makes the flagship
    subproblem solve in seconds, so the native anchor is exercised at the
    SAME horizon as the mission metric — not just at toy K.

    The banded no-pivot LDL' oracle floors around relative gap ~1e-5..1e-6
    (dynamically-regularized pivots; primal/dual residuals reach ~1e-9),
    which is three orders tighter than the 1e-3 gate needs."""
    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    cfg = _k50_cfg("soft")
    it_jit = jax.jit(lambda p, stt: scvx_iteration(model, p, cfg, stt))
    ipm_jit = jax.jit(lambda d: ipm.ipm_solve(d, cfg.ipm))

    st = scvx_init(model, params, cfg)
    nrx, nu = model.nr, model.nu
    max_du = 0.0
    for i in range(3):
        disc = discretize(model, params, st.X, st.U, st.sigma,
                          substeps=cfg.disc.substeps)
        d = socp.assemble(model, cfg.scvx, params, disc, st.X, st.U, st.sigma,
                          st.tr_radius, True, st.penalty_scale)
        sol = ipm_jit(d)

        c, A, b, G, h, cones, P = dense_ref.materialize(d)
        perm, n_band, bw = native.stage_permutation(d)
        res = native.solve_banded(
            np.asarray(c), np.asarray(A), np.asarray(b), np.asarray(G),
            np.asarray(h), cones, perm, n_band, bw,
            P=np.ascontiguousarray(np.asarray(P)), tol=1e-9, reg=1e-9,
            max_iters=60,
        )
        # accuracy floor of the banded backend, far inside the 1e-3 gate
        assert res.gap < 1e-4, (i, res.gap)
        assert res.pres < 1e-6 and res.dres < 1e-6, (i, res.pres, res.dres)
        x_or = dense_ref.unflatten_primal(d, jnp.asarray(res.x))

        du = float(jnp.max(jnp.abs(
            sol.x.w[:, nrx:nrx + nu] - x_or.w[:, nrx:nrx + nu]
        )))
        dsig = abs(float(sol.x.sig) - float(x_or.sig))
        max_du = max(max_du, du, dsig)

        st = it_jit(params, st)

    assert max_du < 1e-3, max_du
