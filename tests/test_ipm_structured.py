"""Structured in-graph IPM vs the dense f64 oracle on real assembled subproblems.

This is the BASELINE oracle-equivalence gate at the subproblem level (SURVEY.md
§4.2): identical (A_k, Bm_k, Bp_k, S_k, z_k) data, two independent solvers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dense_ref
from successiveconvexification_tpu.config import IPMConfig, ScvxConfig
from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import ipm, socp
from successiveconvexification_tpu.ops.discretize import discretize
from successiveconvexification_tpu.oracle import dense_socp

F64 = jnp.float64


def _assemble(model, params, K, tr_radius=2.0, tr_mode="soft"):
    # soft mode by default: the damping makes the subproblem strictly convex,
    # so primal solutions are unique and element-wise oracle comparison is
    # well-posed. Hard-TR subproblems (degenerate optima) are covered by the
    # objective-equivalence test below.
    cfg = ScvxConfig(tr_mode=tr_mode)
    X, U, sigma = model.initial_guess(params, K)
    disc = discretize(model, params, X, U, sigma, substeps=8)
    d = socp.assemble(
        model, cfg, params, disc, X, U, sigma,
        jnp.asarray(tr_radius, F64), free_final_time=True,
    )
    return d


@pytest.fixture(scope="module")
def prob3():
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    return _assemble(model, params, K=8)


@pytest.fixture(scope="module")
def prob6():
    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    return _assemble(model, params, K=7)


def _flatten_solution(d, st):
    x = dense_ref.flatten_primal(
        jax.tree.map(np.asarray, st.x)
    )
    z = np.asarray(dense_ref.flatten_conevec(d, st.z))
    s = np.asarray(dense_ref.flatten_conevec(d, st.s))
    y = np.ravel(np.asarray(st.y))
    return x, y, z, s


@pytest.mark.parametrize("probname", ["prob3", "prob6"])
def test_structured_ipm_kkt_certificate(probname, request):
    """The structured solver's solution must satisfy the DENSE KKT system."""
    d = request.getfixturevalue(probname)
    cfg = IPMConfig(max_iters=40, tol_gap=1e-8, tol_feas=1e-8, static_reg=1e-8, refine_steps=3)
    st = ipm.ipm_solve(d, cfg)
    assert bool(st.converged), (float(st.gap), float(st.pres), float(st.dres))

    c, A, b, G, h, cones, P = dense_ref.materialize(d)
    x, y, z, s = _flatten_solution(d, st)
    pres, dres, gap, viol = dense_ref.kkt_certificate(
        c, A, b, G, h, cones, P, x, y, z, s
    )
    assert pres < 1e-7, pres
    assert dres < 1e-7, dres
    assert gap < 1e-6, gap
    assert viol < 1e-9, viol


@pytest.mark.parametrize("probname", ["prob3", "prob6"])
def test_structured_matches_oracle_objective(probname, request):
    d = request.getfixturevalue(probname)
    cfg = IPMConfig(max_iters=40, tol_gap=1e-8, tol_feas=1e-8, static_reg=1e-8, refine_steps=3)
    st = ipm.ipm_solve(d, cfg)
    # gap/pres may flag convergence only marginally; the certificate below is the
    # authoritative check
    assert float(st.gap) < 1e-7 and float(st.pres) < 1e-6

    c, A, b, G, h, cones, P = dense_ref.materialize(d)
    res = dense_socp.solve(c, A, b, G, h, cones, P=P, tol=1e-10)
    assert res.converged

    x_struct, _, _, _ = _flatten_solution(d, st)
    obj_struct = float(c @ x_struct)
    obj_oracle = float(c @ res.x)
    scale = max(1.0, abs(obj_oracle))
    assert abs(obj_struct - obj_oracle) / scale < 1e-6

    # primal solutions should agree closely on the (dx, du, dsigma) blocks
    # (unique under the soft-mode damping); compare with loose tol to allow
    # degenerate directions
    np.testing.assert_allclose(x_struct, res.x, atol=5e-5)


@pytest.mark.parametrize("builder", ["pm", "rk"])
def test_structured_matches_oracle_objective_hard_tr(builder):
    """Hard-TR subproblems (the library default) can have degenerate optima, so
    the oracle gate is OBJECTIVE equivalence; element-wise solution equality is
    only well-posed in soft mode (tests above)."""
    if builder == "pm":
        d = _assemble(pm.pointmass3dof_model(), pm.default_params(dtype=F64),
                      K=8, tr_radius=0.5, tr_mode="hard")
    else:
        d = _assemble(rk.rocket6dof_model(), rk.default_params(dtype=F64),
                      K=7, tr_radius=0.5, tr_mode="hard")
    cfg = IPMConfig(max_iters=40, tol_gap=1e-8, tol_feas=1e-8,
                    static_reg=1e-8, refine_steps=3)
    st = ipm.ipm_solve(d, cfg)
    assert float(st.gap) < 1e-7 and float(st.pres) < 1e-6

    c, A, b, G, h, cones, P = dense_ref.materialize(d)
    res = dense_socp.solve(c, A, b, G, h, cones, P=P, tol=1e-10)
    assert res.converged

    x_struct, _, _, _ = _flatten_solution(d, st)
    scale = max(1.0, abs(float(c @ res.x)))
    assert abs(float(c @ x_struct) - float(c @ res.x)) / scale < 1e-6


def test_structured_ipm_jits(prob3):
    cfg = IPMConfig(max_iters=15)
    fn = jax.jit(lambda d: ipm.ipm_solve(d, cfg))
    st = fn(prob3)
    assert np.isfinite(float(st.gap))


def test_structured_ipm_vmaps(prob3):
    """vmap(solve) over stacked copies == each solved identically."""
    cfg = IPMConfig(max_iters=25)
    B = 3
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), prob3)
    sts = jax.vmap(lambda d: ipm.ipm_solve(d, cfg))(batch)
    st0 = ipm.ipm_solve(prob3, cfg)
    # vmapped and single execution use different XLA fusions; agreement is to
    # solver accuracy, not bitwise
    np.testing.assert_allclose(
        np.asarray(sts.x.w[0]), np.asarray(st0.x.w), atol=1e-5
    )
    # identical lanes inside one vmap ARE bitwise identical
    np.testing.assert_allclose(
        np.asarray(sts.x.w[1]), np.asarray(sts.x.w[2]), rtol=0, atol=0
    )


def test_pcr_matches_scan(prob3):
    """PCR (log-depth) and scan KKT backends must agree to solver precision."""
    cfg_scan = IPMConfig(max_iters=25, refine_steps=2, kkt_solver="scan")
    cfg_pcr = IPMConfig(max_iters=25, refine_steps=2, kkt_solver="pcr")
    st_a = ipm.ipm_solve(prob3, cfg_scan)
    st_b = ipm.ipm_solve(prob3, cfg_pcr)
    np.testing.assert_allclose(
        np.asarray(st_a.x.w), np.asarray(st_b.x.w), atol=1e-7
    )
    assert abs(float(st_a.x.sig) - float(st_b.x.sig)) < 1e-8


def test_stall_exit_terminates_early(prob3):
    """A lane that cannot certify (impossible tolerances) must be detected as
    STALLED — the iteration body is deterministic in the iterate, so a lane
    whose update gate failed once can never move again — and the while_loop
    must stop instead of burning the whole budget. The certificate stays
    honestly False and the pre-stall iterate is still a good solution."""
    d = jax.tree.map(lambda a: a.astype(jnp.float32)
                     if a.dtype == jnp.float64 else a, prob3)
    cfg = IPMConfig(max_iters=300, tol_gap=1e-30, tol_feas=1e-30,
                    tol_eps_mult=0.0, refine_steps=1)
    st = ipm.ipm_solve(d, cfg)
    assert not bool(st.converged)
    assert bool(st.stalled)
    assert int(st.iters) < 300
    assert float(st.gap) < 1e-3  # froze AFTER reaching a good iterate


def test_gondzio_correctors_match_plain_solution(prob3):
    """Gondzio centrality correctors must not change WHAT is solved: same
    certificate, same primal solution within tolerance, never more
    iterations than they claim to save on this problem."""
    cfg0 = IPMConfig(max_iters=60, tol_gap=1e-8, tol_feas=1e-8, refine_steps=2)
    cfg2 = IPMConfig(max_iters=60, tol_gap=1e-8, tol_feas=1e-8, refine_steps=2,
                     gondzio_correctors=2)
    st0 = ipm.ipm_solve(prob3, cfg0)
    st2 = ipm.ipm_solve(prob3, cfg2)
    assert bool(st0.converged) and bool(st2.converged)
    assert int(st2.iters) <= int(st0.iters) + 2
    np.testing.assert_allclose(np.asarray(st2.x.w), np.asarray(st0.x.w),
                               atol=5e-6)
