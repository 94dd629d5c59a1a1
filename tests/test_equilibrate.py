"""Ruiz equilibration (ops/equilibrate.py): scaling correctness.

The equilibrated problem must be the SAME optimization problem in different
coordinates: solutions map back exactly through EqScales, and ipm_solve with
equilibrate=True must agree with equilibrate=False to solver tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from successiveconvexification_tpu.config import IPMConfig, ScvxConfig
from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.ops import equilibrate as EQ
from successiveconvexification_tpu.ops import ipm, socp
from successiveconvexification_tpu.ops.discretize import discretize

F64 = jnp.float64


@pytest.fixture(scope="module")
def prob():
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    cfgs = ScvxConfig(tr_mode="soft")
    X, U, sigma = model.initial_guess(params, 8)
    disc = discretize(model, params, X, U, sigma, substeps=8)
    return socp.assemble(
        model, cfgs, params, disc, X, U, sigma,
        jnp.asarray(2.0, F64), free_final_time=True,
    )


def test_scaled_matrix_norms_balanced(prob):
    """After equilibration every nonzero row/col of [A; G] has inf-norm
    within a modest factor of 1 (that's the definition of the pass)."""
    d, eq = EQ.equilibrate(prob, iters=3)
    rows = []
    rows.append(jnp.max(jnp.abs(d.G_lin), axis=-1).ravel())
    for G in d.G_socs:
        rows.append(jnp.max(jnp.abs(G), axis=(-2, -1)).ravel())
    rows.append(
        jnp.maximum(
            jnp.max(jnp.abs(d.E), axis=-1), jnp.max(jnp.abs(d.F), axis=-1)
        ).ravel()
    )
    allrows = np.asarray(jnp.concatenate(rows))
    nz = allrows[allrows > 0]
    assert nz.max() < 4.0, nz.max()
    assert nz.min() > 0.05, nz.min()


def test_problem_equivalence_through_scales(prob):
    """A feasible point maps through the scales with identical residuals:
    scaled problem == raw problem in scaled coordinates, not a new problem."""
    d, eq = EQ.equilibrate(prob, iters=3)
    key = jax.random.PRNGKey(0)
    x = socp.Primal(
        w=jax.random.normal(key, prob.c_w.shape, F64),
        p=jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), prob.c_p.shape, F64)),
        q=jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), prob.c_q.shape, F64)),
        sig=jnp.asarray(0.3, F64),
    )
    xs = EQ.scale_primal(eq, x, to_scaled=True)
    # equality residual: scaled residual == ry * raw residual
    r_raw = socp.apply_A(prob, x) - prob.b
    r_scl = socp.apply_A(d, xs) - d.b
    np.testing.assert_allclose(np.asarray(r_scl), np.asarray(eq.ry * r_raw),
                               rtol=1e-12, atol=1e-12)
    # cone slack: scaled h - G xs == R_G * (raw h - G x)
    s_raw = {k: v for k, v in socp.cone_h(prob).items()}
    gx = socp.apply_G(prob, x)
    s_raw = {k: s_raw[k] - gx[k] for k in s_raw}
    s_scl = socp.cone_h(d)
    gxs = socp.apply_G(d, xs)
    s_scl = {k: s_scl[k] - gxs[k] for k in s_scl}
    rg = EQ._row_scales(eq, prob.c_p.shape[-1])
    for k in s_raw:
        np.testing.assert_allclose(
            np.asarray(s_scl[k]), np.asarray(rg[k] * s_raw[k]),
            rtol=1e-12, atol=1e-12, err_msg=k,
        )
    # objective: tau * raw objective value
    o_raw = socp.primal_inner(socp.objective(prob), x)
    o_scl = socp.primal_inner(socp.objective(d), xs)
    np.testing.assert_allclose(float(o_scl), float(eq.tau * o_raw), rtol=1e-12)


def test_scale_state_roundtrip(prob):
    d, eq = EQ.equilibrate(prob, iters=3)
    cfg = IPMConfig(max_iters=25, equilibrate=False)
    st = ipm.ipm_solve(prob, cfg)
    nx = prob.c_p.shape[-1]
    st2 = EQ.scale_state(eq, EQ.scale_state(eq, st, nx, True), nx, False)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14)


def test_ipm_equilibrated_matches_plain(prob):
    tight = dict(max_iters=40, tol_gap=1e-8, tol_feas=1e-8, refine_steps=3)
    st0 = ipm.ipm_solve(prob, IPMConfig(equilibrate=False, **tight))
    st1 = ipm.ipm_solve(prob, IPMConfig(equilibrate=True, **tight))
    assert bool(st0.converged) and bool(st1.converged)
    np.testing.assert_allclose(
        np.asarray(st1.x.w), np.asarray(st0.x.w), atol=2e-6
    )
    np.testing.assert_allclose(float(st1.x.sig), float(st0.x.sig), atol=2e-6)


def test_ipm_equilibrated_warm_start(prob):
    """Warm start in RAW coordinates must be accepted (and help) when the
    solve itself runs in scaled coordinates."""
    cfg = IPMConfig(max_iters=40, tol_gap=1e-8, tol_feas=1e-8,
                    refine_steps=3, equilibrate=True)
    st = ipm.ipm_solve(prob, cfg)
    st2 = ipm.ipm_solve(prob, cfg, init=st,
                        init_valid=jnp.asarray(True))
    assert bool(st2.converged)
    assert int(st2.iters) <= int(st.iters)
    np.testing.assert_allclose(
        np.asarray(st2.x.w), np.asarray(st.x.w), atol=5e-6
    )
