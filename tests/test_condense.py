"""Associative-scan STM condensing (SURVEY §2.3 P4a).

The state-transition-map composition is associative, so whole-horizon
condensing runs in O(log K) depth (``jax.lax.associative_scan``) instead of a
K-step sequential recursion. These tests pin the log-depth results to the
sequential definitions exactly, and exercise the engine consumer (the
STM-corrected replanning warm start).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.ops.discretize import (
    condense,
    discretize,
    linear_rollout,
)
from successiveconvexification_tpu.ops.scvx import (
    scvx_init,
    scvx_iteration,
    scvx_warm_start,
)

F64 = jnp.float64


@pytest.fixture(scope="module")
def cfg():
    return scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=12, substeps=4),
        ipm=scvx.IPMConfig(max_iters=20, refine_steps=1),
        scvx=scvx.ScvxConfig(max_iters=25),
    )


@pytest.fixture(scope="module")
def disc_and_state(cfg):
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    st = scvx_init(model, params, cfg)
    d = discretize(model, params, st.X, st.U, st.sigma,
                   substeps=cfg.disc.substeps, foh=cfg.disc.foh)
    return model, params, st, d


def test_condense_matches_sequential_product(disc_and_state):
    _, _, _, d = disc_and_state
    Phi = condense(d)
    acc = np.eye(d.A.shape[-1])
    for k in range(d.A.shape[0]):
        acc = np.asarray(d.A[k]) @ acc
        np.testing.assert_allclose(np.asarray(Phi[k]), acc, rtol=1e-12, atol=1e-12)


def test_linear_rollout_matches_sequential_scan(disc_and_state):
    _, _, st, d = disc_and_state
    xs = linear_rollout(d, st.X[0], st.U, st.sigma)

    def step(x, ops):
        A, Bm, Bp, S, z, uk, ukp1 = ops
        xn = A @ x + Bm @ uk + Bp @ ukp1 + S * st.sigma + z
        return xn, xn

    _, xs_seq = jax.lax.scan(
        step, st.X[0], (d.A, d.Bm, d.Bp, d.S, d.z, st.U[:-1], st.U[1:])
    )
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_seq),
                               rtol=1e-10, atol=1e-10)


def test_linear_rollout_consistent_with_propagation(disc_and_state):
    """Rolling out the affine maps from the reference's own first node must
    reproduce the multiple-shooting propagation up to accumulated defects:
    x_hat_{k+1} - x_prop_k is exactly the earlier intervals' defects pushed
    through the STMs."""
    _, _, st, d = disc_and_state
    xs = linear_rollout(d, st.X[0], st.U, st.sigma)
    # bound: ||x_hat - x_prop||_inf <= sum of defect norms amplified by the
    # largest STM growth factor along the horizon
    Phi = condense(d)
    amp = float(jnp.max(jnp.abs(Phi)))
    slack = (1.0 + amp) * float(jnp.sum(jnp.abs(d.defect)))
    err = float(jnp.max(jnp.abs(xs - d.x_prop)))
    assert err <= slack + 1e-9


@pytest.fixture(scope="module")
def solved(cfg):
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    it = jax.jit(lambda p, s: scvx_iteration(model, p, cfg, s))
    st = scvx_init(model, params, cfg)
    for _ in range(25):
        st = it(params, st)
    return model, params, st


def test_stm_corrected_warm_start_beats_plain(solved, cfg):
    """The engine consumer: after an initial-condition change, the
    STM-corrected warm start (condensed delta propagation) must start with a
    smaller nonlinear defect than plainly rewriting the first node."""
    model, params, st = solved
    params2 = params.replace(
        r_init=params.r_init + jnp.asarray([0.15, -0.12, 0.08], F64)
    )
    plain = scvx_warm_start(model, params2, cfg, st.X, st.U, st.sigma,
                            stm_correct=False)
    corr = scvx_warm_start(model, params2, cfg, st.X, st.U, st.sigma,
                           stm_correct=True)
    assert float(corr.defect_nl) < float(plain.defect_nl)
