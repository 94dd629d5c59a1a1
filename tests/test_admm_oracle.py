"""Three-solver cross-check (SURVEY §2.1 C9: the ECOS-vs-Mosek role).

The ADMM oracle (operator splitting, oracle/admm_socp.py) shares NO algorithm
machinery with either IPM (in-graph TPU or dense NumPy): agreement between the
families rules out shared-formula bugs, which implementation-level diversity
alone cannot.
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
from successiveconvexification_tpu.oracle import admm_socp, dense_socp

F64 = jnp.float64


def _assembled(model, params, K):
    cfgs = ScvxConfig(tr_mode="soft")
    X, U, sigma = model.initial_guess(params, K)
    disc = discretize(model, params, X, U, sigma, substeps=6)
    return socp.assemble(
        model, cfgs, params, disc, X, U, sigma,
        jnp.asarray(2.0, F64), free_final_time=True,
    )


@pytest.mark.parametrize("which", ["pm3", "rk6"])
def test_admm_matches_both_ipms(which):
    if which == "pm3":
        model, params, K = pm.pointmass3dof_model(), pm.default_params(dtype=F64), 8
    else:
        model, params, K = rk.rocket6dof_model(), rk.default_params(dtype=F64), 7
    d = _assembled(model, params, K)
    c, A, b, G, h, cones, P = dense_ref.materialize(d)
    c, A, b, G, h = map(np.asarray, (c, A, b, G, h))
    P = np.ascontiguousarray(np.asarray(P))

    res_ipm = dense_socp.solve(c, A, b, G, h, cones, P=P, tol=1e-10)
    assert res_ipm.converged

    res_admm = admm_socp.solve(c, A, b, G, h, cones, P=P, tol=1e-8,
                               max_iters=60000)
    assert res_admm.converged, (res_admm.iters, res_admm.pres, res_admm.dres)

    def obj(x):
        return float(c @ x + 0.5 * x @ (P @ x))

    scale = max(1.0, abs(obj(res_ipm.x)))
    assert abs(obj(res_admm.x) - obj(res_ipm.x)) / scale < 1e-5

    st = ipm.ipm_solve(d, IPMConfig(max_iters=40, tol_gap=1e-8, tol_feas=1e-8,
                                    refine_steps=3))
    x_struct = dense_ref.flatten_primal(jax.tree.map(np.asarray, st.x))
    assert abs(obj(x_struct) - obj(res_admm.x)) / scale < 1e-5

    # soft-TR subproblems are strictly convex in (dx, du, dsig): the primal
    # agrees elementwise across all three families
    np.testing.assert_allclose(res_admm.x[: len(x_struct)], res_ipm.x,
                               atol=5e-4)


def test_admm_random_socp_known_solution():
    """Constructed primal-dual optimal pair: ADMM must recover it."""
    rng = np.random.default_rng(0)
    n, m = 12, 15
    cones = [("lin", 5), ("soc", 5), ("soc", 5)]
    G = rng.normal(size=(m, n))
    # interior optimal slack/dual pair per cone
    s = np.concatenate([np.abs(rng.normal(size=5)) + 0.5,
                        [3.0], rng.normal(size=4) * 0.3,
                        [2.5], rng.normal(size=4) * 0.3])
    z = np.concatenate([np.abs(rng.normal(size=5)) + 0.5,
                        [2.0], rng.normal(size=4) * 0.2,
                        [1.5], rng.normal(size=4) * 0.2])
    # complementarity: make each SOC pair strictly complementary by aligning
    # boundary cases away — interior x interior has s'z > 0; to get an OPTIMAL
    # pair instead construct from KKT: pick x*, set h = Gx* + s, c = -G'z
    x_star = rng.normal(size=n)
    h = G @ x_star + s
    c = -G.T @ z
    A = np.zeros((0, n))
    b = np.zeros(0)
    # (x*, z) satisfy stationarity and feasibility but NOT complementarity;
    # the true optimum may differ — so compare against the IPM oracle instead
    res_ipm = dense_socp.solve(c, A, b, G, h, cones, tol=1e-10)
    assert res_ipm.converged
    res = admm_socp.solve(c, A, b, G, h, cones, tol=1e-9, max_iters=60000)
    assert res.converged
    assert abs(float(c @ res.x) - float(c @ res_ipm.x)) / max(
        1.0, abs(float(c @ res_ipm.x))
    ) < 1e-6
