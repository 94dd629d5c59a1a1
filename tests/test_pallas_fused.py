"""Equivalence gates for the fused VMEM factorization (ops/pallas_fused.py).

The fused kernel must reproduce the reference factorize path (build_H +
smallla chol/solves + block-tridiagonal factor) bitwise-to-tolerance, on real
assembled subproblems with a genuine (non-identity) NT scaling. Runs in
Pallas interpret mode on CPU (the same code path that compiles to Mosaic on
TPU), which also exercises the kernel's scratch-carry indexing.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from successiveconvexification_tpu.config import IPMConfig, ScvxConfig
from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import cones as C
from successiveconvexification_tpu.ops import ipm, socp
from successiveconvexification_tpu.ops.discretize import discretize

F64 = jnp.float64


def _problem_batch(model, params, K, B, tr_mode="hard"):
    cfg = ScvxConfig(tr_mode=tr_mode)
    X, U, sigma = model.initial_guess(params, K)
    disc = discretize(model, params, X, U, sigma, substeps=3)

    def one(shift):
        return socp.assemble(
            model, cfg, params, disc, X + 0.01 * shift, U, sigma,
            jnp.asarray(1.0, F64) * (1.0 + 0.1 * shift),
            free_final_time=True,
        )

    return jax.vmap(one)(jnp.arange(B, dtype=F64))


def _nt_scaling_batch(d):
    """A genuine (non-identity) NT scaling from perturbed interior points."""

    def one(dd, seed):
        spec = ipm._spec_of(dd)
        h = socp.cone_h(dd)
        e = C.identity(spec, h)
        key = jax.random.PRNGKey(seed)
        ks, kz = jax.random.split(key)

        def perturb(v, k):
            return ipm._push_interior(
                spec,
                {kk: v[kk] * (1.0 + 0.3 * jax.random.uniform(
                    jax.random.fold_in(k, i), v[kk].shape, F64))
                 for i, kk in enumerate(v)},
                0.3,
            )

        s = perturb(e, ks)
        z = perturb(e, kz)
        return C.nt_scaling(spec, s, z)

    B = d.c_w.shape[0]
    return jax.vmap(one)(d, jnp.arange(B, dtype=jnp.uint32))


@pytest.mark.parametrize("builder", ["pm", "rk"])
def test_fused_factor_matches_reference(builder):
    if builder == "pm":
        model = pm.pointmass3dof_model()
        params = pm.default_params(dtype=F64)
    else:
        model = rk.rocket6dof_model()
        params = rk.default_params(dtype=F64)
    d = _problem_batch(model, params, K=6, B=3)
    W = _nt_scaling_batch(d)

    cfg_ref = IPMConfig(use_pallas=False)
    cfg_fused = IPMConfig(use_pallas=True)

    f_ref = jax.vmap(lambda dd, ww: ipm.factorize(dd, ww, cfg_ref))(d, W)
    f_fus = jax.vmap(lambda dd, ww: ipm.factorize(dd, ww, cfg_fused))(d, W)

    np.testing.assert_allclose(
        np.asarray(f_fus.chol_Hw), np.asarray(f_ref.chol_Hw),
        rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(f_fus.tri[0]), np.asarray(f_ref.tri[0]),
        rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(f_fus.tri[1]), np.asarray(f_ref.tri[1]),
        rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(f_fus.sm_t), np.asarray(f_ref.sm_t),
        rtol=1e-7, atol=1e-9)

    # end-to-end: one structured KKT solve with each factorization agrees
    def solve_with(f, cfg):
        def one(dd, ff, ww):
            bz = socp.cone_h(dd)
            return ipm.solve_kkt(dd, ff, ww, socp.primal_zeros(dd),
                                 dd.b, bz, cfg)
        return jax.vmap(one)(d, f, W)

    ux_r, uy_r, _ = solve_with(f_ref, cfg_ref)
    ux_f, uy_f, _ = solve_with(f_fus, cfg_fused)
    np.testing.assert_allclose(np.asarray(ux_f.w), np.asarray(ux_r.w),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(uy_f), np.asarray(uy_r),
                               rtol=1e-7, atol=1e-9)


def test_fused_factor_unbatched_fallback():
    """The non-vmapped call path (single-scenario solves) must agree too."""
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    d = jax.tree.map(lambda a: a[0], _problem_batch(model, params, K=5, B=1))
    spec = ipm._spec_of(d)
    W = C.nt_scaling(spec, C.identity(spec, socp.cone_h(d)),
                     C.identity(spec, socp.cone_h(d)))
    f_ref = ipm.factorize(d, W, IPMConfig(use_pallas=False))
    f_fus = ipm.factorize(d, W, IPMConfig(use_pallas=True))
    np.testing.assert_allclose(np.asarray(f_fus.chol_Hw),
                               np.asarray(f_ref.chol_Hw), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f_fus.tri[0]),
                               np.asarray(f_ref.tri[0]), rtol=1e-9, atol=1e-12)
