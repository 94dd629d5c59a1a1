"""Equivalence gates for the fused Pallas discretize kernel (ops/pallas_disc).

Runs in Pallas interpret mode on CPU (same path pallas_kkt tests use), so CI
exercises the exact kernel body that Mosaic compiles on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import discretize as D
from successiveconvexification_tpu.ops import pallas_disc as PD


def _lanes_inputs(L, dtype=jnp.float32):
    model = scvx.rocket6dof_model()
    params0 = rk.default_params(dtype=dtype)
    nx, nu = model.nx, model.nu
    plead = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a, dtype)[None],
                                   (L,) + jnp.shape(a)), params0)
    key = jax.random.PRNGKey(0)
    xk = jnp.ones((nx, L), dtype) * 0.1
    xk = xk.at[0].set(20.0)
    xk = xk.at[7].set(1.0)
    xk = xk + 0.01 * jax.random.normal(key, (nx, L), dtype)
    uk = jnp.ones((nu, L), dtype) * 40.0
    ukp1 = uk * 1.01
    sig = jnp.full((L,), 4.0, dtype)
    return model, plead, xk, uk, ukp1, sig


@pytest.mark.parametrize("L", [96, 128, 200])
def test_discretize_lanes_matches_soa(L):
    """Kernel == XLA SoA twin, incl. the lane-padding path (L not a multiple
    of the tile)."""
    model, plead, xk, uk, ukp1, sig = _lanes_inputs(L)
    A, Bm, Bp, S, z, xe = PD.discretize_lanes(
        model, plead, xk, uk, ukp1, sig, 1.0 / 49, 4, True)
    pt = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), plead)
    A2, Bm2, Bp2, S2, z2, xe2 = D._aug_rk4_soa(
        model, pt, xk, uk, ukp1, sig, 1.0 / 49, 4, True)
    for name, a, b in [("A", A, A2), ("Bm", Bm, Bm2), ("Bp", Bp, Bp2),
                       ("S", S, S2), ("z", z, z2), ("x_end", xe, xe2)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5, err_msg=name)


def test_lane_fanout_variants_agree():
    """The per-direction jacobian (kernel path) == the lane-fan-out jacobian
    (XLA path) through the full interval integration."""
    model, plead, xk, uk, ukp1, sig = _lanes_inputs(64)
    pt = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), plead)
    out_a = D._aug_rk4_soa(model, pt, xk, uk, ukp1, sig, 1.0 / 49, 4, True,
                           lane_fanout=True)
    out_b = D._aug_rk4_soa(model, pt, xk, uk, ukp1, sig, 1.0 / 49, 4, True,
                           lane_fanout=False)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_discretize_kernel_through_public_api(monkeypatch):
    """SCVX_PALLAS_DISC=1 routes batched discretize through the kernel and
    matches the default path."""
    model = scvx.rocket6dof_model()
    params = rk.default_params(dtype=jnp.float32)
    K, B = 12, 3
    X, U, sigma = rk.initial_guess(params, K)
    key = jax.random.PRNGKey(1)
    Xb = X[None] + 0.01 * jax.random.normal(key, (B,) + X.shape, X.dtype)
    Ub = jnp.broadcast_to(U, (B,) + U.shape)
    sb = jnp.broadcast_to(sigma, (B,))
    pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + jnp.shape(a)),
                      params)

    def run():
        return jax.vmap(
            lambda p, x, u, s: D.discretize(model, p, x, u, s, substeps=4)
        )(pb, Xb, Ub, sb)

    monkeypatch.setenv("SCVX_PALLAS_DISC", "0")
    ref = run()
    monkeypatch.setenv("SCVX_PALLAS_DISC", "1")
    jax.clear_caches()      # the env gate is read at trace time
    out = run()
    monkeypatch.setenv("SCVX_PALLAS_DISC", "0")
    jax.clear_caches()
    for name, a, b in zip(ref._fields, out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5, err_msg=str(name))
