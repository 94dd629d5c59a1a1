"""Pallas kernel tests in interpret mode (CI-able on CPU; SURVEY §5 sanitizers).

Every kernel in ops/pallas_kkt.py is checked against the XLA smallla
implementation of the same contract, and the full in-graph IPM is run with
``use_pallas=True`` vs the default path on a real assembled 6-DoF subproblem.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import dense_ref  # noqa: F401  (sys.path fixture side effect)
from successiveconvexification_tpu.config import IPMConfig, ScvxConfig
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import ipm, pallas_kkt, smallla, socp
from successiveconvexification_tpu.ops.discretize import discretize

F64 = jnp.float64


def _spd(rng, N, n):
    A = rng.normal(size=(N, n, n))
    return A @ np.swapaxes(A, 1, 2) + 5 * np.eye(n)


def test_fused_chol_solve_matches_dense(rng):
    N, n, m = 300, 13, 2
    A = _spd(rng, N, n)
    B = rng.normal(size=(N, n, m))
    X = pallas_kkt.fused_chol_solve(
        jnp.asarray(A), jnp.asarray(B), interpret=True
    )
    ref = np.linalg.solve(A, B)
    np.testing.assert_allclose(np.asarray(X), ref, rtol=1e-8, atol=1e-9)


def test_chol_matches_smallla(rng):
    N, n = 150, 17
    A = jnp.asarray(_spd(rng, N, n))
    L = pallas_kkt.chol(A)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(smallla.chol(A)), rtol=1e-10, atol=1e-12
    )


def test_chol_vmap_folds_batch(rng):
    """Under vmap the (B, N, n, n) batch folds into the kernel lane tile."""
    B, N, n = 3, 20, 9
    A = jnp.asarray(_spd(rng, B * N, n)).reshape(B, N, n, n)
    L = jax.vmap(pallas_kkt.chol)(A)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(jax.vmap(smallla.chol)(A)),
        rtol=1e-10, atol=1e-12,
    )


def test_cho_solve_matrix_and_vector(rng):
    N, n, m = 90, 14, 14
    A = _spd(rng, N, n)
    L = pallas_kkt.chol(jnp.asarray(A))
    Bm = rng.normal(size=(N, n, m))
    bv = rng.normal(size=(N, n))
    np.testing.assert_allclose(
        np.asarray(pallas_kkt.cho_solve(L, jnp.asarray(Bm))),
        np.linalg.solve(A, Bm), rtol=1e-8, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(pallas_kkt.cho_solve_vec(L, jnp.asarray(bv))),
        np.linalg.solve(A, bv[..., None])[..., 0], rtol=1e-8, atol=1e-9,
    )


def _random_btd(rng, B, N, nx):
    """Random well-conditioned SPD block-tridiagonal (D, O) batch."""
    D = jnp.asarray(_spd(rng, B * N, nx).reshape(B, N, nx, nx)) + \
        4.0 * nx * jnp.eye(nx)
    O = jnp.asarray(0.5 * rng.normal(size=(B, N - 1, nx, nx)))
    return D, O


def test_tridiag_kernels_match_scan(rng):
    B, N, nx = 3, 13, 7
    D, O = _random_btd(rng, B, N, nx)
    r = jnp.asarray(rng.normal(size=(B, N, nx)))

    u_pl = jax.vmap(
        lambda d, o, rr: pallas_kkt.tridiag_solve(*pallas_kkt.tridiag_factor(d, o), rr)
    )(D, O, r)
    u_ref = jax.vmap(
        lambda d, o, rr: smallla.blocktridiag_solve(
            *smallla.blocktridiag_factor(d, o), rr
        )
    )(D, O, r)
    np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_ref),
                               rtol=1e-9, atol=1e-10)


def test_tridiag_unbatched_falls_back(rng):
    """Single-scenario (unvmapped) calls route to the scan implementation."""
    D, O = _random_btd(rng, 1, 9, 5)
    r = jnp.asarray(rng.normal(size=(9, 5)))
    u = pallas_kkt.tridiag_solve(*pallas_kkt.tridiag_factor(D[0], O[0]), r)
    u_ref = smallla.blocktridiag_solve(*smallla.blocktridiag_factor(D[0], O[0]), r)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), rtol=0, atol=0)


def _assemble6(K=7):
    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    cfg = ScvxConfig(tr_mode="soft")
    X, U, sigma = model.initial_guess(params, K)
    disc = discretize(model, params, X, U, sigma, substeps=4)
    return socp.assemble(
        model, cfg, params, disc, X, U, sigma,
        jnp.asarray(2.0, F64), free_final_time=True,
    )


def test_ipm_use_pallas_matches_default():
    """The wired engine path: batched ipm_solve with use_pallas=True must
    reproduce the smallla-path solution on a real 6-DoF subproblem (soft mode:
    unique optimum, element-wise comparison well-posed)."""
    d = _assemble6()
    B = 2
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), d)
    base = IPMConfig(max_iters=30, refine_steps=2, tol_gap=1e-8, tol_feas=1e-8)
    cfg_pl = dataclasses.replace(base, use_pallas=True)

    st_ref = jax.vmap(lambda dd: ipm.ipm_solve(dd, base))(batch)
    st_pl = jax.vmap(lambda dd: ipm.ipm_solve(dd, cfg_pl))(batch)

    assert bool(jnp.all(st_pl.converged)), (
        np.asarray(st_pl.gap), np.asarray(st_pl.pres))
    np.testing.assert_allclose(
        np.asarray(st_pl.x.w), np.asarray(st_ref.x.w), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st_pl.x.sig), np.asarray(st_ref.x.sig), atol=1e-7
    )
