import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.models.base import Model
from successiveconvexification_tpu.ops.discretize import discretize, propagate

F64 = jnp.float64


def _lti_model(F, G):
    """A model with linear time-invariant dynamics xdot = F x + G u."""
    F = jnp.asarray(F, dtype=F64)
    G = jnp.asarray(G, dtype=F64)
    nx, nu = G.shape
    return Model(
        name="lti",
        nx=nx,
        nu=nu,
        f=lambda params, x, u: F @ x + G @ u,
        stage_cones=None,
        n_lin=0,
        soc_dims=(),
        mass_index=None,
        init_pinned=tuple([True] * nx),
        term_pinned=tuple([False] * nx),
        term_u_pinned=tuple([False] * nu),
        initial_guess=None,
    )


def test_lti_state_transition_matches_expm(rng):
    nx, nu, K = 4, 2, 6
    F = rng.normal(size=(nx, nx)) * 0.5
    G = rng.normal(size=(nx, nu))
    model = _lti_model(F, G)
    X = jnp.asarray(rng.normal(size=(K, nx)))
    U = jnp.asarray(rng.normal(size=(K, nu)))
    sigma = jnp.asarray(1.7, dtype=F64)
    h = 1.0 / (K - 1)

    disc = discretize(model, None, X, U, sigma, substeps=40)
    A_exact = scipy.linalg.expm(float(sigma) * np.asarray(F) * h)
    for k in range(K - 1):
        np.testing.assert_allclose(disc.A[k], A_exact, atol=1e-10)


def test_lti_foh_input_matrices_match_quadrature(rng):
    """Bm/Bp must equal the exact FOH convolution integrals (dense quadrature)."""
    nx, nu, K = 3, 2, 4
    F = rng.normal(size=(nx, nx)) * 0.4
    G = rng.normal(size=(nx, nu))
    model = _lti_model(F, G)
    X = jnp.asarray(rng.normal(size=(K, nx)))
    U = jnp.asarray(rng.normal(size=(K, nu)))
    sigma = jnp.asarray(2.0, dtype=F64)
    h = 1.0 / (K - 1)

    disc = discretize(model, None, X, U, sigma, substeps=40)

    # exact: Bm = int_0^h expm(sF(h-t)) sG (1-t/h) dt  (sigma-scaled dynamics)
    sF = float(sigma) * np.asarray(F)
    sG = float(sigma) * np.asarray(G)
    ts = np.linspace(0.0, h, 4001)
    em = np.stack([scipy.linalg.expm(sF * (h - t)) @ sG * (1 - t / h) for t in ts])
    ep = np.stack([scipy.linalg.expm(sF * (h - t)) @ sG * (t / h) for t in ts])
    Bm_exact = np.trapezoid(em, ts, axis=0)
    Bp_exact = np.trapezoid(ep, ts, axis=0)
    np.testing.assert_allclose(disc.Bm[0], Bm_exact, atol=5e-8)
    np.testing.assert_allclose(disc.Bp[0], Bp_exact, atol=5e-8)


def test_reconstruction_matches_nonlinear_propagation():
    """A x_k + Bm u_k + Bp u_{k+1} + S sigma + z == x_prop at the reference."""
    params = rk.default_params(dtype=F64)
    model = rk.rocket6dof_model()
    X, U, sigma = rk.initial_guess(params, K=10)
    disc = discretize(model, params, X, U, sigma, substeps=25)
    recon = (
        jnp.einsum("kij,kj->ki", disc.A, X[:-1])
        + jnp.einsum("kij,kj->ki", disc.Bm, U[:-1])
        + jnp.einsum("kij,kj->ki", disc.Bp, U[1:])
        + disc.S * sigma
        + disc.z
    )
    np.testing.assert_allclose(recon, disc.x_prop, atol=5e-9)


def test_rk4_convergence_order():
    """Reconstruction error vs substeps should shrink ~O(h^4)."""
    params = rk.default_params(dtype=F64)
    model = rk.rocket6dof_model()
    X, U, sigma = rk.initial_guess(params, K=6)

    fine = propagate(model, params, X, U, sigma, substeps=200)

    def err(substeps):
        d = discretize(model, params, X, U, sigma, substeps=substeps)
        return float(jnp.max(jnp.abs(d.x_prop - fine)))

    e5, e10 = err(5), err(10)
    assert e10 < e5 / 8  # at least ~3rd order observed; RK4 nominal is 16x


def test_sigma_sensitivity_column():
    """S must be the derivative of the propagated state w.r.t. sigma."""
    params = rk.default_params(dtype=F64)
    model = rk.rocket6dof_model()
    X, U, sigma = rk.initial_guess(params, K=8)
    disc = discretize(model, params, X, U, sigma, substeps=30)
    dsig = 1e-6
    xp_plus = propagate(model, params, X, U, sigma + dsig, substeps=30)
    xp_minus = propagate(model, params, X, U, sigma - dsig, substeps=30)
    S_fd = (xp_plus - xp_minus) / (2 * dsig)
    np.testing.assert_allclose(disc.S, S_fd, atol=1e-5)


def test_linearization_accuracy_nearby_trajectory():
    """The affine map predicts perturbed nonlinear propagation to 2nd order."""
    params = rk.default_params(dtype=F64)
    model = rk.rocket6dof_model()
    X, U, sigma = rk.initial_guess(params, K=8)
    disc = discretize(model, params, X, U, sigma, substeps=30)

    eps = 1e-4
    key = jax.random.PRNGKey(0)
    dX = eps * jax.random.normal(key, X.shape, dtype=F64)
    dU = eps * jax.random.normal(jax.random.fold_in(key, 1), U.shape, dtype=F64)
    Xp, Up = X + dX, U + dU
    xp_pert = propagate(model, params, Xp, Up, sigma, substeps=30)
    recon = (
        jnp.einsum("kij,kj->ki", disc.A, Xp[:-1])
        + jnp.einsum("kij,kj->ki", disc.Bm, Up[:-1])
        + jnp.einsum("kij,kj->ki", disc.Bp, Up[1:])
        + disc.S * sigma
        + disc.z
    )
    err = float(jnp.max(jnp.abs(recon - xp_pert)))
    assert err < 50 * eps * eps  # second-order remainder


def test_discretize_jits_and_vmaps():
    params = rk.default_params(dtype=F64)
    model = rk.rocket6dof_model()
    X, U, sigma = rk.initial_guess(params, K=8)
    B = 4
    Xb = jnp.broadcast_to(X, (B,) + X.shape)
    Ub = jnp.broadcast_to(U, (B,) + U.shape)
    sb = jnp.broadcast_to(sigma, (B,))
    fn = jax.jit(jax.vmap(lambda x, u, s: discretize(model, params, x, u, s, substeps=10)))
    out = fn(Xb, Ub, sb)
    assert out.A.shape == (B, 7, 14, 14)
    assert bool(jnp.all(jnp.isfinite(out.A)))
