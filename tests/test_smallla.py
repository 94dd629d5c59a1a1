"""Unrolled small-matrix algebra vs numpy (the TPU-prod path, explicitly)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def unrolled_env(monkeypatch):
    monkeypatch.setenv("SCVX_SMALL_LA", "unrolled")


def test_chol_and_solves_match_numpy(rng, unrolled_env):
    from successiveconvexification_tpu.ops import smallla

    N, n, m = 40, 13, 4
    A = rng.normal(size=(N, n, n))
    A = A @ np.swapaxes(A, 1, 2) + 4 * np.eye(n)
    L = smallla.chol(jnp.asarray(A))
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(A), rtol=1e-9, atol=1e-10
    )
    b = rng.normal(size=(N, n))
    Bm = rng.normal(size=(N, n, m))
    x = smallla.cho_solve(L, jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(A, b[..., None])[..., 0], atol=1e-9
    )
    X = smallla.cho_solve(L, jnp.asarray(Bm))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(A, Bm), atol=1e-9)


def test_lax_backend_matches_unrolled(rng, monkeypatch):
    from successiveconvexification_tpu.ops import smallla

    N, n = 10, 7
    A = rng.normal(size=(N, n, n))
    A = A @ np.swapaxes(A, 1, 2) + 3 * np.eye(n)
    b = rng.normal(size=(N, n))
    monkeypatch.setenv("SCVX_SMALL_LA", "unrolled")
    x1 = np.asarray(smallla.cho_solve(smallla.chol(jnp.asarray(A)), jnp.asarray(b)))
    monkeypatch.setenv("SCVX_SMALL_LA", "lax")
    x2 = np.asarray(smallla.cho_solve(smallla.chol(jnp.asarray(A)), jnp.asarray(b)))
    np.testing.assert_allclose(x1, x2, atol=1e-10)
