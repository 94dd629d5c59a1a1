"""Pallas kernel tests in interpret mode (CI-able on CPU; SURVEY §5 sanitizers)."""

import jax
import jax.numpy as jnp
import numpy as np

from successiveconvexification_tpu.ops.pallas_kkt import fused_chol_solve


def test_fused_chol_solve_matches_dense(rng):
    N, n, m = 300, 13, 2
    A = rng.normal(size=(N, n, n))
    A = A @ np.swapaxes(A, 1, 2) + 5 * np.eye(n)
    B = rng.normal(size=(N, n, m))
    X = fused_chol_solve(jnp.asarray(A), jnp.asarray(B), interpret=True)
    ref = np.linalg.solve(A, B)
    np.testing.assert_allclose(np.asarray(X), ref, rtol=1e-8, atol=1e-9)
