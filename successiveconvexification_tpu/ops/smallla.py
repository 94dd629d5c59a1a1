"""Unrolled small-matrix linear algebra for TPU (batched 13x13 / 17x17 blocks).

``jnp.linalg.cholesky`` / ``solve_triangular`` on (B, K, n, n) batches of tiny
matrices lower to generic loops that leave the VPU idle. Here the factorizations
are UNROLLED over the static n (n <= ~24): every scalar step becomes an
elementwise op over the (B, K) batch, which XLA fuses into large VPU kernels —
the structure-of-arrays treatment of small dense algebra (the same layout a
Pallas kernel would use; this is the compiler-fused variant).

Used by ops/ipm.py for the stage-Hessian and KKT block factorizations.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _use_unrolled(unrolled: bool | None) -> bool:
    """Trace-time backend switch. Unrolled graphs are big (n^3/3 ops inlined at
    every call site), which is the right trade on TPU but slows CPU-test
    compiles badly — conftest sets SCVX_SMALL_LA=lax for the CI suite. Hot call
    sites that want the SoA path regardless pass ``unrolled=True`` explicitly."""
    if unrolled is not None:
        return unrolled
    return os.environ.get("SCVX_SMALL_LA", "unrolled") != "lax"


def chol(A: jnp.ndarray, unrolled: bool | None = None) -> jnp.ndarray:
    """Lower Cholesky of SPD (..., n, n), unrolled over n."""
    if not _use_unrolled(unrolled):
        return jnp.linalg.cholesky(A)
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = []
    zeros = jnp.zeros_like(A[..., 0, 0])
    for i in range(n):
        rows.append(jnp.stack(
            [L[i][j] if j <= i else zeros for j in range(n)], axis=-1
        ))
    return jnp.stack(rows, axis=-2)


def solve_lower(L: jnp.ndarray, b: jnp.ndarray, unrolled: bool | None = None) -> jnp.ndarray:
    """Solve L x = b with L lower-triangular (..., n, n); b (..., n) or (..., n, m)."""
    if not _use_unrolled(unrolled):
        vec = b.ndim == L.ndim - 1
        bb = b[..., None] if vec else b
        out = jax.scipy.linalg.solve_triangular(L, bb, lower=True)
        return out[..., 0] if vec else out
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    x = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k][..., None] * x[k]
        x[i] = s / L[..., i, i][..., None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def solve_upper_t(L: jnp.ndarray, b: jnp.ndarray, unrolled: bool | None = None) -> jnp.ndarray:
    """Solve L' x = b with L lower-triangular; b (..., n) or (..., n, m)."""
    if not _use_unrolled(unrolled):
        vec = b.ndim == L.ndim - 1
        bb = b[..., None] if vec else b
        out = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), bb, lower=False
        )
        return out[..., 0] if vec else out
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = b[..., i, :]
        for k in range(i + 1, n):
            s = s - L[..., k, i][..., None] * x[k]
        x[i] = s / L[..., i, i][..., None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def cho_solve(L: jnp.ndarray, b: jnp.ndarray, unrolled: bool | None = None) -> jnp.ndarray:
    """Solve (L L') x = b."""
    return solve_upper_t(L, solve_lower(L, b, unrolled), unrolled)
