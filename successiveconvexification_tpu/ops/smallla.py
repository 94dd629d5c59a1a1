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


# ---------------------------------------------------------------------------
# Block-tridiagonal SPD factor / solve (sequential scan along the block axis).
# The K-axis KKT Schur system of ops/ipm.py; the Pallas VMEM-resident variant
# (ops/pallas_kkt.py) implements the same contract with lanes = batch.
# ---------------------------------------------------------------------------
def blocktridiag_factor(D: jnp.ndarray, O: jnp.ndarray):
    """Block-tridiagonal Cholesky: returns per-block lower factors L_k and the
    forward couplings C_k = L_{k-1}^{-1} O_{k-1} (C_0 = 0).

    M = [D_0 O_0; O_0' D_1 O_1; ...];  S_k = D_k - C_k' C_k;  L_k = chol(S_k).
    Sequential scan along K (SURVEY §2.3 P4 notes the cyclic-reduction alternative).
    """
    n = D.shape[0]
    nx = D.shape[-1]
    dtype = D.dtype
    O_pad = jnp.concatenate([jnp.zeros((1, nx, nx), dtype), O], axis=0)  # O_pad[k]=O_{k-1}

    def step(L_prev, inputs):
        D_k, O_km1 = inputs
        Ck = solve_lower(L_prev, O_km1)
        S = D_k - Ck.T @ Ck
        Lk = chol(S)
        return Lk, (Lk, Ck)

    # first block has no coupling: seed with identity and zero O
    L0 = chol(D[0])
    if n == 1:
        return L0[None], jnp.zeros((1, nx, nx), dtype)
    Llast, (Ls, Cs) = jax.lax.scan(step, L0, (D[1:], O_pad[1:]))
    chol_D = jnp.concatenate([L0[None], Ls], axis=0)
    Coff = jnp.concatenate([jnp.zeros((1, nx, nx), dtype), Cs], axis=0)
    return chol_D, Coff


def blocktridiag_solve(chol_D, Coff, rhs):
    """Solve M u = rhs given the block factorization; rhs (K-1, nx) or (K-1, nx, m)."""
    vec = rhs.ndim == 2
    if vec:
        rhs = rhs[..., None]

    # forward: v_k = L_k^-1 (r_k - C_k' v_{k-1})
    def fwd(v_prev, inputs):
        L_k, C_k, r_k = inputs
        v_k = solve_lower(L_k, r_k - C_k.T @ v_prev)
        return v_k, v_k

    v0 = jnp.zeros_like(rhs[0])
    _, V = jax.lax.scan(fwd, v0, (chol_D, Coff, rhs))

    # backward: u_k = L_k^-T (v_k - C_{k+1} u_{k+1})
    def bwd(u_next, inputs):
        L_k, C_kp1, v_k = inputs
        u_k = solve_upper_t(L_k, v_k - C_kp1 @ u_next)
        return u_k, u_k

    nplus = jnp.zeros_like(rhs[0])
    C_shift = jnp.concatenate([Coff[1:], jnp.zeros_like(Coff[:1])], axis=0)
    _, U = jax.lax.scan(bwd, nplus, (chol_D, C_shift, V), reverse=True)
    return U[..., 0] if vec else U
