"""Pallas TPU kernels for the hot KKT block operations (SURVEY §7 M4).

The IPM's dominant cost is dense algebra on tiny (nrx x nrx / nw x nw) blocks
batched over (scenarios x K nodes). The TPU-native layout is structure-of-
arrays: the BATCH rides the (8, 128) VPU lanes while the small matrix indices
unroll inside the kernel — every Cholesky/solve scalar step becomes one fused
vector op over 1024 lanes, with zero HBM traffic between steps (everything
lives in VMEM for the duration of the kernel).

Kernels:
  - fused_chol_solve: per-tile Cholesky of SPD blocks + solve against a stack
    of right-hand sides, in one kernel (factor never leaves VMEM).

The jnp fallbacks in ops/smallla.py implement the same math; these kernels
exist to eliminate intermediate materialization and kernel-launch latency on
the real chip. Interpret mode makes them CI-testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # batch elements per grid step


def _chol_solve_kernel(a_ref, b_ref, x_ref):
    """A: (n, n, T) SPD blocks (SoA over T lanes); B: (n, m, T) rhs; X out."""
    n = a_ref.shape[1]
    m = b_ref.shape[2]
    # Cholesky, unrolled; L entries held as (T,)-vectors in registers/VMEM
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a_ref[0, j, j, :]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            s = a_ref[0, i, j, :]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv

    for c in range(m):
        # forward solve L y = b
        y = [None] * n
        for i in range(n):
            s = b_ref[0, i, c, :]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        # backward solve L' x = y
        x = [None] * n
        for i in range(n - 1, -1, -1):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s
            x[i] = x[i] / L[i][i]
        for i in range(n):
            x_ref[0, i, c, :] = x[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_chol_solve(A: jnp.ndarray, B: jnp.ndarray, interpret: bool = False):
    """Solve (A_i) X_i = B_i for batched tiny SPD blocks via one fused kernel.

    A: (N, n, n), B: (N, n, m) -> X: (N, n, m). N is padded to a multiple of
    the lane tile; n, m are small static dims (<= ~24).
    """
    N, n, _ = A.shape
    m = B.shape[-1]
    Np = ((N + TILE - 1) // TILE) * TILE
    if Np != N:
        padA = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (Np - N, n, n))
        A = jnp.concatenate([A, padA], axis=0)
        B = jnp.concatenate([B, jnp.zeros((Np - N, n, m), B.dtype)], axis=0)

    # SoA: (grid, n, n, TILE)
    At = jnp.transpose(A.reshape(Np // TILE, TILE, n, n), (0, 2, 3, 1))
    Bt = jnp.transpose(B.reshape(Np // TILE, TILE, n, m), (0, 2, 3, 1))

    out = pl.pallas_call(
        _chol_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((Np // TILE, n, m, TILE), A.dtype),
        grid=(Np // TILE,),
        in_specs=[
            pl.BlockSpec((1, n, n, TILE), lambda g: (g, 0, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, n, m, TILE), lambda g: (g, 0, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, m, TILE), lambda g: (g, 0, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(At, Bt)

    X = jnp.transpose(out, (0, 3, 1, 2)).reshape(Np, n, m)
    return X[:N]
