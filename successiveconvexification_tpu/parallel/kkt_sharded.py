"""K-sharded block-tridiagonal KKT solve (SURVEY §2.3 P3/P4, §5 long-context).

The node axis K is the "sequence length" of trajectory optimization. For very
long horizons (or a KKT-sharded multi-chip mode) the Schur system on the
dynamics multipliers — block tridiagonal, SPD — is solved with the classic
substructuring (SPIKE-style) decomposition over a device mesh axis:

  1. shard the K axis contiguously: every shard owns m = N/P blocks, the last
     of which is its SEPARATOR (the global last block is a separator with no
     right coupling — shapes stay uniform across shards);
  2. each shard Cholesky-factors its (m-1)-block INTERIOR chain locally
     (sequential scan, zero communication) and condenses it onto its
     separators — three tiny (nx, nx) Schur contributions;
  3. one `ppermute` routes the cross-edge contributions back one shard, one
     `all_gather` collects the reduced (P, nx) tridiagonal system, which every
     shard solves redundantly (P blocks — microscopic);
  4. interiors back-substitute locally against the separator values.

Communication: one neighbor ppermute of an (nx, nx) block + one all_gather of
(P, nx*nx*2 + nx) — independent of K. Everything else is compute-local, so
the collectives ride ICI and the method weak-scales in K (the honest analog
of ring attention / context parallelism for this workload — SURVEY P4).

The math mirrors ops/ipm._blocktridiag_factor/_solve, which is also used here
for the interior chains and the reduced system.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from successiveconvexification_tpu.ops.ipm import (
    _blocktridiag_factor,
    _blocktridiag_solve,
)


def _axis_size(axis: str) -> int:
    return jax.lax.axis_size(axis)


def _shard_body(D, O_pad, rhs, axis: str):
    """Per-shard body (under shard_map). D (m, nx, nx), O_pad (m, nx, nx) with
    O_pad[i] coupling global block i -> i+1 (zero on the global last block),
    rhs (m, nx). Returns the local solution (m, nx)."""
    m, nx = D.shape[0], D.shape[-1]
    p = jax.lax.axis_index(axis)
    nshards = _axis_size(axis)
    dtype = D.dtype

    # ---- split interior / separator --------------------------------------
    D_int, D_sep = D[: m - 1], D[m - 1]
    O_int = O_pad[: m - 2]          # couplings inside the interior chain
    a = O_pad[m - 2]                # interior last -> separator_p
    b = O_pad[m - 1]                # separator_p -> next shard's interior 0
    r_int, r_sep = rhs[: m - 1], rhs[m - 1]

    # b_prev: separator_{p-1} -> OUR interior block 0 (held by shard p-1).
    # ppermute is zero-filling for absent sources, which is exactly the
    # "no left neighbor" boundary condition for shard 0.
    perm = [(i, i + 1) for i in range(nshards - 1)]
    b_prev = jax.lax.ppermute(b, axis, perm)

    # ---- local interior factorization + the three column solves ----------
    fac = _blocktridiag_factor(D_int, O_int)
    R = _blocktridiag_solve(*fac, r_int)                       # (m-1, nx)
    col_a = jnp.zeros((m - 1, nx, nx), dtype).at[m - 2].set(a)
    Ya = _blocktridiag_solve(*fac, col_a)                      # T^-1 e_last a
    col_b = jnp.zeros((m - 1, nx, nx), dtype).at[0].set(b_prev.T)
    Zb = _blocktridiag_solve(*fac, col_b)                      # T^-1 e_0 b_prev'

    # ---- Schur contributions ---------------------------------------------
    # onto our own separator p: S_p = D_sep - a' (T^-1)_{ll} a
    S_own = D_sep - a.T @ Ya[m - 2]
    r_own = r_sep - a.T @ R[m - 2]
    # onto separator p-1 (through our interior): route back one shard
    S_back = b_prev @ Zb[0]                  # b_{p-1} (T^-1)_{00} b_{p-1}'
    C_back = b_prev @ Ya[0]                  # coupling sep_{p-1} -> sep_p
    r_back = b_prev @ R[0]
    perm_back = [(i + 1, i) for i in range(nshards - 1)]
    S_from_next = jax.lax.ppermute(S_back, axis, perm_back)
    C_from_next = jax.lax.ppermute(C_back, axis, perm_back)
    r_from_next = jax.lax.ppermute(r_back, axis, perm_back)

    S_p = S_own - S_from_next
    C_p = -C_from_next                       # C_p couples sep_p -> sep_{p+1}
    rr_p = r_own - r_from_next

    # ---- reduced (P, nx) tridiagonal system, solved redundantly ----------
    S_all = jax.lax.all_gather(S_p, axis)            # (P, nx, nx)
    C_all = jax.lax.all_gather(C_p, axis)            # (P, nx, nx)
    rr_all = jax.lax.all_gather(rr_p, axis)          # (P, nx)
    fac_red = _blocktridiag_factor(S_all, C_all[: nshards - 1])
    u_sep_all = _blocktridiag_solve(*fac_red, rr_all)          # (P, nx)

    # ---- local back-substitution ------------------------------------------
    u_sep = u_sep_all[p]
    u_prev = jnp.where(p > 0, u_sep_all[jnp.maximum(p - 1, 0)], 0.0)
    u_int = (
        R
        - jnp.einsum("kij,j->ki", Ya, u_sep)
        - jnp.einsum("kij,j->ki", Zb, u_prev)
    )
    return jnp.concatenate([u_int, u_sep[None]], axis=0)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def solve_blocktridiag_ksharded(
    D: jnp.ndarray, O: jnp.ndarray, rhs: jnp.ndarray,
    mesh: Mesh, axis: str = "kkt",
) -> jnp.ndarray:
    """Solve the SPD block-tridiagonal system M u = rhs with the K axis
    sharded over ``mesh[axis]``.

    D (N, nx, nx) diagonal blocks, O (N-1, nx, nx) upper couplings,
    rhs (N, nx). N must be divisible by the axis size with N/P >= 3
    (every shard needs a non-empty interior).
    """
    N, nx = D.shape[0], D.shape[-1]
    nshards = mesh.shape[axis]
    if N % nshards or N // nshards < 3:
        raise ValueError(
            f"K-sharded solve needs N divisible by {nshards} shards with >= 3 "
            f"blocks each; got N={N}"
        )
    O_pad = jnp.concatenate([O, jnp.zeros((1, nx, nx), D.dtype)], axis=0)

    spec = P(axis)
    body = jax.shard_map(
        functools.partial(_shard_body, axis=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return body(D, O_pad, rhs)
