"""K-sharded block-tridiagonal KKT solve (SURVEY §2.3 P3/P4, §5 long-context).

The node axis K is the "sequence length" of trajectory optimization. For very
long horizons (or a KKT-sharded multi-chip mode) the Schur system on the
dynamics multipliers — block tridiagonal, SPD — is solved with the classic
substructuring (SPIKE-style) decomposition over a device mesh axis:

  1. pad the block chain with decoupled identity blocks to a multiple of the
     shard count (padding rows solve to exactly 0 and cannot perturb the real
     blocks — their couplings are zero), then shard the axis contiguously:
     every shard owns m blocks, the last of which is its SEPARATOR (the global
     last block is a separator with no right coupling — shapes stay uniform);
  2. each shard Cholesky-factors its (m-1)-block INTERIOR chain locally
     (sequential scan, zero communication) and condenses it onto its
     separators — three tiny (nb, nb) Schur contributions;
  3. one `ppermute` routes the cross-edge contributions back one shard, one
     `all_gather` collects the reduced (P, nb) tridiagonal system, which every
     shard solves redundantly (P blocks — microscopic);
  4. interiors back-substitute locally against the separator values.

Communication: one neighbor ppermute of an (nb, nb) block + one all_gather of
(P, nb*nb*2 + nb) — independent of K. Everything else is compute-local, so
the collectives ride ICI and the method weak-scales in K (the honest analog
of ring attention / context parallelism for this workload — SURVEY P4).

The FACTOR / SOLVE split matches the IPM's usage (ops/ipm.py): one NT-scaling
factorization serves ~5 triangular solves per IPM iteration (Sherman-Morrison
seed, predictor, corrector, refinement), so the interior Cholesky chains and
the condensed Schur couplings are computed once per `ksharded_factor` and
reused by every `ksharded_solve`. Select with ``IPMConfig.kkt_solver =
"ksharded"`` after installing a mesh via ``set_kkt_mesh``.

The math mirrors ops/smallla.blocktridiag_factor/_solve, which is also used here
for the interior chains and the reduced system.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from successiveconvexification_tpu.ops.smallla import (
    blocktridiag_factor as _blocktridiag_factor,
    blocktridiag_solve as _blocktridiag_solve,
)

# ---------------------------------------------------------------------------
# Mesh plumbing: IPMConfig is a static hashable dataclass and cannot carry a
# Mesh, so the "ksharded" backend reads a module-level default installed by
# the caller (trace-time Python state, like the backend selection itself).
# ---------------------------------------------------------------------------
_KKT_MESH: dict = {"mesh": None, "axis": "kkt"}


def set_kkt_mesh(mesh: Optional[Mesh], axis: str = "kkt") -> None:
    """Install the mesh/axis used by ``kkt_solver="ksharded"`` (None: uninstall)."""
    _KKT_MESH["mesh"] = mesh
    _KKT_MESH["axis"] = axis


def get_kkt_mesh() -> tuple[Optional[Mesh], str]:
    return _KKT_MESH["mesh"], _KKT_MESH["axis"]


class KShardedFactors(NamedTuple):
    """Per-shard substructuring factors (leaves sharded over the kkt axis)."""

    Ls: jnp.ndarray      # (P*(m-1), nb, nb) interior block-Cholesky factors
    Cs: jnp.ndarray      # (P*(m-1), nb, nb) interior forward couplings
    Ya: jnp.ndarray      # (P*(m-1), nb, nb) T^-1 e_last a   (own-separator col)
    Zb: jnp.ndarray      # (P*(m-1), nb, nb) T^-1 e_0 b_prev' (prev-separator col)
    a: jnp.ndarray       # (P, nb, nb) interior-last -> own-separator coupling
    b_prev: jnp.ndarray  # (P, nb, nb) prev-separator -> interior-first coupling
    S: jnp.ndarray       # (P, nb, nb) reduced separator diagonal blocks
    C: jnp.ndarray       # (P, nb, nb) reduced separator couplings p -> p+1
    n_orig: int          # unpadded block count
    m: int               # blocks per shard (incl. separator)
    nshards: int         # mesh axis size AT FACTOR TIME (consistency check)


def _pad_chain(D, O, nshards: int):
    """Pad (D, O) with decoupled identity blocks to a multiple of nshards."""
    N, nb = D.shape[0], D.shape[-1]
    m = -(-N // nshards)            # ceil
    if m < 3:
        m = 3
    N_pad = m * nshards
    dtype = D.dtype
    if N_pad > N:
        eye = jnp.broadcast_to(jnp.eye(nb, dtype=dtype), (N_pad - N, nb, nb))
        D = jnp.concatenate([D, eye], axis=0)
    O_full = jnp.zeros((N_pad, nb, nb), dtype)
    O_full = O_full.at[: N - 1].set(O[: N - 1])
    return D, O_full, N_pad, m


def _factor_body(D, O_pad, axis: str):
    m, nb = D.shape[0], D.shape[-1]
    nshards = jax.lax.axis_size(axis)
    dtype = D.dtype

    D_int, D_sep = D[: m - 1], D[m - 1]
    O_int = O_pad[: m - 2]
    a = O_pad[m - 2]                # interior last -> separator_p
    b = O_pad[m - 1]                # separator_p -> next shard's interior 0

    perm = [(i, i + 1) for i in range(nshards - 1)]
    b_prev = jax.lax.ppermute(b, axis, perm)   # zero-filled for shard 0

    Ls, Cs = _blocktridiag_factor(D_int, O_int)
    col_a = jnp.zeros((m - 1, nb, nb), dtype).at[m - 2].set(a)
    Ya = _blocktridiag_solve(Ls, Cs, col_a)
    col_b = jnp.zeros((m - 1, nb, nb), dtype).at[0].set(b_prev.T)
    Zb = _blocktridiag_solve(Ls, Cs, col_b)

    # Schur contributions: own separator, and (through our interior) back onto
    # separator p-1 — routed back one shard
    S_own = D_sep - a.T @ Ya[m - 2]
    S_back = b_prev @ Zb[0]
    C_back = b_prev @ Ya[0]
    perm_back = [(i + 1, i) for i in range(nshards - 1)]
    S_from_next = jax.lax.ppermute(S_back, axis, perm_back)
    C_from_next = jax.lax.ppermute(C_back, axis, perm_back)

    S_p = S_own - S_from_next
    C_p = -C_from_next              # couples sep_p -> sep_{p+1}
    return Ls, Cs, Ya, Zb, a[None], b_prev[None], S_p[None], C_p[None]


def _solve_body(Ls, Cs, Ya, Zb, a, b_prev, S, C, rhs, axis: str):
    m, nb = rhs.shape[0], rhs.shape[-1]
    p = jax.lax.axis_index(axis)
    nshards = jax.lax.axis_size(axis)
    a, b_prev = a[0], b_prev[0]

    r_int, r_sep = rhs[: m - 1], rhs[m - 1]
    R = _blocktridiag_solve(Ls, Cs, r_int)
    r_own = r_sep - a.T @ R[m - 2]
    r_back = b_prev @ R[0]
    perm_back = [(i + 1, i) for i in range(nshards - 1)]
    r_from_next = jax.lax.ppermute(r_back, axis, perm_back)
    rr_p = r_own - r_from_next

    # reduced (P, nb) tridiagonal separator system, solved redundantly — the
    # factorization is P tiny blocks, cheaper than a second collective round
    S_all = jax.lax.all_gather(S[0], axis)
    C_all = jax.lax.all_gather(C[0], axis)
    rr_all = jax.lax.all_gather(rr_p, axis)
    fac_red = _blocktridiag_factor(S_all, C_all[: nshards - 1])
    u_sep_all = _blocktridiag_solve(*fac_red, rr_all)

    u_sep = u_sep_all[p]
    u_prev = jnp.where(p > 0, u_sep_all[jnp.maximum(p - 1, 0)], 0.0)
    u_int = (
        R
        - jnp.einsum("kij,j->ki", Ya, u_sep)
        - jnp.einsum("kij,j->ki", Zb, u_prev)
    )
    return jnp.concatenate([u_int, u_sep[None]], axis=0)


def ksharded_factor(D: jnp.ndarray, O: jnp.ndarray,
                    mesh: Optional[Mesh] = None, axis: Optional[str] = None
                    ) -> KShardedFactors:
    """Factor the SPD block-tridiagonal system with the block axis sharded.

    D (N, nb, nb) diagonal blocks, O (N-1, nb, nb) upper couplings. N is
    padded internally to a multiple of the shard count (>= 3 blocks/shard),
    so ANY N >= 2 works on any mesh — including the flagship K-1 = 49.
    """
    if mesh is None:
        mesh, axis = get_kkt_mesh()
    if axis is None:
        axis = _KKT_MESH["axis"]
    if mesh is None:
        raise ValueError("ksharded backend needs set_kkt_mesh(mesh) first")
    nshards = mesh.shape[axis]
    N = D.shape[0]
    D, O_pad, N_pad, m = _pad_chain(D, O, nshards)

    spec = P(axis)
    body = jax.shard_map(
        functools.partial(_factor_body, axis=axis),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec,) * 8,
    )
    Ls, Cs, Ya, Zb, a, b_prev, S, C = body(D, O_pad)
    return KShardedFactors(Ls=Ls, Cs=Cs, Ya=Ya, Zb=Zb, a=a, b_prev=b_prev,
                           S=S, C=C, n_orig=N, m=m, nshards=nshards)


def ksharded_solve(f: KShardedFactors, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve M u = rhs (rhs (N, nb)) against ksharded_factor's output.

    The installed mesh must be the SAME one the factors were built with —
    factors are physically sharded over that axis. Swapping the global mesh
    between factor and solve would shard_map a mismatched decomposition, so
    the factor-time shard count is carried in the factors and checked here.
    """
    mesh, axis = get_kkt_mesh()
    if mesh is None:
        raise ValueError("ksharded backend needs set_kkt_mesh(mesh) first")
    nshards = mesh.shape[axis]
    if nshards != f.nshards:
        raise ValueError(
            f"ksharded_solve: installed mesh has {nshards} shards on axis "
            f"{axis!r} but the factors were built with {f.nshards} — "
            "set_kkt_mesh must not change between factor and solve"
        )
    N, nb = rhs.shape[0], rhs.shape[-1]
    N_pad = f.m * nshards
    if N_pad > N:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((N_pad - N, nb), rhs.dtype)], axis=0
        )

    spec = P(axis)
    body = jax.shard_map(
        functools.partial(_solve_body, axis=axis),
        mesh=mesh,
        in_specs=(spec,) * 9,
        out_specs=spec,
    )
    u = body(f.Ls, f.Cs, f.Ya, f.Zb, f.a, f.b_prev, f.S, f.C, rhs)
    return u[:N]


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def solve_blocktridiag_ksharded(
    D: jnp.ndarray, O: jnp.ndarray, rhs: jnp.ndarray,
    mesh: Mesh, axis: str = "kkt",
) -> jnp.ndarray:
    """One-shot factor + solve (kept for tests / standalone use)."""
    prev = get_kkt_mesh()
    set_kkt_mesh(mesh, axis)
    try:
        f = ksharded_factor(D, O, mesh, axis)
        return ksharded_solve(f, rhs)
    finally:
        set_kkt_mesh(*prev)
