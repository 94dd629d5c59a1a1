"""Pallas TPU kernels for the hot KKT block operations (SURVEY §7 M4).

The IPM's dominant cost is dense algebra on tiny (nrx x nrx / nw x nw) blocks
batched over (scenarios x K nodes). The TPU-native layout is structure-of-
arrays: the BATCH rides the VPU lanes while the small matrix indices unroll
inside the kernel — every Cholesky/solve scalar step becomes one fused vector
op over the lane tile, with zero HBM traffic between steps (all intermediates
live in VMEM for the duration of the kernel). This is the VMEM-resident
replacement for the XLA-fused ops/smallla.py path, which materializes
O(n^2) intermediates per factorization through HBM and leaves the engine
latency/bandwidth bound (docs/ARCHITECTURE.md "Known performance facts").

Kernel inventory (each has an unbatched fallback and a ``jax.custom_batching``
rule that folds vmapped scenario axes into the lane tile, so ``ops/ipm.py``
code written per-scenario gets full-width kernels under ``jax.vmap``):

  - chol:            batched tiny SPD Cholesky               (B*K lanes)
  - cho_solve:       matrix-rhs solve vs a Cholesky factor   (B*K lanes)
  - cho_solve_vec:   vector-rhs solve vs a Cholesky factor   (B*K lanes)
  - tridiag_factor:  block-tridiagonal Cholesky, K sequential inside the
                     kernel grid with the running factor in VMEM scratch
                     (lanes = scenario batch)
  - tridiag_solve:   forward+backward block-tridiagonal solve, same layout
  - fused_chol_solve: standalone factor+solve in one kernel (microbenchmark
                     / test vehicle for the SoA layout)

On CPU (tests) the kernels run in interpret mode; the custom_vmap fallbacks
keep single-scenario (unvmapped) paths on the plain smallla implementations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from successiveconvexification_tpu.ops import smallla

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # batch elements per grid step


def _interpret() -> bool:
    """Run kernels interpreted off-TPU (CPU CI; also catches indexing races)."""
    return jax.default_backend() == "cpu"


# =========================================================================
# In-kernel small linear algebra on SoA lane vectors.
# Matrices are python lists-of-lists of (T,)-lane vectors; every scalar step
# of the textbook algorithm becomes one VPU op over the whole lane tile.
# =========================================================================
def _load_mat(ref, n, m):
    return [[ref[0, i, j, :] for j in range(m)] for i in range(n)]


def _chol_lists(A, n):
    """Lower Cholesky of an n x n SoA matrix (list-of-lists of lane vectors)."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L


def _fwd_col(L, b, n):
    """Solve L y = b for one rhs column (list of lane vectors)."""
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    return y


def _bwd_col(L, y, n):
    """Solve L' x = y for one rhs column."""
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


# =========================================================================
# SoA packing: (N, ...) block arrays -> (G, ..., T) lane tiles
# =========================================================================
def _pad_blocks(x: jnp.ndarray, n_to: int, identity: bool) -> jnp.ndarray:
    n = x.shape[0]
    if n_to == n:
        return x
    if identity:
        pad = jnp.broadcast_to(
            jnp.eye(x.shape[-1], dtype=x.dtype), (n_to - n,) + x.shape[1:]
        )
    else:
        pad = jnp.zeros((n_to - n,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _to_soa(x: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(Np, a, b) -> (Np//tile, a, b, tile)   [or (Np, a) -> (..., a, tile)]."""
    g = x.shape[0] // tile
    xr = x.reshape((g, tile) + x.shape[1:])
    perm = (0,) + tuple(range(2, xr.ndim)) + (1,)
    return jnp.transpose(xr, perm)


def _from_soa(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(G, a, b, T) -> (G*T, a, b)[:n]."""
    perm = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
    xr = jnp.transpose(x, perm)
    return xr.reshape((-1,) + x.shape[1:-1])[:n]


def _lane_tile(n: int) -> int:
    """Largest SoA tile (multiple of LANES, capped at TILE) covering n."""
    t = LANES
    while t < TILE and t < n:
        t *= 2
    return t


# =========================================================================
# chol: batched tiny SPD Cholesky
# =========================================================================
def _chol_kernel(a_ref, l_ref):
    n = a_ref.shape[1]
    L = _chol_lists(_load_mat(a_ref, n, n), n)
    zeros = jnp.zeros_like(a_ref[0, 0, 0, :])
    for i in range(n):
        for j in range(n):
            l_ref[0, i, j, :] = L[i][j] if j <= i else zeros


@custom_batching.custom_vmap
def chol(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of (N, n, n) SPD blocks via one SoA Pallas kernel."""
    N, n, _ = A.shape
    T = _lane_tile(N)
    Np = ((N + T - 1) // T) * T
    At = _to_soa(_pad_blocks(A, Np, identity=True), T)
    out = pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((Np // T, n, n, T), A.dtype),
        grid=(Np // T,),
        in_specs=[pl.BlockSpec((1, n, n, T), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n, T), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(At)
    return _from_soa(out, N)


@chol.def_vmap
def _chol_vmap(axis_size, in_batched, A):
    del axis_size, in_batched
    out = chol(A.reshape((-1,) + A.shape[-2:]))
    return out.reshape(A.shape), True


# =========================================================================
# cho_solve: (L L') X = B with B (N, n, m) [matrix] or (N, n) [vector]
# =========================================================================
def _cho_solve_kernel(l_ref, b_ref, x_ref):
    n = l_ref.shape[1]
    m = b_ref.shape[2]
    L = _load_mat(l_ref, n, n)
    for c in range(m):
        y = _fwd_col(L, [b_ref[0, i, c, :] for i in range(n)], n)
        x = _bwd_col(L, y, n)
        for i in range(n):
            x_ref[0, i, c, :] = x[i]


def _cho_solve_call(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    N, n, _ = L.shape
    m = B.shape[-1]
    T = _lane_tile(N)
    Np = ((N + T - 1) // T) * T
    Lt = _to_soa(_pad_blocks(L, Np, identity=True), T)
    Bt = _to_soa(_pad_blocks(B, Np, identity=False), T)
    out = pl.pallas_call(
        _cho_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((Np // T, n, m, T), B.dtype),
        grid=(Np // T,),
        in_specs=[
            pl.BlockSpec((1, n, n, T), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, m, T), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, m, T), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(Lt, Bt)
    return _from_soa(out, N)


@custom_batching.custom_vmap
def cho_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (L_i L_i') X_i = B_i for (N, n, n) factors, (N, n, m) rhs."""
    return _cho_solve_call(L, B)


@cho_solve.def_vmap
def _cho_solve_vmap(axis_size, in_batched, L, B):
    lb, bb = in_batched
    if not lb:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not bb:
        B = jnp.broadcast_to(B[None], (axis_size,) + B.shape)
    out = cho_solve(
        L.reshape((-1,) + L.shape[-2:]), B.reshape((-1,) + B.shape[-2:])
    )
    return out.reshape(B.shape), True


@custom_batching.custom_vmap
def cho_solve_vec(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L_i L_i') x_i = b_i for (N, n, n) factors, (N, n) vector rhs."""
    return _cho_solve_call(L, b[..., None])[..., 0]


@cho_solve_vec.def_vmap
def _cho_solve_vec_vmap(axis_size, in_batched, L, b):
    lb, bb = in_batched
    if not lb:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not bb:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    out = cho_solve_vec(
        L.reshape((-1,) + L.shape[-2:]), b.reshape((-1,) + b.shape[-1:])
    )
    return out.reshape(b.shape), True


# =========================================================================
# Block-tridiagonal factor / solve, lanes = scenario batch.
#
# The K axis is SEQUENTIAL inside the kernel grid: grid = (batch_tiles, N)
# iterates the block index fastest (TPU grids execute row-major, in order, on
# one core), and the running Cholesky factor is carried in a VMEM scratch
# buffer across grid steps — the scan never round-trips HBM.
# =========================================================================
def _tridiag_factor_kernel(d_ref, o_ref, l_out, c_out, Lprev):
    k = pl.program_id(1)
    nx = d_ref.shape[1]
    zeros = jnp.zeros_like(d_ref[0, 0, 0, :])

    D = _load_mat(d_ref, nx, nx)
    O = _load_mat(o_ref, nx, nx)  # O_{k-1} (zeros at k == 0)

    # C_k = L_{k-1}^{-1} O_{k-1}, column by column; C_0 = 0
    first = k == 0
    Lp = [[Lprev[i, j, :] for j in range(nx)] for i in range(nx)]
    C = [[None] * nx for _ in range(nx)]
    for c in range(nx):
        y = _fwd_col(Lp, [O[i][c] for i in range(nx)], nx)
        for i in range(nx):
            C[i][c] = jnp.where(first, zeros, y[i])

    # S = D - C' C ;  L_k = chol(S)
    S = [[None] * nx for _ in range(nx)]
    for i in range(nx):
        for j in range(i + 1):
            acc = D[i][j]
            for t in range(nx):
                acc = acc - C[t][i] * C[t][j]
            S[i][j] = acc
            S[j][i] = acc
    L = _chol_lists(S, nx)

    for i in range(nx):
        for j in range(nx):
            lv = L[i][j] if j <= i else zeros
            l_out[0, i, j, :] = lv
            Lprev[i, j, :] = lv
            c_out[0, i, j, :] = C[i][j]


def _tridiag_solve_fwd_kernel(l_ref, c_ref, r_ref, v_out, vprev):
    k = pl.program_id(1)
    nx = l_ref.shape[1]
    zeros = jnp.zeros_like(r_ref[0, 0, :])
    first = k == 0

    L = _load_mat(l_ref, nx, nx)
    C = _load_mat(c_ref, nx, nx)
    vp = [jnp.where(first, zeros, vprev[i, :]) for i in range(nx)]

    # r_k - C_k' v_{k-1}
    rhs = []
    for i in range(nx):
        s = r_ref[0, i, :]
        for t in range(nx):
            s = s - C[t][i] * vp[t]
        rhs.append(s)
    v = _fwd_col(L, rhs, nx)
    for i in range(nx):
        v_out[0, i, :] = v[i]
        vprev[i, :] = v[i]


def _tridiag_solve_bwd_kernel(l_ref, cs_ref, v_ref, u_out, unext):
    i_ = pl.program_id(1)
    nx = l_ref.shape[1]
    zeros = jnp.zeros_like(v_ref[0, 0, :])
    first = i_ == 0  # processes k = N-1 first

    L = _load_mat(l_ref, nx, nx)
    Cs = _load_mat(cs_ref, nx, nx)  # C_{k+1} (zeros at k = N-1)
    un = [jnp.where(first, zeros, unext[i, :]) for i in range(nx)]

    # v_k - C_{k+1} u_{k+1}
    rhs = []
    for i in range(nx):
        s = v_ref[0, i, :]
        for t in range(nx):
            s = s - Cs[i][t] * un[t]
        rhs.append(s)
    u = _bwd_col(L, rhs, nx)
    for i in range(nx):
        u_out[0, i, :] = u[i]
        unext[i, :] = u[i]


def _batch_tile(B: int) -> int:
    t = LANES
    while t < 512 and t < B:
        t *= 2
    return t


def _btd_pack(x: jnp.ndarray, Bp: int, T: int, identity: bool) -> jnp.ndarray:
    """(B, N, ...) -> (N, ..., Bp) -> blocks consumed as (nb, N) grid tiles."""
    B = x.shape[0]
    if Bp != B:
        if identity:
            pad = jnp.broadcast_to(
                jnp.eye(x.shape[-1], dtype=x.dtype),
                (Bp - B,) + x.shape[1:],
            )
        else:
            pad = jnp.zeros((Bp - B,) + x.shape[1:], x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    perm = tuple(range(1, x.ndim)) + (0,)
    return jnp.transpose(x, perm)


def _btd_unpack(x: jnp.ndarray, B: int) -> jnp.ndarray:
    perm = (x.ndim - 1,) + tuple(range(0, x.ndim - 1))
    return jnp.transpose(x, perm)[:B]


@custom_batching.custom_vmap
def tridiag_factor(D: jnp.ndarray, O: jnp.ndarray):
    """Unbatched fallback: the lax.scan block-tridiagonal Cholesky."""
    return smallla.blocktridiag_factor(D, O)


@tridiag_factor.def_vmap
def _tridiag_factor_vmap(axis_size, in_batched, D, O):
    assert all(in_batched), "tridiag_factor expects batched (D, O)"
    if D.ndim > 4:  # nested vmap: fold extra leading axes into the batch
        lead = D.shape[: D.ndim - 3]
        Df = D.reshape((-1,) + D.shape[-3:])
        Of = O.reshape((-1,) + O.shape[-3:])
        cD, cO = tridiag_factor(Df, Of)
        return (cD.reshape(lead + cD.shape[1:]),
                cO.reshape(lead + cO.shape[1:])), (True, True)

    B, N, nx, _ = D.shape
    dtype = D.dtype
    T = _batch_tile(B)
    Bp = ((B + T - 1) // T) * T
    # O arrives as (B, N-1, nx, nx) couplings O_k : k -> k+1; the kernel
    # consumes O_{k-1} per step, so prepend a zero block.
    O_pad = jnp.concatenate([jnp.zeros((B, 1, nx, nx), dtype), O], axis=1)
    Dt = _btd_pack(D, Bp, T, identity=True)       # (N, nx, nx, Bp)
    Ot = _btd_pack(O_pad, Bp, T, identity=False)

    grid = (Bp // T, N)
    spec = pl.BlockSpec((1, nx, nx, T), lambda b, k: (k, 0, 0, b),
                        memory_space=pltpu.VMEM)
    L, C = pl.pallas_call(
        _tridiag_factor_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, nx, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nx, nx, Bp), dtype),
        ),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        scratch_shapes=[pltpu.VMEM((nx, nx, T), dtype)],
        interpret=_interpret(),
    )(Dt, Ot)
    return (_btd_unpack(L, B), _btd_unpack(C, B)), (True, True)


@custom_batching.custom_vmap
def tridiag_solve(chol_D: jnp.ndarray, Coff: jnp.ndarray, rhs: jnp.ndarray):
    """Unbatched fallback: the lax.scan block-tridiagonal solve (vector rhs)."""
    return smallla.blocktridiag_solve(chol_D, Coff, rhs)


@tridiag_solve.def_vmap
def _tridiag_solve_vmap(axis_size, in_batched, chol_D, Coff, rhs):
    assert all(in_batched), "tridiag_solve expects batched operands"
    if chol_D.ndim > 4:
        lead = chol_D.shape[: chol_D.ndim - 3]
        out = tridiag_solve(
            chol_D.reshape((-1,) + chol_D.shape[-3:]),
            Coff.reshape((-1,) + Coff.shape[-3:]),
            rhs.reshape((-1,) + rhs.shape[-2:]),
        )
        return out.reshape(lead + out.shape[1:]), True

    B, N, nx, _ = chol_D.shape
    dtype = rhs.dtype
    T = _batch_tile(B)
    Bp = ((B + T - 1) // T) * T

    Lt = _btd_pack(chol_D, Bp, T, identity=True)   # (N, nx, nx, Bp)
    Ct = _btd_pack(Coff, Bp, T, identity=False)
    Rt = _btd_pack(rhs, Bp, T, identity=False)     # (N, nx, Bp)

    grid = (Bp // T, N)
    mspec = pl.BlockSpec((1, nx, nx, T), lambda b, k: (k, 0, 0, b),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, nx, T), lambda b, k: (k, 0, b),
                         memory_space=pltpu.VMEM)
    V = pl.pallas_call(
        _tridiag_solve_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((N, nx, Bp), dtype),
        grid=grid,
        in_specs=[mspec, mspec, vspec],
        out_specs=vspec,
        scratch_shapes=[pltpu.VMEM((nx, T), dtype)],
        interpret=_interpret(),
    )(Lt, Ct, Rt)

    # backward sweep visits k = N-1 ... 0 via reversed index maps
    Cs = jnp.concatenate([Coff[:, 1:], jnp.zeros((B, 1, nx, nx), dtype)],
                         axis=1)                   # C_{k+1}
    Cst = _btd_pack(Cs, Bp, T, identity=False)
    rspec_m = pl.BlockSpec((1, nx, nx, T), lambda b, i: (N - 1 - i, 0, 0, b),
                           memory_space=pltpu.VMEM)
    rspec_v = pl.BlockSpec((1, nx, T), lambda b, i: (N - 1 - i, 0, b),
                           memory_space=pltpu.VMEM)
    U = pl.pallas_call(
        _tridiag_solve_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((N, nx, Bp), dtype),
        grid=grid,
        in_specs=[rspec_m, rspec_m, rspec_v],
        out_specs=rspec_v,
        scratch_shapes=[pltpu.VMEM((nx, T), dtype)],
        interpret=_interpret(),
    )(Lt, Cst, V)
    return _btd_unpack(U, B), True


# =========================================================================
# Standalone fused factor+solve (microbenchmark / layout test vehicle)
# =========================================================================
def _fused_chol_solve_kernel(a_ref, b_ref, x_ref):
    """A: (n, n, T) SPD blocks (SoA over T lanes); B: (n, m, T) rhs; X out."""
    n = a_ref.shape[1]
    m = b_ref.shape[2]
    L = _chol_lists(_load_mat(a_ref, n, n), n)
    for c in range(m):
        y = _fwd_col(L, [b_ref[0, i, c, :] for i in range(n)], n)
        x = _bwd_col(L, y, n)
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
    A = _pad_blocks(A, Np, identity=True)
    B = _pad_blocks(B, Np, identity=False)

    At = _to_soa(A, TILE)
    Bt = _to_soa(B, TILE)

    out = pl.pallas_call(
        _fused_chol_solve_kernel,
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

    X = _from_soa(out, N)
    return X
