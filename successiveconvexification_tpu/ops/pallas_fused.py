"""Fused VMEM-resident KKT factorization (VERDICT r2 item 2 — the mega-kernel).

Measured on v5e (examples/ipm_profile.py, B=256 K=50): build_H alone costs
35.9 ms of the 36.1 ms factorize — the Pallas block kernels of ops/pallas_kkt
are nearly free, and the bound is XLA's lowering of the tiny-dimension
``G' W^-2 G`` einsums (0.33 GFLOP executing at ~9 GFLOP/s through padded
(…, rows, 17) layouts). This module fuses the ENTIRE factorization into one
Pallas kernel over a (batch-tile, node) grid:

    per node k (all in VMEM, SoA over the batch-lane tile):
      H_k   = sum_r wrow_r g_r g_r' + sum_cones uc (G'v)(G'v)' + diag(hdiag)
      L^H_k = chol(H_k)                                  -> output
      XE_k  = H_k^-1 E_k',   XF_{k-1} = H_k^-1 F_{k-1}'
      D_{k-1} = E_{k-1} XE_{k-1} + F_{k-1} XF_{k-1} + diag(dpq_{k-1})
      O_{k-1} = F_{k-1} XE_k
      block-tridiagonal Cholesky step for block k-1     -> outputs L, C

so H, XE, XF, D, O never exist in HBM, and every arithmetic step is one VPU
op over the lane tile. The per-row H weights (wrow/uv/ucoef) linearize the
cone structure of ops/ipm.build_H: lin rows contribute d_r g_r g_r'; each SOC
contributes coef*(2uu' - G'JG) = sum_i (-coef*jdiag_i) g_i g_i' +
(2 coef) u u' with u = G'v (cones.winv2_terms data).

Used by ops/ipm.factorize when ``IPMConfig.use_pallas`` is set (falls back to
the unfused path for models with rank-one quadratic rows). The unbatched
(non-vmapped) call path uses the reference smallla composition; the
custom_vmap rule routes batched calls into the kernel, folding the scenario
axis into the lane tile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from successiveconvexification_tpu.ops import smallla
from successiveconvexification_tpu.ops.pallas_kkt import (
    _bwd_col,
    _chol_lists,
    _fwd_col,
    _interpret,
)


def _batch_tile(B: int) -> int:
    t = 128
    while t < 256 and t < B:
        t *= 2
    return t


def _pack(x: jnp.ndarray, Bp: int) -> jnp.ndarray:
    """(B, ...) -> (..., Bp): batch-last SoA with zero padding."""
    B = x.shape[0]
    if Bp != B:
        pad = jnp.zeros((Bp - B,) + x.shape[1:], x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    return jnp.moveaxis(x, 0, -1)


def _unpack(x: jnp.ndarray, B: int) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, 0)[:B]


def _fused_factor_kernel(soc_ranges):
    """Build the kernel body for a static list of SOC row ranges."""

    def kernel(g_ref, wrow_ref, uv_ref, uc_ref, hd_ref, e_ref, f_ref,
               dpq_ref, chol_out, l_out, c_out,
               xe_s, eprev_s, o_s, lprev_s):
        j = pl.program_id(1)
        K = pl.num_programs(1)
        R = g_ref.shape[1]
        nw = g_ref.shape[2]
        nrx = e_ref.shape[1]
        zeros = jnp.zeros_like(g_ref[0, 0, 0, :])
        first = j == 0
        last = j == K - 1

        # ---- load G rows and weights (lane vectors) ----------------------
        g = [[g_ref[0, r, a, :] for a in range(nw)] for r in range(R)]
        wrow = [wrow_ref[0, r, :] for r in range(R)]
        uv = [uv_ref[0, r, :] for r in range(R)]

        # ---- H = sum_r wrow_r g_r g_r' + sum_s uc_s u u' + diag(hd) ------
        H = [[zeros for _ in range(nw)] for _ in range(nw)]
        for a in range(nw):
            for b in range(a + 1):
                acc = zeros
                for r in range(R):
                    acc = acc + wrow[r] * g[r][a] * g[r][b]
                H[a][b] = acc
        for s, (o, dend) in enumerate(soc_ranges):
            uc = uc_ref[0, s, :]
            u = [zeros for _ in range(nw)]
            for a in range(nw):
                acc = zeros
                for r in range(o, dend):
                    acc = acc + uv[r] * g[r][a]
                u[a] = acc
            for a in range(nw):
                for b in range(a + 1):
                    H[a][b] = H[a][b] + uc * u[a] * u[b]
        for a in range(nw):
            H[a][a] = H[a][a] + hd_ref[0, a, :]
            for b in range(a):
                H[b][a] = H[a][b]

        LH = _chol_lists(H, nw)
        for a in range(nw):
            for b in range(nw):
                chol_out[0, a, b, :] = LH[a][b] if b <= a else zeros

        # ---- XE_j = H^-1 E_j' (columns = rows of E_j); invalid at j=K-1 ---
        E = [[e_ref[0, r, a, :] for a in range(nw)] for r in range(nrx)]
        XE = [[None] * nrx for _ in range(nw)]
        for c in range(nrx):
            y = _fwd_col(LH, [E[c][a] for a in range(nw)], nw)
            x = _bwd_col(LH, y, nw)
            for a in range(nw):
                XE[a][c] = x[a]

        # ---- block k-1 work (valid when j >= 1) ---------------------------
        F = [[f_ref[0, r, a, :] for a in range(nw)] for r in range(nrx)]
        XF = [[None] * nrx for _ in range(nw)]
        for c in range(nrx):
            y = _fwd_col(LH, [F[c][a] for a in range(nw)], nw)
            x = _bwd_col(LH, y, nw)
            for a in range(nw):
                XF[a][c] = x[a]

        # D_{j-1} = Eprev XEprev + F XF + diag(dpq)
        D = [[None] * nrx for _ in range(nrx)]
        for a in range(nrx):
            for b in range(nrx):
                acc = zeros
                for w in range(nw):
                    acc = (acc + eprev_s[a, w, :] * xe_s[w, b, :]
                           + F[a][w] * XF[w][b])
                D[a][b] = acc
        for a in range(nrx):
            D[a][a] = D[a][a] + dpq_ref[0, a, :]

        # O_{j-1} = F_{j-1} XE_j (garbage at j = K-1; never consumed)
        Onew = [[None] * nrx for _ in range(nrx)]
        for a in range(nrx):
            for b in range(nrx):
                acc = zeros
                for w in range(nw):
                    acc = acc + F[a][w] * XE[w][b]
                Onew[a][b] = acc

        # tridiagonal Cholesky step for block i = j-1:
        #   C_i = Lprev^-1 O_{i-1} (0 at i=0); S = D - C'C; L_i = chol(S)
        iszero = first | (j == 1)   # C_0 = 0 (at j==1 block 0 has no coupling)
        Lp = [[lprev_s[a, b, :] for b in range(nrx)] for a in range(nrx)]
        C = [[None] * nrx for _ in range(nrx)]
        for c in range(nrx):
            y = _fwd_col(Lp, [o_s[a, c, :] for a in range(nrx)], nrx)
            for a in range(nrx):
                C[a][c] = jnp.where(iszero, zeros, y[a])
        S = [[None] * nrx for _ in range(nrx)]
        for a in range(nrx):
            for b in range(a + 1):
                acc = D[a][b]
                for t in range(nrx):
                    acc = acc - C[t][a] * C[t][b]
                S[a][b] = acc
                S[b][a] = acc
        LT = _chol_lists(S, nrx)
        for a in range(nrx):
            for b in range(nrx):
                l_out[0, a, b, :] = LT[a][b] if b <= a else zeros
                c_out[0, a, b, :] = C[a][b]

        # ---- scratch carries for the next step ----------------------------
        # step j+1 needs: Lprev = L_{j-1} (just factored; identity-seeded at
        # j=0 so the guarded C-solve never divides by zero), Oprev = O_{j-1},
        # Eprev = E_j, XEprev = XE_j.
        del last
        for a in range(nrx):
            for b in range(nrx):
                lv = LT[a][b] if b <= a else zeros
                seed = zeros + 1.0 if a == b else zeros
                lprev_s[a, b, :] = jnp.where(first, seed, lv)
                o_s[a, b, :] = Onew[a][b]
        for a in range(nrx):
            for w in range(nw):
                eprev_s[a, w, :] = E[a][w]
        for w in range(nw):
            for c in range(nrx):
                xe_s[w, c, :] = XE[w][c]

    return kernel


def _fused_factor_batched(G_cat, wrow, uv, ucoef, hdiag, E, F, dpq,
                          soc_ranges: Tuple[Tuple[int, int], ...]):
    """Batched SoA invocation. All inputs (B, K[-1], ...) standard layout."""
    B, K, R, nw = G_cat.shape
    nrx = E.shape[2]
    dtype = G_cat.dtype
    T = _batch_tile(B)
    Bp = ((B + T - 1) // T) * T

    # E/F/dpq are (B, K-1, ...): the kernel reads E at index min(j, K-2) and
    # F/dpq at max(j-1, 0); pad them to K rows so index maps stay in range.
    def padk(x):
        return jnp.concatenate([x, x[:, -1:]], axis=1)

    Gp = _pack(G_cat, Bp)          # (K, R, nw, Bp)
    Wp = _pack(wrow, Bp)           # (K, R, Bp)
    Up = _pack(uv, Bp)
    Cp = _pack(ucoef, Bp)          # (K, S, Bp)
    Hp = _pack(hdiag, Bp)          # (K, nw, Bp)
    Ep = _pack(padk(E), Bp)        # (K, nrx, nw, Bp)
    Fp = _pack(padk(F), Bp)
    Dp = _pack(padk(dpq), Bp)      # (K, nrx, Bp)

    S = ucoef.shape[-1]
    grid = (Bp // T, K)

    def at_j(b, j):
        return (j, 0, 0, b)

    def at_j3(b, j):
        return (j, 0, b)

    def at_em(b, j):  # E at min(j, K-2)
        return (jnp.minimum(j, K - 2), 0, 0, b)

    def at_fm(b, j):  # F/dpq at max(j-1, 0)
        return (jnp.maximum(j - 1, 0), 0, 0, b)

    def at_fm3(b, j):
        return (jnp.maximum(j - 1, 0), 0, b)

    kern = _fused_factor_kernel(soc_ranges)
    chol_Hw, L, C = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((K, nw, nw, Bp), dtype),
            jax.ShapeDtypeStruct((K, nrx, nrx, Bp), dtype),
            jax.ShapeDtypeStruct((K, nrx, nrx, Bp), dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, nw, T), at_j, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, T), at_j3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, T), at_j3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, T), at_j3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nw, T), at_j3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrx, nw, T), at_em, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrx, nw, T), at_fm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrx, T), at_fm3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nw, nw, T), at_j, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrx, nrx, T), at_fm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrx, nrx, T), at_fm, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nw, nrx, T), dtype),    # XE carry
            pltpu.VMEM((nrx, nw, T), dtype),    # E carry
            pltpu.VMEM((nrx, nrx, T), dtype),   # O carry
            pltpu.VMEM((nrx, nrx, T), dtype),   # Lprev carry
        ],
        interpret=_interpret(),
    )(Gp, Wp, Up, Cp, Hp, Ep, Fp, Dp)
    # outputs: chol (K rows); L/C rows 0..K-2 valid (row written at steps
    # j-1 -> index max(j-1,0): final value at each row i comes from step i+1)
    return (_unpack(chol_Hw, B),
            _unpack(L, B)[:, : K - 1],
            _unpack(C, B)[:, : K - 1])


def _reference_factor(G_cat, wrow, uv, ucoef, hdiag, E, F, dpq, soc_ranges):
    """Unfused reference composition (unbatched fallback + CPU equivalence)."""
    # H via the same row-weight linearization
    H = jnp.einsum("kr,kra,krb->kab", wrow, G_cat, G_cat)
    for s, (o, e) in enumerate(soc_ranges):
        u = jnp.einsum("kr,kra->ka", uv[:, o:e], G_cat[:, o:e])
        H = H + ucoef[:, s][:, None, None] * u[:, :, None] * u[:, None, :]
    H = H + jax.vmap(jnp.diag)(hdiag)
    chol_Hw = smallla.chol(H, unrolled=True)
    XE = smallla.cho_solve(chol_Hw[:-1], jnp.swapaxes(E, 1, 2), unrolled=True)
    XF = smallla.cho_solve(chol_Hw[1:], jnp.swapaxes(F, 1, 2), unrolled=True)
    D = (jnp.einsum("kiw,kwj->kij", E, XE)
         + jnp.einsum("kiw,kwj->kij", F, XF)
         + jax.vmap(jnp.diag)(dpq))
    O = jnp.einsum("kiw,kwj->kij", F[:-1], XE[1:])
    L, C = smallla.blocktridiag_factor(D, O)
    return chol_Hw, L, C


@functools.partial(custom_batching.custom_vmap)
def fused_factor(G_cat, wrow, uv, ucoef, hdiag, E, F, dpq):
    """chol_Hw, tri-L, tri-C from the linearized H-row data (see module doc).

    soc_ranges are reconstructed statically from a global registry set by the
    caller (ipm.factorize) — custom_vmap functions cannot take static args.
    """
    return _reference_factor(G_cat, wrow, uv, ucoef, hdiag, E, F, dpq,
                             _SOC_RANGES[0])


@fused_factor.def_vmap
def _fused_factor_vmap(axis_size, in_batched, *args):
    # identity-W cold-init paths produce batch-INDEPENDENT row weights
    # (wrow/uv/ucoef constant across lanes): broadcast those to the batch
    args = tuple(
        a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    )
    G_cat = args[0]
    if G_cat.ndim > 4:   # nested vmap: fold leading axes
        lead = G_cat.shape[: G_cat.ndim - 3]
        flat = [a.reshape((-1,) + a.shape[len(lead):]) for a in args]
        outs = fused_factor(*flat)
        return tuple(o.reshape(lead + o.shape[1:]) for o in outs), (True,) * 3
    outs = _fused_factor_batched(*args, soc_ranges=_SOC_RANGES[0])
    return outs, (True, True, True)


# static side-channel for the cone row ranges (set before tracing; part of
# the jit cache key via the caller's static config/model arguments)
_SOC_RANGES = [()]


def set_soc_ranges(ranges: Tuple[Tuple[int, int], ...]) -> None:
    _SOC_RANGES[0] = tuple(ranges)
