"""Pallas kernel for the RK4 multiple-shooting linearization (discretize).

Runs the WHOLE interval integration per lane tile inside VMEM: one grid
step = one (B x interval) lane tile, the full substep loop, zero HBM
traffic between stages. The kernel body calls the same ``_aug_rk4_soa``
CONTRACT-form code as the XLA path (dynamics and Jacobians trace through
``jax.vmap(model.f, in_axes=-1)`` / per-direction jvp into Mosaic vector
ops), so it stays model-generic with no hand-written derivatives.

STATUS (measured v5e, 2026-08-19): opt-in via ``SCVX_PALLAS_DISC=1``,
NOT default. The kernel compiles, runs, and matches the XLA SoA twin to
9e-8 at L=12544 — but executes at 151 ms vs 55 ms for XLA's own fusion of
the identical CONTRACT graph: the (a, 1, T) broadcast-contract codegen is
VPU-inefficient at the 128-lane tile this body is pinned to. The rewrite
this kernel forced (leading-axis contraction algebra) is what took the
XLA discretize stage from 104.7 to 55.4 ms, so the fast path today is XLA.

Mosaic viability findings (each was a distinct compile abort on v5e,
reproduced and fixed in round 4 — kept here as the checklist for any
future kernel over small-matrix SoA algebra):
  - mixed int+newaxis indexing (``a[:, j, None, :]``) emits rank-3
    gathers: "Only 2D gather is supported". Use expand_dims + leading
    index only.
  - size-1 SUBLANE slices at nonzero offset
    (``lax.slice_in_dim(a, j, j+1, axis=1)``) abort layout checks
    ("offsets_[0] < tiling_[0]"). Keep every contracted index LEADING.
  - lane-axis concat fan-out (``jnp.concatenate([x]*17, -1)`` + slice
    back) aborts the same check even without jvp. Use one jvp per
    tangent direction instead.
  - full rank-3 stores (``o_ref[:, :, :] = A``) abort
    ("limits[i] <= dim(i)"). Store row-by-row via leading index.
  - lane tiles must be EXACTLY 128 here: multiples like 256 re-trigger
    the layout aborts through the broadcast-contract intermediates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from successiveconvexification_tpu.ops.pallas_kkt import _interpret

# EXACTLY one vreg of lanes: measured on v5e, the kernel body lowers clean
# at T=128 but Mosaic aborts ("limits[i] <= dim(i)") at T=256 — the (a,1,T)
# broadcast-contract intermediates only relayout correctly within a single
# lane vreg. More grid steps are cheap (the body is compute-dense).
LANE_TILE = 128


def _pack_params(params, L):
    """Per-lane params pytree (leaves (L, ...) batched) -> (P, L) array plus
    the static (treedef, shapes) needed to unpack inside the kernel."""
    leaves, treedef = jax.tree.flatten(params)
    shapes = tuple(tuple(leaf.shape[1:]) for leaf in leaves)
    cols = [leaf.reshape(leaf.shape[0], -1) for leaf in leaves]
    packed = jnp.concatenate(cols, axis=1)        # (L, P)
    return packed.T, treedef, shapes              # (P, L)


def _unpack_params(p_mat, treedef, shapes):
    """(P, T) -> params pytree with trailing-lane leaves ((..., T))."""
    leaves = []
    off = 0
    for shp in shapes:
        n = 1
        for s in shp:
            n *= s
        block = p_mat[off:off + n]                # (n, T)
        leaves.append(block.reshape(shp + (block.shape[-1],)) if shp
                      else block[0])
        off += n
    return jax.tree.unflatten(treedef, leaves)


def discretize_lanes(model, pflat, xk, uk, ukp1, sig, h, substeps, foh):
    """Fused-lane discretize: inputs have a trailing flat lane axis L
    (= batch x intervals); returns (A, Bm, Bp, S, z, x_end) trailing-L.

    pflat: params pytree with LEADING lane axis on every leaf (L, ...).
    """
    from successiveconvexification_tpu.ops.discretize import _aug_rk4_soa

    nx, nu = model.nx, model.nu
    dtype = xk.dtype
    L = xk.shape[-1]
    # lane tile MUST be a multiple of the 128-lane vreg width (a 196-lane
    # block aborts Mosaic's layout checks); see LANE_TILE for why 128
    T = LANE_TILE
    Lp = ((L + T - 1) // T) * T

    def padl(a):  # trailing-lane pad
        if Lp == a.shape[-1]:
            return a
        pad = jnp.zeros(a.shape[:-1] + (Lp - a.shape[-1],), a.dtype)
        return jnp.concatenate([a, pad], axis=-1)

    p_mat, treedef, shapes = _pack_params(pflat, L)
    # fold sigma in as an extra params row: a standalone (1, T) operand
    # block trips a Mosaic layout check ("limits[i] <= dim(i)"), a row of a
    # (P, T) block does not
    p_mat = jnp.concatenate([p_mat, sig[None, :]], axis=0)
    P = p_mat.shape[0]
    # pad the params by REPLICATING lane 0 (zeros would put m = 0 under the
    # dynamics' 1/m and poison the padding lanes with inf/nan traffic)
    if Lp != L:
        p_mat = jnp.concatenate(
            [p_mat, jnp.broadcast_to(p_mat[:, :1], (P, Lp - L))], axis=-1)
    xk_p, uk_p, ukp1_p = padl(xk), padl(uk), padl(ukp1)
    # pad states likewise with lane 0 (keeps the integration finite)
    if Lp != L:
        xk_p = xk_p.at[..., L:].set(xk[..., :1])
        uk_p = uk_p.at[..., L:].set(uk[..., :1])
        ukp1_p = ukp1_p.at[..., L:].set(ukp1[..., :1])

    def kernel(p_ref, x_ref, u_ref, up_ref,
               a_out, bm_out, bp_out, sv_out, z_out, xe_out):
        params_t = _unpack_params(p_ref[:P - 1, :], treedef, shapes)
        x = x_ref[:, :]
        u = u_ref[:, :]
        up = up_ref[:, :]
        sg = p_ref[P - 1, :]
        # lane_fanout=False: Mosaic rejects the lane-concatenated jacobian
        # fan-out (see discretize.fv_jac_nofan); per-direction jvps compile
        A, Bm, Bp, S, z, x_end = _aug_rk4_soa(
            model, params_t, x, u, up, sg, h, substeps, foh,
            lane_fanout=False)
        # row-by-row stores (leading-index on both sides): a full rank-3
        # store is the one op class the probe battery could not clear
        for i in range(A.shape[0]):
            a_out[i, :, :] = A[i]
            bm_out[i, :, :] = Bm[i]
            bp_out[i, :, :] = Bp[i]
        sv_out[:, :] = S
        z_out[:, :] = z
        xe_out[:, :] = x_end

    grid = (Lp // T,)
    vec2 = lambda n: pl.BlockSpec((n, T), lambda g: (0, g),
                                  memory_space=pltpu.VMEM)
    vec3 = lambda n, m: pl.BlockSpec((n, m, T), lambda g: (0, 0, g),
                                     memory_space=pltpu.VMEM)
    A, Bm, Bp, S, z, x_end = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nx, nx, Lp), dtype),
            jax.ShapeDtypeStruct((nx, nu, Lp), dtype),
            jax.ShapeDtypeStruct((nx, nu, Lp), dtype),
            jax.ShapeDtypeStruct((nx, Lp), dtype),
            jax.ShapeDtypeStruct((nx, Lp), dtype),
            jax.ShapeDtypeStruct((nx, Lp), dtype),
        ),
        grid=grid,
        in_specs=[vec2(P), vec2(nx), vec2(nu), vec2(nu)],
        out_specs=(vec3(nx, nx), vec3(nx, nu), vec3(nx, nu),
                   vec2(nx), vec2(nx), vec2(nx)),
        # the RK4 body's live set (aug carry + 4 stage temps + jvp tangents)
        # exceeds the 16 MB default scoped-vmem budget at T=128
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(p_mat, xk_p, uk_p, ukp1_p)
    trim = lambda a: a[..., :L]
    return tuple(trim(t) for t in (A, Bm, Bp, S, z, x_end))
