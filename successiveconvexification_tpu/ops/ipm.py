"""In-graph primal-dual interior-point SOCP solver (the TPU-native ECOS).

Replaces the reference's external C conic solver (SURVEY.md §2.1 C7/C8, §3.3) with a
Nesterov-Todd-scaled, Mehrotra predictor-corrector IPM that runs entirely inside the
XLA graph: fixed iteration count, per-lane convergence masking (vmap-safe), and a KKT
solve specialized to the stage structure of ``StageSOCP``:

    [ P   A'  G' ] [ux]   [bx]
    [ A   0   0  ] [uy] = [by]        P = pin-diagonal (+ static factorization reg)
    [ G   0 -W'W ] [uz]   [bz]

Elimination order (the whole point of the stage form):
  1. uz = W^-2 (G ux - bz)  ->  H ux + A'uy = bx + G'W^-2 bz, with
     H block-diagonal per stage: a dense (nx+nu+1) block on (dx,du,t) plus diagonal
     blocks for p,q (orthant-only variables) and a scalar for sigma.
  2. Schur onto the dynamics multipliers y: M uy = A H^-1 bxt - by where
     M = A H^-1 A' is BLOCK TRIDIAGONAL (nx-blocks along the K axis) plus a RANK-ONE
     arrow from the free-final-time sigma column, handled by Sherman-Morrison.
  3. Block-tridiagonal Cholesky via lax.scan (parallel-friendly cyclic-reduction and
     Pallas variants live in ops/pallas_kkt.py — same interface).

Everything is shaped (K, ...) / (K-1, ...) per scenario; ``jax.vmap`` adds the
scenario axis and turns every small dense op into a large batched TPU kernel.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from successiveconvexification_tpu.config import IPMConfig
from successiveconvexification_tpu.ops import cones as C
from successiveconvexification_tpu.ops import equilibrate as equilibrate_mod
from successiveconvexification_tpu.ops import smallla
from successiveconvexification_tpu.ops.precision import full_precision
from successiveconvexification_tpu.ops import socp
from successiveconvexification_tpu.ops.socp import Primal, StageSOCP

ConeVec = Dict[str, jnp.ndarray]


# =========================================================================
# KKT factorization and solve
# =========================================================================
class KKTFactors(NamedTuple):
    chol_Hw: jnp.ndarray     # (K, nw, nw) lower Cholesky of the stage H blocks
    d_p: jnp.ndarray         # (K-1, nx) diagonal H for p
    d_q: jnp.ndarray         # (K-1, nx)
    h_sig: jnp.ndarray       # () scalar H for sigma
    tri: tuple               # block-tridiag factors ("scan" or "pcr" layout)
    sm_t: jnp.ndarray        # (K-1, nx) M0^-1 g  (Sherman-Morrison vector)
    sm_denom: jnp.ndarray    # () h_sig + g' M0^-1 g


def _soc_jdiag(dim: int, dtype) -> jnp.ndarray:
    return jnp.concatenate([jnp.ones((1,), dtype), -jnp.ones((dim - 1,), dtype)])


def build_H(d: StageSOCP, W, reg: float):
    """Stage Hessian blocks H = P + G'W^-2 G (block-diagonal structure)."""
    K, nw = d.c_w.shape
    nx = d.c_p.shape[-1]
    dtype = d.c_w.dtype
    wt = C.winv2_terms(_spec_of(d), W)

    # dense (dx,du,t) block per node
    H = jnp.zeros((K, nw, nw), dtype)
    dlin = wt["lin"]["d"]                                    # (K, nl)
    H = H + jnp.einsum("kiw,ki,kiv->kwv", d.G_lin, dlin, d.G_lin)
    for i, G in enumerate(d.G_socs):
        key = "tr" if i == len(d.G_socs) - 1 else f"soc{i}"
        coef = wt[key]["coef"]                               # (K,)
        v = wt[key]["v"]                                     # (K, dim)
        u = jnp.einsum("kiw,ki->kw", G, v)                   # G'v
        jdiag = _soc_jdiag(G.shape[1], dtype)
        GJG = jnp.einsum("kiw,i,kiv->kwv", G, jdiag, G)
        H = H + coef[:, None, None] * (2.0 * u[:, :, None] * u[:, None, :] - GJG)

    pin = 1.0 - d.free_w
    H = H + jax.vmap(jnp.diag)(pin + d.Q_w + reg)
    if d.Q_r1.shape[1]:
        H = H + jnp.einsum("kiw,kiv->kwv", d.Q_r1, d.Q_r1)

    # p, q diagonals (orthant rows only)
    dpq = wt["pq"]["d"]                                      # (K-1, 2nx)
    d_p = dpq[:, :nx] + reg
    d_q = dpq[:, nx:] + reg

    # sigma scalar
    dsig = wt["sig"]["d"]                                    # (4,)
    h_sig = (jnp.sum(d.G_sig * dsig * d.G_sig) + (1.0 - d.free_sig)
             + d.Q_sig + reg)
    return H, d_p, d_q, h_sig


def _spec_of(d: StageSOCP) -> Dict[str, str]:
    spec = {"lin": "lin", "pq": "lin", "sig": "lin"}
    for i in range(len(d.G_socs) - 1):
        spec[f"soc{i}"] = "soc"
    spec["tr"] = "soc"
    return spec


def _chol_solve(chol: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched solve with precomputed lower Cholesky; rhs (..., n) or (..., n, m).

    Uses the unrolled small-matrix path (ops/smallla.py): on TPU the generic
    batched triangular solve leaves the VPU idle for these tiny blocks."""
    return smallla.cho_solve(chol, rhs)


def _pallas():
    """Lazy import of the Pallas kernel suite (only touched when
    cfg.use_pallas is set — keeps CPU-only deployments import-light)."""
    from successiveconvexification_tpu.ops import pallas_kkt

    return pallas_kkt


def _pq_sig_terms(d: StageSOCP, W, reg):
    """The non-w diagonal H pieces (p/q/sigma) of build_H, standalone."""
    wt = C.winv2_terms(_spec_of(d), W)
    nx = d.c_p.shape[-1]
    dpq = wt["pq"]["d"]
    d_p = dpq[:, :nx] + reg
    d_q = dpq[:, nx:] + reg
    dsig = wt["sig"]["d"]
    h_sig = (jnp.sum(d.G_sig * dsig * d.G_sig) + (1.0 - d.free_sig)
             + d.Q_sig + reg)
    return d_p, d_q, h_sig


def _fused_factor_inputs(d: StageSOCP, W, reg):
    """Linearize build_H's cone structure into per-row H weights for the
    fused VMEM kernel (ops/pallas_fused.py): H = sum_r wrow_r g_r g_r'
    + sum_cones ucoef (G'uv)(G'uv)' + diag(hdiag)."""
    wt = C.winv2_terms(_spec_of(d), W)
    K, nw = d.c_w.shape
    dtype = d.c_w.dtype
    nl = d.G_lin.shape[1]
    wrows = [wt["lin"]["d"]]
    uvs = [jnp.zeros((K, nl), dtype)]
    ucs = []
    ranges = []
    off = nl
    for i, G in enumerate(d.G_socs):
        key = "tr" if i == len(d.G_socs) - 1 else f"soc{i}"
        coef = wt[key]["coef"]                 # (K,)
        v = wt[key]["v"]                       # (K, dim)
        dim = G.shape[1]
        jd = jnp.concatenate(
            [-jnp.ones((1,), dtype), jnp.ones((dim - 1,), dtype)])
        wrows.append(coef[:, None] * jd[None, :])
        uvs.append(v)
        ucs.append(2.0 * coef)
        ranges.append((off, off + dim))
        off += dim
    G_cat = jnp.concatenate([d.G_lin] + list(d.G_socs), axis=1)
    wrow = jnp.concatenate(wrows, axis=1)
    uv = jnp.concatenate(uvs, axis=1)
    ucoef = jnp.stack(ucs, axis=-1)
    hdiag = (1.0 - d.free_w) + d.Q_w + reg
    return G_cat, wrow, uv, ucoef, hdiag, tuple(ranges)


def factorize(d: StageSOCP, W, cfg: IPMConfig) -> KKTFactors:
    K, nw = d.c_w.shape
    nx = d.c_p.shape[-1]
    nrow = d.b.shape[-1]  # nx + n_tangent
    dtype = d.c_w.dtype
    reg = jnp.asarray(cfg.static_reg, dtype)

    if (cfg.use_pallas and cfg.kkt_solver == "scan"
            and d.Q_r1.shape[1] == 0):
        # Fully fused VMEM factorization (ops/pallas_fused.py): H is BUILT,
        # factored, and Schur-eliminated inside one kernel — H/XE/XF/D/O
        # never materialize in HBM, and the tiny-dim G'WG einsums (measured
        # 35.9 of the 36.1 ms factorize at B=256, examples/ipm_profile.py)
        # become unrolled VPU rank-1 updates over the lane tile.
        from successiveconvexification_tpu.ops import pallas_fused as PF

        d_p, d_q, h_sig = _pq_sig_terms(d, W, reg)
        G_cat, wrow, uv, ucoef, hdiag, ranges = _fused_factor_inputs(
            d, W, reg)
        diag_pq = jnp.zeros((K - 1, nrow), dtype)
        diag_pq = diag_pq.at[:, :nx].set(1.0 / d_p + 1.0 / d_q)
        diag_pq = diag_pq + (1.0 - d.eq_row_free) + reg
        PF.set_soc_ranges(ranges)
        chol_Hw, Ltri, Ctri = PF.fused_factor(
            G_cat, wrow, uv, ucoef, hdiag, d.E, d.F, diag_pq)
        tri = (Ltri, Ctri)
        g = d.g_sig
        t = _tri_solve(cfg, tri, g)
        sm_denom = h_sig + jnp.sum(g * t)
        return KKTFactors(
            chol_Hw=chol_Hw, d_p=d_p, d_q=d_q, h_sig=h_sig,
            tri=tri, sm_t=t, sm_denom=sm_denom,
        )

    H, d_p, d_q, h_sig = build_H(d, W, reg)
    if cfg.use_pallas:
        # VMEM-resident SoA kernels: the factorization never leaves VMEM, and
        # under vmap the scenario axis folds into the kernel lane tile
        PK = _pallas()
        chol_Hw = PK.chol(H)
        XE = PK.cho_solve(chol_Hw[:-1], jnp.swapaxes(d.E, 1, 2))
        XF = PK.cho_solve(chol_Hw[1:], jnp.swapaxes(d.F, 1, 2))
    else:
        # hottest site: force the unrolled SoA path regardless of env default
        chol_Hw = smallla.chol(H, unrolled=True)
        # Hw^-1 E', Hw^-1 F'  (E_k on w_k, F_k on w_{k+1})
        XE = smallla.cho_solve(chol_Hw[:-1], jnp.swapaxes(d.E, 1, 2),
                               unrolled=True)
        XF = smallla.cho_solve(chol_Hw[1:], jnp.swapaxes(d.F, 1, 2),
                               unrolled=True)

    # virtual-control diagonal lives on the nx dynamics rows only; pinned
    # (structurally-zero) tangent rows get a unit diagonal
    diag_pq = jnp.zeros((K - 1, nrow), dtype)
    diag_pq = diag_pq.at[:, :nx].set(1.0 / d_p + 1.0 / d_q)
    diag_pq = diag_pq + (1.0 - d.eq_row_free)

    D = (
        jnp.einsum("kiw,kwj->kij", d.E, XE)
        + jnp.einsum("kiw,kwj->kij", d.F, XF)
        + jax.vmap(jnp.diag)(diag_pq)
        + reg * jnp.eye(nrow, dtype=dtype)
    )
    # off-diagonal M[k, k+1] = F_k Hw_{k+1}^-1 E_{k+1}'
    O = jnp.einsum("kiw,kwj->kij", d.F[:-1], XE[1:])          # (K-2, nx, nx)

    if cfg.kkt_solver == "pcr":
        tri = _pcr_factor(D, O)
    elif cfg.kkt_solver == "ksharded":
        # cross-chip substructured solve (SURVEY P3/P4); mesh installed via
        # parallel.kkt_sharded.set_kkt_mesh
        from successiveconvexification_tpu.parallel import kkt_sharded

        tri = kkt_sharded.ksharded_factor(D, O)
    elif cfg.use_pallas:
        tri = _pallas().tridiag_factor(D, O)
    else:
        tri = smallla.blocktridiag_factor(D, O)

    # Sherman-Morrison data for the sigma arrow
    g = d.g_sig
    t = _tri_solve(cfg, tri, g)
    sm_denom = h_sig + jnp.sum(g * t)
    return KKTFactors(
        chol_Hw=chol_Hw, d_p=d_p, d_q=d_q, h_sig=h_sig,
        tri=tri, sm_t=t, sm_denom=sm_denom,
    )


def _tri_solve(cfg: IPMConfig, tri, rhs):
    if cfg.kkt_solver == "pcr":
        return _pcr_solve(tri, rhs)
    if cfg.kkt_solver == "ksharded":
        from successiveconvexification_tpu.parallel import kkt_sharded

        return kkt_sharded.ksharded_solve(tri, rhs)
    chol_D, Coff = tri
    if cfg.use_pallas:
        return _pallas().tridiag_solve(chol_D, Coff, rhs)
    return smallla.blocktridiag_solve(chol_D, Coff, rhs)


def _pcr_factor(D: jnp.ndarray, O: jnp.ndarray):
    """Parallel cyclic reduction 'factorization' of an SPD block-tridiagonal
    system (SURVEY §2.3 P4): log2(N) levels of batched small-block ops instead
    of an N-step sequential scan — the TPU-friendly K-axis-parallel KKT path.

    Returns per-level (chol_D, C) pairs plus the final decoupled chol_D. The
    level recurrences (stride s = 2^l, C_i couples i -> i+s):
        D'_i = D_i - C_{i-s}' D_{i-s}^-1 C_{i-s} - C_i D_{i+s}^-1 C_i'
        C'_i = -C_i D_{i+s}^-1 C_{i+s}          (couples i -> i+2s)
        r'_i = r_i - C_{i-s}' D_{i-s}^-1 r_{i-s} - C_i D_{i+s}^-1 r_{i+s}
    """
    N, nx = D.shape[0], D.shape[-1]
    dtype = D.dtype
    levels = max(1, int(np.ceil(np.log2(max(N, 2)))))
    C = jnp.concatenate([O, jnp.zeros((1, nx, nx), dtype)], axis=0)  # C_i: i->i+1

    lev_data = []
    s = 1
    for _ in range(levels):
        cholD = smallla.chol(D)
        lev_data.append((cholD, C, s))
        DinvC = _chol_solve(cholD, C)                       # D_i^-1 C_i

        def shift_up(a, k, ident=False):   # a[i+k], padded
            if k >= a.shape[0]:
                pad = a.shape[0]
            else:
                pad = k
            fill = (
                jnp.broadcast_to(jnp.eye(nx, dtype=dtype), (pad, nx, nx))
                if ident else jnp.zeros((pad,) + a.shape[1:], dtype)
            )
            return jnp.concatenate([a[k:], fill], 0)[:N]

        def shift_down(a, k):  # a[i-k], zero-padded
            return jnp.concatenate(
                [jnp.zeros((min(k, a.shape[0]),) + a.shape[1:], dtype), a[:-k]], 0
            )[:N] if k < a.shape[0] else jnp.zeros_like(a)

        # D update. C_i = 0 whenever i+s is out of range (inductively), so the
        # identity-padded shifted cholesky is only a nonsingular placeholder.
        cholD_up = shift_up(cholD, s, ident=True)
        tmp = _chol_solve(cholD_up, jnp.swapaxes(C, 1, 2))  # D_{i+s}^-1 C_i'
        term_lo = jnp.einsum(
            "kij,kjl->kil", jnp.swapaxes(shift_down(C, s), 1, 2),
            shift_down(DinvC, s),
        )
        term_hi = jnp.einsum("kij,kjl->kil", C, tmp)
        D = D - term_lo - term_hi
        # C update: C'_i = -C_i D_{i+s}^-1 C_{i+s}
        C = -jnp.einsum("kij,kjl->kil", C, shift_up(DinvC, s))
        s *= 2

    chol_final = smallla.chol(D)
    return lev_data, chol_final


def _pcr_solve(factors, rhs):
    """Solve with PCR factors; rhs (N, nx) or (N, nx, m)."""
    lev_data, chol_final = factors
    vec = rhs.ndim == 2
    if vec:
        rhs = rhs[..., None]
    N = rhs.shape[0]
    dtype = rhs.dtype

    r = rhs
    for cholD, C, s in lev_data:
        Dinv_r = _chol_solve(cholD, r)

        def shift_up(a, k):
            return jnp.concatenate(
                [a[k:], jnp.zeros((min(k, a.shape[0]),) + a.shape[1:], dtype)], 0
            )[:N]

        def shift_down(a, k):
            return jnp.concatenate(
                [jnp.zeros((min(k, a.shape[0]),) + a.shape[1:], dtype), a[:-k]], 0
            )[:N] if k < a.shape[0] else jnp.zeros_like(a)

        term_lo = jnp.einsum(
            "kij,kjl->kil", jnp.swapaxes(shift_down(C, s), 1, 2),
            shift_down(Dinv_r, s),
        )
        term_hi = jnp.einsum("kij,kjl->kil", C, shift_up(Dinv_r, s))
        r = r - term_lo - term_hi

    u = _chol_solve(chol_final, r)
    return u[..., 0] if vec else u



def _H_solve(f: KKTFactors, bx: Primal, cfg: IPMConfig) -> Primal:
    if cfg.use_pallas:
        w = _pallas().cho_solve_vec(f.chol_Hw, bx.w)
    else:
        w = _chol_solve(f.chol_Hw, bx.w)
    return Primal(
        w=w,
        p=bx.p / f.d_p,
        q=bx.q / f.d_q,
        sig=bx.sig / f.h_sig,
    )


def solve_kkt(d: StageSOCP, f: KKTFactors, W, bx: Primal, by: jnp.ndarray,
              bz: ConeVec, cfg: IPMConfig) -> Tuple[Primal, jnp.ndarray, ConeVec]:
    """One structured KKT solve. Returns (ux, uy, uz)."""
    spec = _spec_of(d)
    bxt = socp.primal_axpy(bx, socp.apply_GT(d, C.winv2_apply(spec, W, bz)), 1.0)

    ry = socp.apply_A(d, _H_solve(f, bxt, cfg)) - by
    # M uy = ry with M = M0 + g g'/h_sig  (Sherman-Morrison)
    t1 = _tri_solve(cfg, f.tri, ry)
    coef = jnp.sum(d.g_sig * t1) / f.sm_denom
    uy = t1 - f.sm_t * coef

    ux = _H_solve(f, socp.primal_axpy(bxt, socp.apply_AT(d, uy), -1.0), cfg)
    gux = socp.apply_G(d, ux)
    uz = C.winv2_apply(spec, W, {k: gux[k] - bz[k] for k in gux})
    return ux, uy, uz


def kkt_residual(d: StageSOCP, W, ux: Primal, uy, uz, bx: Primal, by, bz):
    """Residual of the UNregularized KKT system (for iterative refinement)."""
    spec = _spec_of(d)
    pin = 1.0 - d.free_w
    Pw = ux.w * (pin + d.Q_w)
    if d.Q_r1.shape[1]:
        Pw = Pw + jnp.einsum(
            "kiw,ki->kw", d.Q_r1, jnp.einsum("kiw,kw->ki", d.Q_r1, ux.w)
        )
    Pux = Primal(
        w=Pw, p=jnp.zeros_like(ux.p), q=jnp.zeros_like(ux.q),
        sig=ux.sig * (1.0 - d.free_sig + d.Q_sig),
    )
    rx = socp.primal_axpy(
        socp.primal_axpy(bx, Pux, -1.0), socp.primal_axpy(
            socp.apply_AT(d, uy), socp.apply_GT(d, uz), 1.0), -1.0,
    )
    ry = by - socp.apply_A(d, ux)
    gux = socp.apply_G(d, ux)
    # third row: G ux - W^2 uz = bz  ->  residual bz - G ux + W^2 uz
    w2uz = C.w_apply(spec, W, C.w_apply(spec, W, uz, inverse=False), inverse=False)
    rz = {k: bz[k] - gux[k] + w2uz[k] for k in gux}
    return rx, ry, rz


def solve_kkt_refined(d, f, W, bx, by, bz, cfg: IPMConfig, steps=None):
    ux, uy, uz = solve_kkt(d, f, W, bx, by, bz, cfg)
    for _ in range(cfg.refine_steps if steps is None else steps):
        rx, ry, rz = kkt_residual(d, W, ux, uy, uz, bx, by, bz)
        cx, cy, cz = solve_kkt(d, f, W, rx, ry, rz, cfg)
        ux = socp.primal_axpy(ux, cx, 1.0)
        uy = uy + cy
        uz = {k: uz[k] + cz[k] for k in uz}
    return ux, uy, uz


# =========================================================================
# IPM driver
# =========================================================================
class IPMState(NamedTuple):
    x: Primal
    y: jnp.ndarray
    s: ConeVec
    z: ConeVec
    converged: jnp.ndarray   # () bool — CERTIFIED: gap/pres/dres below tols
    iters: jnp.ndarray       # () int32
    gap: jnp.ndarray         # () relative duality gap
    pres: jnp.ndarray        # () primal residual (relative)
    dres: jnp.ndarray        # () dual residual (relative)
    # stalled: the lane's update gate failed (step below min_step or a
    # non-finite direction). The iteration body is a pure function of
    # (x, y, s, z), so a lane that could not move once can NEVER move again —
    # marking it terminal is exactly semantics-preserving and lets the
    # while_loop stop burning budget on it (at f32 tolerances, lanes that
    # cannot certify otherwise run to max_iters doing nothing; measured 25/25
    # budget burned on every warm subproblem). Kept SEPARATE from `converged`
    # so the certificate keeps its meaning.
    stalled: jnp.ndarray     # () bool
    # Infeasibility certificates (ECOS-style, SURVEY §3.3): a detected-
    # infeasible lane is diagnosable instead of just "stalled". Both are
    # scale-invariant residual ratios of the improving-ray certificates:
    #   primal infeasible:  exists (y, z succeq 0): ||A'y + G'z|| small
    #                       relative to -(b'y + h'z) > 0
    #   dual infeasible:    exists x (s succeq 0): ||(Px, Ax, Gx + s)|| small
    #                       relative to -c'x > 0 (objective improving ray)
    # The engine's subproblems are feasible/bounded by construction (t-buffer
    # + virtual control), so these fire only on malformed problems — but then
    # they name the failure instead of burning budget.
    prim_infeas: jnp.ndarray  # () bool
    dual_infeas: jnp.ndarray  # () bool


# Status codes for diagnosability (status() below packs the state's terminal
# flags into one enum-like int array; the flags stay the source of truth).
STATUS_RUNNING = 0      # budget exhausted without any terminal flag
STATUS_OPTIMAL = 1
STATUS_STALLED = 2
STATUS_PRIM_INFEAS = 3
STATUS_DUAL_INFEAS = 4


def status(st: IPMState) -> jnp.ndarray:
    """Pack an IPMState's terminal flags into an int32 status code (per lane
    under vmap). Precedence: optimal > infeasible > stalled."""
    code = jnp.zeros(jnp.shape(st.converged), jnp.int32)
    code = jnp.where(st.stalled, STATUS_STALLED, code)
    code = jnp.where(st.dual_infeas, STATUS_DUAL_INFEAS, code)
    code = jnp.where(st.prim_infeas, STATUS_PRIM_INFEAS, code)
    return jnp.where(st.converged, STATUS_OPTIMAL, code)


def _shift_into_cone(spec, v: ConeVec, e: ConeVec) -> ConeVec:
    """v + (1 + alpha_violation) * e so the result is strictly interior."""
    # distance to cone along -e: for lin, alpha = -min(v); for soc,
    # alpha = ||v1|| - v0 (positive if outside)
    alphas = []
    for k, kind in spec.items():
        if v[k].size == 0:
            continue
        if kind == "lin":
            alphas.append(-jnp.min(v[k]))
        else:
            a = jnp.linalg.norm(v[k][..., 1:], axis=-1) - v[k][..., 0]
            alphas.append(jnp.max(a))
    alpha = jnp.maximum(jnp.max(jnp.stack(alphas)), 0.0)
    scale = 1.0 + alpha
    return C.tree_add(v, e, scale)


def _push_interior(spec, v: ConeVec, margin: float) -> ConeVec:
    """Push a cone vector strictly inside: lin entries >= margin; soc head
    exceeds tail norm by >= margin."""
    out = {}
    for k, kind in spec.items():
        if kind == "lin":
            out[k] = jnp.maximum(v[k], margin)
        else:
            tail = v[k][..., 1:]
            head = v[k][..., :1]
            need = jnp.linalg.norm(tail, axis=-1, keepdims=True) + margin
            out[k] = jnp.concatenate([jnp.maximum(head, need), tail], axis=-1)
    return out


def _identity_W(spec, like: ConeVec):
    W = {}
    for k, kind in spec.items():
        if kind == "lin":
            W[k] = {"w": jnp.ones_like(like[k])}
        else:
            wbar = jnp.zeros_like(like[k]).at[..., 0].set(1.0)
            W[k] = {"eta": jnp.ones(like[k].shape[:-1], like[k].dtype), "wbar": wbar}
    return W


@full_precision
def ipm_solve(d: StageSOCP, cfg: IPMConfig, init: IPMState | None = None,
              init_valid: jnp.ndarray | None = None) -> IPMState:
    """Solve one scenario's subproblem; vmap over scenarios for batches.

    ``init``: optional warm start from a previous (similar) subproblem's
    solution — primal/dual iterates are reused with slacks pushed strictly
    inside their cones. In the SCvx loop consecutive subproblems differ only
    by the re-linearization, which typically halves the iteration count.

    ``init_valid``: optional () bool (traced; per-lane under vmap). When
    given, the cold conelp-style init is ALSO computed and lanes with
    ``init_valid == False`` start from it instead of ``init`` — the recovery
    path after a failed solve or a penalty-rescaled objective, where stale
    iterates poison the solve (the naive unit interior point is NOT a safe
    substitute: on hard subproblems it stalls where the cold init converges).
    """
    nx_pq = d.c_p.shape[-1]
    d_raw = d
    if cfg.equilibrate:
        # Ruiz presolve (ops/equilibrate.py): the whole solve runs in scaled
        # coordinates; the returned state is unscaled at the bottom. Warm
        # starts arrive in raw coordinates and are scaled in here.
        d, eq_scales = equilibrate_mod.equilibrate(d, iters=cfg.ruiz_iters)
        if init is not None:
            init = equilibrate_mod.scale_state(eq_scales, init, nx_pq, True)

    spec = _spec_of(d)
    h = socp.cone_h(d)
    c = socp.objective(d)
    b = d.b
    e = C.identity(spec, h)
    deg = C.degree(spec, h)
    dtype = d.c_w.dtype

    def pin_project(x: Primal) -> Primal:
        return Primal(w=x.w * d.free_w, p=x.p, q=x.q, sig=x.sig * d.free_sig)

    if init is None or init_valid is not None:
        # ---- cold init (CVXOPT conelp-style, W = I) ----------------------
        W0 = _identity_W(spec, h)
        f0 = factorize(d, W0, cfg)
        # primal: min ||s|| heuristic -> solve with (0, b, h)
        xc, _, _ = solve_kkt(d, f0, W0, socp.primal_zeros(d), b, h, cfg)
        s_cand = {k: h[k] - v for k, v in socp.apply_G(d, xc).items()}
        sc = _shift_into_cone(spec, s_cand, e)
        # dual: solve with (-c, 0, 0)
        mc = Primal(w=-c.w, p=-c.p, q=-c.q, sig=-c.sig)
        _, yc, z_cand = solve_kkt(
            d, f0, W0, mc, jnp.zeros_like(b), C.tree_scale(e, 0.0), cfg
        )
        zc = _shift_into_cone(spec, z_cand, e)
        xc = pin_project(xc)

    if init is not None:
        margin = jnp.asarray(cfg.warm_margin, dtype)
        xw = pin_project(init.x)
        yw = init.y
        # Slacks are DERIVED from the new problem's h (s = h - G x, pushed
        # interior), never reused from the carry: consecutive subproblems
        # re-linearize and rescale their cone rows (trust radius, penalty
        # scale), so the old s is inconsistent with the new rows — starting
        # with rz != 0 of O(1) poisons the first NT scaling and the solve
        # diverges right after the SCvx reference moves. With x = 0 (the
        # post-accept recentered carry) this gives s = h exactly: the
        # canonical primal-feasible start with carried duals.
        s_cand_w = {k: h[k] - v for k, v in socp.apply_G(d, xw).items()}
        sw = _push_interior(spec, s_cand_w, margin)
        zw = _push_interior(spec, init.z, margin)
        if init_valid is None:
            x0, y0, s0, z0 = xw, yw, sw, zw
        else:
            # per-lane select; where() (not arithmetic) so a NaN-carrying
            # invalid warm start cannot leak into the cold branch
            sel = lambda w, cold: jax.tree.map(
                lambda a, b_: jnp.where(init_valid, a, b_), w, cold
            )
            x0, y0, s0, z0 = sel(xw, xc), sel(yw, yc), sel(sw, sc), sel(zw, zc)
    else:
        x0, y0, s0, z0 = xc, yc, sc, zc

    # Objective scale: with equilibration the objective was multiplied by tau,
    # so gap and dual residual must be measured relative to tau (not 1) to
    # keep the RAW-space relative tolerances — the scaled-space quantities are
    # exactly tau * (raw quantities) for these two (column scales are O(1)-
    # balanced by construction and drop out of the norm up to that factor).
    tau_obj = eq_scales.tau if cfg.equilibrate else jnp.ones((), dtype)
    cnorm = jnp.maximum(tau_obj, jnp.sqrt(socp.primal_inner(c, c)))
    bnorm = jnp.maximum(1.0, jnp.linalg.norm(b))
    hnorm = jnp.maximum(1.0, jnp.sqrt(C.inner(h, h)))

    # dtype-aware tolerance floor (see IPMConfig.tol_eps_mult). gap and dres
    # are RAW-space relative measures but the arithmetic runs in scaled
    # coordinates, so their achievable floor is eps/tau (the scaled-space
    # round-off divided by the objective scale): floor them accordingly, or
    # with tau ~ 1e-3 no f32 lane could ever certify and every solve would
    # burn the full iteration budget. pres has no tau factor.
    eps = float(jnp.finfo(dtype).eps)
    tol_gap = jnp.maximum(cfg.tol_gap, cfg.tol_eps_mult * eps / tau_obj)
    tol_feas = max(cfg.tol_feas, cfg.tol_eps_mult * eps)
    tol_dres = jnp.maximum(cfg.tol_feas, cfg.tol_eps_mult * eps / tau_obj)
    tol_infeas = max(cfg.tol_infeas, cfg.tol_eps_mult * eps)

    state = IPMState(
        x=x0, y=y0, s=s0, z=z0,
        converged=jnp.asarray(False),
        iters=jnp.asarray(0, jnp.int32),
        gap=jnp.asarray(jnp.inf, dtype), pres=jnp.asarray(jnp.inf, dtype),
        dres=jnp.asarray(jnp.inf, dtype),
        stalled=jnp.asarray(False),
        prim_infeas=jnp.asarray(False), dual_infeas=jnp.asarray(False),
    )

    def body(_, st: IPMState) -> IPMState:
        x, y, s, z = st.x, st.y, st.s, st.z
        pin = 1.0 - d.free_w
        Pxw = x.w * (pin + d.Q_w)
        if d.Q_r1.shape[1]:
            Pxw = Pxw + jnp.einsum(
                "kiw,ki->kw", d.Q_r1, jnp.einsum("kiw,kw->ki", d.Q_r1, x.w)
            )
        Px = Primal(w=Pxw, p=jnp.zeros_like(x.p),
                    q=jnp.zeros_like(x.q),
                    sig=x.sig * (1.0 - d.free_sig + d.Q_sig))
        rx = socp.primal_axpy(
            socp.primal_axpy(socp.primal_axpy(c, Px, 1.0), socp.apply_AT(d, y), 1.0),
            socp.apply_GT(d, z), 1.0)
        ry = socp.apply_A(d, x) - b
        gx = socp.apply_G(d, x)
        rz = {k: gx[k] + s[k] - h[k] for k in gx}

        sz = C.inner(s, z)
        mu = sz / deg
        cx = socp.primal_inner(c, x)
        gap = sz / jnp.maximum(tau_obj, jnp.abs(cx))
        pres = jnp.sqrt(jnp.linalg.norm(ry) ** 2 + C.inner(rz, rz)) / jnp.maximum(
            bnorm, hnorm)
        dres = jnp.sqrt(socp.primal_inner(rx, rx)) / cnorm
        converged = (gap < tol_gap) & (pres < tol_feas) & (dres < tol_dres)

        # ---- infeasibility certificates (scale-invariant ratios) ----------
        # A'y + G'z = rx - c - Px; Ax = ry + b; Gx + s = rz + h — all free
        # from residual pieces already in hand, so the check costs reductions.
        aygz = socp.primal_axpy(socp.primal_axpy(rx, c, -1.0), Px, -1.0)
        by_hz = jnp.sum(b * y) + C.inner(h, z)
        pinf_num = jnp.sqrt(socp.primal_inner(aygz, aygz))
        prim_infeas_now = (by_hz < 0.0) & (pinf_num < tol_infeas * (-by_hz))
        ax = ry + b
        gxs = {k: rz[k] + h[k] for k in rz}
        dinf_num = jnp.sqrt(
            socp.primal_inner(Px, Px) + jnp.sum(ax * ax) + C.inner(gxs, gxs)
        )
        dual_infeas_now = (cx < 0.0) & (dinf_num < tol_infeas * (-cx))

        active = ~(st.converged | converged | st.stalled
                   | st.prim_infeas | prim_infeas_now
                   | st.dual_infeas | dual_infeas_now)
        act = active.astype(dtype)

        W = C.nt_scaling(spec, s, z)
        lam = C.scaling_point(spec, W, z)
        f = factorize(d, W, cfg)

        # ---- affine (predictor) ------------------------------------------
        ds_t = C.jordan_mul(spec, lam, lam)
        bz_a = {k: -rz[k] + C.w_apply(spec, W, C.jordan_solve(spec, lam, ds_t))[k]
                for k in rz}
        nrx = Primal(w=-rx.w, p=-rx.p, q=-rx.q, sig=-rx.sig)
        # the affine predictor only sets the centering parameter and the
        # Mehrotra correction — it tolerates an unrefined solve
        dx_a, dy_a, dz_a = solve_kkt_refined(d, f, W, nrx, -ry, bz_a, cfg,
                                             steps=0)
        gdx = socp.apply_G(d, dx_a)
        ds_a = {k: -rz[k] - gdx[k] for k in rz}

        step_s = C.max_step(spec, s, ds_a)
        step_z = C.max_step(spec, z, dz_a)
        alpha_aff = jnp.minimum(1.0, jnp.minimum(step_s, step_z))
        mu_aff = C.inner(
            C.tree_add(s, ds_a, alpha_aff), C.tree_add(z, dz_a, alpha_aff)
        ) / deg
        eta = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)

        if cfg.corrector:
            # Mehrotra correction in scaled space
            wds = C.w_apply(spec, W, ds_a, inverse=True)
            wdz = C.w_apply(spec, W, dz_a, inverse=False)
            gamma = C.jordan_mul(spec, wds, wdz)
            ds_t2 = {
                k: ds_t[k] + gamma[k] - eta * mu * e[k] for k in ds_t
            }
        else:
            ds_t2 = {k: ds_t[k] - eta * mu * e[k] for k in ds_t}

        bz_c = {k: -rz[k] + C.w_apply(spec, W, C.jordan_solve(spec, lam, ds_t2))[k]
                for k in rz}
        dx, dy, dz = solve_kkt_refined(d, f, W, nrx, -ry, bz_c, cfg)
        gdx = socp.apply_G(d, dx)
        ds = {k: -rz[k] - gdx[k] for k in rz}

        step_s = C.max_step(spec, s, ds)
        step_z = C.max_step(spec, z, dz)
        alpha = jnp.minimum(
            1.0, cfg.frac_to_boundary * jnp.minimum(step_s, step_z)
        )

        # ---- Gondzio multiple centrality correctors ----------------------
        # Extra KKT SOLVES on this iteration's factorization that pull
        # outlying scaled complementarity products back into
        # [beta_min, beta_max] * mu_target, enlarging the step. Restricted to
        # the ORTHANT blocks (lin / pq / sig) — elementwise clipping is exact
        # Jordan-frame clipping there, and those blocks hold the bulk of the
        # complementarity pairs; SOC blocks are left to the Mehrotra
        # corrector. Each correction is accepted per lane only if it improves
        # the step length, so a useless correction costs a solve but never
        # degrades the iterate (the target adjustment enters the Newton rhs
        # through theta' = eta*mu*e + dt, i.e. bz gets -W(lam \ dt)).
        orthant_keys = ("lin", "pq", "sig")
        for _ in range(cfg.gondzio_correctors):
            a_t = jnp.minimum(1.0, 1.5 * alpha + 0.3)
            s_t = C.tree_add(s, ds, a_t)
            z_t = C.tree_add(z, dz, a_t)
            mu_t = jnp.maximum(C.inner(s_t, z_t) / deg, 1e-30)
            v = C.jordan_mul(
                spec,
                C.w_apply(spec, W, s_t, inverse=True),
                C.w_apply(spec, W, z_t, inverse=False),
            )
            lo = cfg.gondzio_beta_min * mu_t
            hi = cfg.gondzio_beta_max * mu_t
            dt = {
                k: (jnp.clip(v[k], lo, hi) - v[k]) if k in orthant_keys
                else jnp.zeros_like(v[k])
                for k in v
            }
            wldt = C.w_apply(spec, W, C.jordan_solve(spec, lam, dt))
            bz_g = {k: -wldt[k] for k in wldt}
            dx_g, dy_g, dz_g = solve_kkt_refined(
                d, f, W, socp.primal_zeros(d), jnp.zeros_like(ry), bz_g, cfg,
                steps=0)
            gdx_g = socp.apply_G(d, dx_g)
            ds2 = C.tree_add(ds, {k: -gdx_g[k] for k in gdx_g}, 1.0)
            dz2 = C.tree_add(dz, dz_g, 1.0)
            a2 = jnp.minimum(1.0, cfg.frac_to_boundary * jnp.minimum(
                C.max_step(spec, s, ds2), C.max_step(spec, z, dz2)))
            better = a2 > alpha
            pickg = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(better, n, o), new, old)
            dx = pickg(socp.primal_axpy(dx, dx_g, 1.0), dx)
            dy = pickg(dy + dy_g, dy)
            dz = pickg(dz2, dz)
            ds = pickg(ds2, ds)
            alpha = jnp.where(better, a2, alpha)

        # Robustness for the fixed-iteration batched regime: a converged (or
        # numerically exhausted) lane must never contaminate its iterate. The
        # update is gated with where() on the whole trees (NOT alpha * dx, which
        # would propagate NaN via 0 * NaN).
        dir_finite = jnp.array(True)
        for leaf in jax.tree.leaves((dx, dy, dz, ds)):
            dir_finite = dir_finite & jnp.all(jnp.isfinite(leaf))
        ok = active & dir_finite & jnp.isfinite(alpha) & (alpha > cfg.min_step)

        def upd(old, new):
            return jax.tree.map(lambda o, n: jnp.where(ok, n, o), old, new)

        x_n = upd(x, pin_project(socp.primal_axpy(x, dx, alpha)))
        return IPMState(
            x=x_n,
            y=upd(y, y + alpha * dy),
            s=upd(s, C.tree_add(s, ds, alpha)),
            z=upd(z, C.tree_add(z, dz, alpha)),
            converged=st.converged | converged,
            iters=st.iters + active.astype(jnp.int32),
            gap=jnp.where(jnp.isfinite(gap), gap, st.gap),
            pres=jnp.where(jnp.isfinite(pres), pres, st.pres),
            dres=jnp.where(jnp.isfinite(dres), dres, st.dres),
            stalled=st.stalled | (active & ~ok),
            prim_infeas=st.prim_infeas | (~st.converged & prim_infeas_now),
            dual_infeas=st.dual_infeas | (~st.converged & dual_infeas_now),
        )

    # while_loop with an "unconverged" condition instead of a fixed fori_loop:
    # a converged solve stops paying for the remaining iteration budget. Under
    # vmap the batched while runs until the SLOWEST lane converges — warm-
    # started late-SCvx solves typically finish well under max_iters, and the
    # per-lane `active` masking in body() keeps finished lanes frozen either
    # way, so this is semantics-preserving.
    def cond(carry):
        i, st = carry
        return (i < cfg.max_iters) & ~(
            st.converged | st.stalled | st.prim_infeas | st.dual_infeas
        )

    def wbody(carry):
        i, st = carry
        return i + 1, body(i, st)

    _, state = jax.lax.while_loop(cond, wbody, (jnp.asarray(0, jnp.int32), state))

    if cfg.equilibrate:
        state = equilibrate_mod.scale_state(eq_scales, state, nx_pq, False)

    # Re-evaluate the infeasibility certificates at the FINAL iterate, in
    # RAW coordinates against the ORIGINAL problem. Two reasons the in-loop
    # checks alone miss real certificates: (a) the body computes them from
    # each iteration's INCOMING state, but the ray often only clears the
    # threshold on the very step that also trips the stall-exit (an
    # unbounded sigma grows ~5x/iteration until the regularized KKT pins
    # it); (b) the loop runs in Ruiz-scaled coordinates where the
    # certificate's numerator/denominator pick up different row/column
    # scale factors and the scale-invariant ratio is distorted.
    def final_certs(st: IPMState):
        x, y, s, z = st.x, st.y, st.s, st.z
        dr = d_raw
        hr = socp.cone_h(dr)
        cr = socp.objective(dr)
        Pxw = x.w * ((1.0 - dr.free_w) + dr.Q_w)
        if dr.Q_r1.shape[1]:
            Pxw = Pxw + jnp.einsum(
                "kiw,ki->kw", dr.Q_r1, jnp.einsum("kiw,kw->ki", dr.Q_r1, x.w)
            )
        Px = Primal(w=Pxw, p=jnp.zeros_like(x.p), q=jnp.zeros_like(x.q),
                    sig=x.sig * (1.0 - dr.free_sig + dr.Q_sig))
        aygz = socp.primal_axpy(socp.apply_AT(dr, y),
                                socp.apply_GT(dr, z), 1.0)
        by_hz = jnp.sum(dr.b * y) + C.inner(hr, z)
        pinf_num = jnp.sqrt(socp.primal_inner(aygz, aygz))
        prim_now = (by_hz < 0.0) & (pinf_num < tol_infeas * (-by_hz))
        ax = socp.apply_A(dr, x)
        gx = socp.apply_G(dr, x)
        gxs = {k: gx[k] + s[k] for k in gx}
        cx = socp.primal_inner(cr, x)
        dinf_num = jnp.sqrt(
            socp.primal_inner(Px, Px) + jnp.sum(ax * ax) + C.inner(gxs, gxs)
        )
        dual_now = (cx < 0.0) & (dinf_num < tol_infeas * (-cx))
        return prim_now, dual_now

    prim_f, dual_f = final_certs(state)
    state = state._replace(
        prim_infeas=state.prim_infeas | (~state.converged & prim_f),
        dual_infeas=state.dual_infeas | (~state.converged & dual_f),
    )
    return state
