"""IPM-internals micro-profile on the flagship batch (VERDICT r2 item 2 prep).

BENCH_MODE=sol splits the SCvx iteration into discretize/assemble/ipm/merit;
this script splits the IPM stage itself — build_H, factorize, one KKT solve,
marginal cost per IPM iteration — so the VMEM-fusion work targets the
measured bound, not a guess. Every timing forces a host transfer (the axon
tunnel returns from block_until_ready early).

Usage: [B=256] [PALLAS=1] [K=50] python examples/ipm_profile.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import ipm, socp
from successiveconvexification_tpu.ops.discretize import discretize
from successiveconvexification_tpu.ops.scvx import scvx_init, scvx_iteration
from successiveconvexification_tpu.parallel.batch import sample_dispersions


def timeit(fn, *args, reps=4):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    B = int(os.environ.get("B", "256"))
    K = int(os.environ.get("K", "50"))
    use_pallas = os.environ.get("PALLAS", "1") == "1"
    cfg = scvx.SolverConfig(
        dtype="float32",
        disc=scvx.DiscretizationConfig(K=K, substeps=8),
        ipm=scvx.IPMConfig(max_iters=15, refine_steps=1, warm_start=True,
                           use_pallas=use_pallas),
    )
    model = scvx.rocket6dof_model()
    params = rk.default_params(dtype=jnp.float32)
    pb = sample_dispersions(params, jax.random.PRNGKey(0), B,
                            r_std=0.2, v_std=0.1, m_frac_std=0.03)

    # realistic mid-solve state: 5 SCvx iterations in
    st = jax.jit(jax.vmap(lambda p: scvx_init(model, p, cfg)))(pb)
    step = jax.jit(jax.vmap(lambda p, s: scvx_iteration(model, p, cfg, s)))
    for _ in range(5):
        st = step(pb, st)
    _ = float(jnp.sum(st.X))

    v_disc = jax.jit(jax.vmap(lambda p, s: discretize(
        model, p, s.X, s.U, s.sigma, substeps=cfg.disc.substeps,
        foh=cfg.disc.foh)))
    disc = v_disc(pb, st)
    v_asm = jax.jit(jax.vmap(lambda p, dd, s: socp.assemble(
        model, cfg.scvx, p, dd, s.X, s.U, s.sigma, s.tr_radius,
        free_final_time=cfg.free_final_time, penalty_scale=s.penalty_scale)))
    d = v_asm(pb, disc, st)

    rows = {}
    rows["device"] = str(jax.devices()[0])
    rows["B"], rows["K"], rows["pallas"] = B, K, use_pallas

    # identity NT scaling: same block structure/flops as a mid-IPM scaling
    def identity_W(dd):
        spec = ipm._spec_of(dd)
        return ipm._identity_W(spec, socp.cone_h(dd))

    v_W = jax.jit(jax.vmap(identity_W))
    W = v_W(d)

    v_buildH = jax.jit(jax.vmap(
        lambda dd, ww: ipm.build_H(dd, ww, cfg.ipm.static_reg)))
    ms, _H = timeit(v_buildH, d, W)
    rows["build_H_ms"] = round(ms, 2)

    v_fact = jax.jit(jax.vmap(
        functools.partial(ipm.factorize, cfg=cfg.ipm)))
    ms, f = timeit(v_fact, d, W)
    rows["factorize_ms"] = round(ms, 2)

    v_h = jax.jit(jax.vmap(socp.cone_h))
    bz = v_h(d)
    v_solve = jax.jit(jax.vmap(
        lambda dd, ff, ww, bzz: ipm.solve_kkt(
            dd, ff, ww, socp.primal_zeros(dd), dd.b, bzz, cfg.ipm)))
    ms, _ = timeit(v_solve, d, f, W, bz)
    rows["solve_kkt_ms"] = round(ms, 2)

    v_solve_ref = jax.jit(jax.vmap(
        lambda dd, ff, ww, bzz: ipm.solve_kkt_refined(
            dd, ff, ww, socp.primal_zeros(dd), dd.b, bzz, cfg.ipm)))
    ms, _ = timeit(v_solve_ref, d, f, W, bz)
    rows["solve_kkt_refined_ms"] = round(ms, 2)

    # marginal per-IPM-iteration cost: max_iters=2 vs 7 (same init work)
    import dataclasses
    for iters in (2, 7):
        cfg_i = dataclasses.replace(cfg.ipm, max_iters=iters,
                                    tol_gap=1e-30, tol_feas=1e-30)
        v_ipm = jax.jit(jax.vmap(functools.partial(ipm.ipm_solve, cfg=cfg_i)))
        ms, _ = timeit(v_ipm, d, reps=2)
        rows[f"ipm_{iters}it_ms"] = round(ms, 2)
    rows["ipm_marginal_ms_per_iter"] = round(
        (rows["ipm_7it_ms"] - rows["ipm_2it_ms"]) / 5.0, 2)

    ms, _ = timeit(v_disc, pb, st, reps=2)
    rows["discretize_ms"] = round(ms, 2)
    ms, _ = timeit(v_asm, pb, disc, st, reps=2)
    rows["assemble_ms"] = round(ms, 2)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
