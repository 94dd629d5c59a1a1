"""Per-stage TPU timing + speed-of-light accounting for the flagship sweep.

Times each pipeline stage (discretize / assemble / IPM / merit) and the IPM's
internal stages (factorize / KKT solve / cone algebra) at flagship shape
(B x K=50, 6-DoF), printing wall, XLA cost-analysis flops+bytes, and SoL
fractions vs the chip peaks (utils/metrics.py). Feeds the BASELINE.md table.

Usage: python examples/profile_stages.py [--batch 256] [--ipm-iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import cones as C
from successiveconvexification_tpu.ops import ipm, socp
from successiveconvexification_tpu.ops.discretize import discretize, propagate
from successiveconvexification_tpu.ops.scvx import (
    merit_components,
    scvx_init,
    scvx_iteration,
)
from successiveconvexification_tpu.parallel.batch import sample_dispersions
from successiveconvexification_tpu.utils import metrics


def _sync(out):
    """Honest completion barrier: the axon tunnel can return from
    block_until_ready before remote execution finishes — a host transfer of
    (a reduction of) every output leaf is the only reliable fence here."""
    return [float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree.leaves(out)
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)]


def bench_fn(fn, args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    # device executes dispatches in order: fencing the last fences them all,
    # and the one host round-trip amortizes over reps
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--K", type=int, default=50)
    ap.add_argument("--ipm-iters", type=int, default=20)
    ap.add_argument("--profile-dir", default=None,
                    help="also capture a jax.profiler trace here")
    ap.add_argument("--use-pallas", action="store_true",
                    help="route KKT block algebra through the Pallas kernels")
    args = ap.parse_args()

    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=jnp.float32)
    cfg = scvx.SolverConfig(
        dtype="float32",
        disc=scvx.DiscretizationConfig(K=args.K, substeps=8),
        ipm=scvx.IPMConfig(max_iters=args.ipm_iters, refine_steps=1,
                           use_pallas=args.use_pallas),
    )
    B = args.batch
    pb = sample_dispersions(params, jax.random.PRNGKey(0), B)

    dev = jax.devices()[0]
    kind = "v5e" if "lite" in str(dev).lower() else "v5p"
    peaks = metrics.CHIP_PEAKS[kind]

    st = jax.jit(jax.vmap(lambda p: scvx_init(model, p, cfg)),
                 static_argnums=())(pb)

    # ---- stage closures (all vmapped over B) ------------------------------
    def f_disc(pb, st):
        return jax.vmap(
            lambda p, s: discretize(model, p, s.X, s.U, s.sigma,
                                    substeps=cfg.disc.substeps)
        )(pb, st)

    def f_assemble(pb, st, disc):
        return jax.vmap(
            lambda p, s, dd: socp.assemble(
                model, cfg.scvx, p, dd, s.X, s.U, s.sigma, s.tr_radius,
                True, s.penalty_scale)
        )(pb, st, disc)

    def f_ipm(d):
        return jax.vmap(lambda dd: ipm.ipm_solve(dd, cfg.ipm))(d)

    def f_merit(pb, st):
        return jax.vmap(
            lambda p, s: merit_components(model, cfg, p, s.X, s.U, s.sigma)
        )(pb, st)

    def f_factorize(d, W):
        return jax.vmap(lambda dd, ww: ipm.factorize(dd, ww, cfg.ipm))(d, W)

    def f_kkt_solve(d, f, W, bx, by, bz):
        return jax.vmap(
            lambda dd, ff, ww, x, y, z: ipm.solve_kkt(dd, ff, ww, x, y, z,
                                                      cfg.ipm)
        )(d, f, W, bx, by, bz)

    def f_iteration(pb, st):
        return jax.vmap(lambda p, s: scvx_iteration(model, p, cfg, s))(pb, st)

    disc_j = jax.jit(f_disc)
    asm_j = jax.jit(f_assemble)
    ipm_j = jax.jit(f_ipm)
    merit_j = jax.jit(f_merit)
    iter_j = jax.jit(f_iteration)

    disc = disc_j(pb, st)
    d = asm_j(pb, st, disc)

    # identity NT scaling (structurally identical cost to a real one)
    def mk_W(dd):
        spec = ipm._spec_of(dd)
        h = socp.cone_h(dd)
        return ipm._identity_W(spec, h)

    W = jax.jit(jax.vmap(mk_W))(d)
    fac_j = jax.jit(f_factorize)
    fac = fac_j(d, W)
    bx = jax.tree.map(jnp.ones_like, jax.vmap(socp.primal_zeros)(d))
    by = jnp.ones_like(d.b)
    bz = jax.tree.map(jnp.ones_like, jax.vmap(socp.cone_h)(d))
    kkt_j = jax.jit(f_kkt_solve)

    rows = []

    def record(name, fn, fargs, reps=5):
        wall = bench_fn(fn, fargs, reps)
        try:
            ca = metrics.cost_analysis(fn, *fargs)
        except Exception:
            ca = {}
        flops = ca.get("flops", 0.0)
        byts = ca.get("bytes_accessed", 0.0)
        rows.append({
            "stage": name,
            "wall_ms": wall * 1e3,
            "gflops": flops / 1e9,
            "gbytes": byts / 1e9,
            "sol_compute": metrics.sol_fraction(flops, wall,
                                                peaks["f32_flops"]),
            "sol_hbm": metrics.sol_fraction(byts, wall, peaks["hbm_gbps"]),
        })

    record("discretize", disc_j, (pb, st))
    record("assemble", asm_j, (pb, st, disc))
    record(f"ipm_solve[{args.ipm_iters}it]", ipm_j, (d,), reps=2)
    record("merit(propagate)", merit_j, (pb, st))
    record("kkt_factorize", fac_j, (d, W))
    record("kkt_solve", kkt_j, (d, fac, W, bx, by, bz))
    record("scvx_iteration(e2e)", iter_j, (pb, st), reps=2)

    print(f"device={dev}  B={B}  K={args.K}  peaks={kind}")
    hdr = f"{'stage':<22} {'wall_ms':>9} {'GF':>8} {'GB':>8} " \
          f"{'SoL_f32':>8} {'SoL_hbm':>8}"
    print(hdr)
    for r in rows:
        print(f"{r['stage']:<22} {r['wall_ms']:>9.2f} {r['gflops']:>8.2f} "
              f"{r['gbytes']:>8.2f} {r['sol_compute']:>8.4f} "
              f"{r['sol_hbm']:>8.4f}")

    if args.profile_dir:
        with metrics.profile_trace(args.profile_dir):
            out = iter_j(pb, st)
            jax.block_until_ready(out)
        print("trace captured to", args.profile_dir)


if __name__ == "__main__":
    main()
