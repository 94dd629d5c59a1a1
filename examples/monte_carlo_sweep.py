"""Example: dispersed Monte-Carlo landing sweep with metrics and checkpointing.

Run (TPU or CPU):
    python examples/monte_carlo_sweep.py --batch 64 --iters 20
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.io import checkpoint as ckpt
from successiveconvexification_tpu.parallel.batch import (
    batch_stats,
    sample_dispersions,
    solve_batch,
)
from successiveconvexification_tpu.utils.metrics import JsonlLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = scvx.SolverConfig(
        dtype="float32" if jax.default_backend() != "cpu" else "float64",
        disc=scvx.DiscretizationConfig(K=30, substeps=6),
        ipm=scvx.IPMConfig(max_iters=18, refine_steps=1),
        scvx=dataclasses.replace(
            scvx.ScvxConfig(), max_iters=args.iters, w_feas=1000.0, tr_init=0.1
        ),
    )
    if cfg.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    model = scvx.rocket6dof_model()
    params = rk.default_params(dtype=jnp.dtype(cfg.dtype))
    pb = sample_dispersions(params, jax.random.PRNGKey(args.seed), args.batch,
                            r_std=0.25, v_std=0.15, m_frac_std=0.04)

    logger = JsonlLogger("sweep_metrics.jsonl", manifest={
        "devices": [str(d) for d in jax.devices()], "config": cfg.to_dict(),
    })

    t0 = time.perf_counter()
    out = solve_batch(model, pb, cfg)
    _ = float(jnp.sum(out.X))  # completion barrier
    dt = time.perf_counter() - t0

    stats = batch_stats(out)
    rec = {
        "batch": args.batch,
        "wall_s": round(dt, 2),
        "solves_per_s": round(args.batch / dt, 2),
        "mean_sigma": float(stats.mean_sigma),
        "mean_defect": float(jnp.mean(out.defect_nl)),
        "worst_defect": float(jnp.max(out.defect_nl)),
        "mean_final_mass": float(jnp.mean(out.X[:, -1, 0])),
    }
    logger.log(rec)
    logger.close()
    print(rec)

    ckpt.save("sweep_ck", out, cfg=cfg)
    print("checkpointed to sweep_ck*")


if __name__ == "__main__":
    main()
