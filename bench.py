"""Headline benchmark: CONVERGED K=50 6-DoF SCvx solves/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline value is converged-solves/s: a batch of dispersed scenarios runs
until every lane certifies convergence (feasible + stationary, see
ScvxConfig.conv_tol_*) or the iteration budget is exhausted, and the rate is
(number of lanes with converged=True) / wall-clock. This measures the
north-star quantity (BASELINE.json: concurrent K=50 solves/s) — a lane only
counts if it actually solved its problem. vs_baseline divides by the per-chip
share of the 1000 solves/s target on a 16-chip v5p slice (62.5 /chip).

Secondary diagnostics in the same JSON object: fixed-budget throughput
(solves_per_s_raw), convergence statistics, iteration percentiles.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    import successiveconvexification_tpu as scvx
    from successiveconvexification_tpu.models import rocket6dof as rk
    from successiveconvexification_tpu.parallel.batch import (
        sample_dispersions,
        solve_batch,
    )

    import dataclasses
    import os

    B = int(os.environ.get("BENCH_BATCH", "256"))
    n_scvx = int(os.environ.get("BENCH_SCVX_ITERS", "60"))
    n_ipm = int(os.environ.get("BENCH_IPM_ITERS", "15"))
    # Pallas VMEM KKT kernels: measured 1.5x end-to-end on v5e (BASELINE.md),
    # default-on for the TPU bench; BENCH_USE_PALLAS=0 reverts to XLA smallla
    use_pallas = os.environ.get("BENCH_USE_PALLAS", "1") == "1"
    cfg = scvx.SolverConfig(
        dtype="float32",
        disc=scvx.DiscretizationConfig(K=50, substeps=8),
        ipm=scvx.IPMConfig(max_iters=n_ipm, refine_steps=1, warm_start=True,
                           use_pallas=use_pallas),
        scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=n_scvx),
    )
    model = scvx.rocket6dof_model()
    params = rk.default_params(dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    pb = sample_dispersions(params, key, B, r_std=0.2, v_std=0.1, m_frac_std=0.03)

    # warmup/compile. NOTE: the axon tunnel can return from block_until_ready
    # before remote execution finishes — a host transfer (jnp.sum -> float) is
    # the only honest completion barrier here.
    out = solve_batch(model, pb, cfg)
    _ = float(jnp.sum(out.X))

    t0 = time.perf_counter()
    reps = int(os.environ.get("BENCH_REPS", "2"))
    for i in range(reps):
        out = solve_batch(model, pb, cfg)
        _ = float(jnp.sum(out.X))
    dt = (time.perf_counter() - t0) / reps

    n_conv = int(jnp.sum(out.converged))
    conv_solves_per_s = n_conv / dt
    iters = jnp.asarray(out.iterations)
    result = {
        "metric": "6dof_k50_converged_scvx_solves_per_s_per_chip",
        "value": round(conv_solves_per_s, 2),
        "unit": "converged solves/s/chip",
        "vs_baseline": round(conv_solves_per_s / 62.5, 3),
        "batch": B,
        "converged": n_conv,
        "scvx_iter_budget": n_scvx,
        "wall_s_per_batch": round(dt, 4),
        "solves_per_s_raw": round(B / dt, 2),
        "iters_p50": int(jnp.percentile(iters, 50)),
        "iters_p90": int(jnp.percentile(iters, 90)),
        "iters_max": int(jnp.max(iters)),
        "mean_defect_l1": float(jnp.mean(out.defect_nl)),
        "max_defect_l1": float(jnp.max(out.defect_nl)),
        "mean_viol": float(jnp.mean(out.viol_nl)),
        "mean_sigma": float(jnp.mean(out.sigma)),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
