"""Nominal-seeded sweep gates (parallel.batch.solve_batch_seeded).

The production dispersion-analysis mode must (a) converge every lane, (b)
land on the same trajectories as the cold sweep (same problem, same gates —
the warm start may pick a different but equally-valid local iterate path,
so the comparison is on solution QUALITY metrics, not bitwise states), and
(c) actually spend fewer iterations per lane than the cold sweep.
"""

import jax
import jax.numpy as jnp

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.parallel.batch import (
    sample_dispersions,
    solve_batch,
    solve_batch_seeded,
)

F64 = jnp.float64


def _cfg(K=14):
    return scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=K, substeps=4),
        ipm=scvx.IPMConfig(max_iters=25, warm_start=True),
    )


def test_seeded_sweep_converges_with_fewer_iterations():
    cfg = _cfg()
    params = rk.default_params(dtype=F64)
    pb = sample_dispersions(params, jax.random.PRNGKey(3), 4,
                            r_std=0.15, v_std=0.08, m_frac_std=0.02)

    cold = solve_batch(rk.rocket6dof_model(), pb, cfg)
    seeded = solve_batch_seeded(rk.rocket6dof_model(), pb, cfg,
                                nominal_params=params, min_bucket=4)

    assert bool(jnp.all(cold.converged))
    assert bool(jnp.all(seeded.converged))
    # same feasibility class: defect + violation inside the gates both ways
    assert float(jnp.max(seeded.defect_nl)) < cfg.scvx.conv_tol_feas
    # same solution quality: time-of-flight within the objective's own
    # stationarity tolerance class (local SCvx iterates, not bitwise paths)
    assert float(jnp.max(jnp.abs(seeded.sigma - cold.sigma))) < 5e-2, (
        seeded.sigma, cold.sigma)
    # the point of seeding: fewer iterations per lane (strict on the mean)
    assert float(jnp.mean(seeded.iterations)) < float(
        jnp.mean(cold.iterations)), (seeded.iterations, cold.iterations)
