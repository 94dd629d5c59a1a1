"""Batched Monte-Carlo SCvx sweeps: vmap over scenarios, shard over the mesh.

SURVEY.md §2.3 P1/P2 and §3.4: the entire SCvx iteration (linearize + assemble +
IPM + accept) advances in lockstep across N dispersed scenarios under ``jax.vmap``,
with per-lane convergence masks (P8) built into ``scvx_iteration`` itself. Sharding
the scenario axis over a mesh makes the sweep span chips and hosts; the computation
is embarrassingly parallel except for the tiny metrics reductions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from successiveconvexification_tpu.config import SolverConfig
from successiveconvexification_tpu.models.base import Model
from successiveconvexification_tpu.ops.scvx import ScvxState, scvx_init, scvx_iteration
from successiveconvexification_tpu.parallel import mesh as mesh_lib


class BatchStats(NamedTuple):
    """Aggregated sweep metrics (psum-reduced across the mesh by jit)."""

    n_converged: jnp.ndarray
    n_total: jnp.ndarray
    mean_iterations: jnp.ndarray
    max_iterations: jnp.ndarray
    mean_sigma: jnp.ndarray
    max_nu_norm: jnp.ndarray


@functools.partial(jax.jit, static_argnums=(0, 2))
def solve_batch(model: Model, params_batch, cfg: SolverConfig) -> ScvxState:
    """Solve a batch of scenarios (params_batch leaves have leading batch axis).

    Returns the batched final ScvxState. Lanes that hit max_iters unconverged
    carry their best iterate (masked updates never regress a lane).
    """
    st0 = jax.vmap(lambda p: scvx_init(model, p, cfg))(params_batch)

    def cond(st: ScvxState):
        return jnp.any((~st.converged) & (st.iterations < cfg.scvx.max_iters))

    def body(st: ScvxState):
        if not cfg.ipm.warm_start:
            return jax.vmap(
                lambda p, s: scvx_iteration(model, p, cfg, s)
            )(params_batch, st)
        # one cheap all-reduce decides whether ANY lane needs the conelp
        # cold-init this iteration; the common all-warm case skips its extra
        # factorize + two KKT solves entirely. NOTE the cond sits at the
        # BATCH level on purpose: under vmap a per-lane cond inside ipm_solve
        # would lower to select and compute BOTH branches every iteration.
        # The price is compile-time only (two near-identical branch graphs),
        # amortized by the persistent compilation cache; the ~9% runtime of
        # the always-on cold init was real (BASELINE.md M4b).
        return jax.lax.cond(
            jnp.all(jnp.isfinite(st.ipm_carry.gap)),
            lambda s: jax.vmap(
                lambda p, x: scvx_iteration(model, p, cfg, x,
                                            assume_warm_valid=True)
            )(params_batch, s),
            lambda s: jax.vmap(
                lambda p, x: scvx_iteration(model, p, cfg, x)
            )(params_batch, s),
            st,
        )

    return jax.lax.while_loop(cond, body, st0)


def solve_batch_sharded(model: Model, params_batch, cfg: SolverConfig,
                        mesh: Optional[Mesh] = None) -> ScvxState:
    """Like solve_batch, with the scenario axis sharded over a device mesh (P2)."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    params_batch = mesh_lib.shard_scenario_tree(params_batch, mesh)
    return solve_batch(model, params_batch, cfg)


def batch_stats(st: ScvxState) -> BatchStats:
    conv = st.converged
    return BatchStats(
        n_converged=jnp.sum(conv.astype(jnp.int32)),
        n_total=jnp.asarray(conv.shape[0], jnp.int32),
        mean_iterations=jnp.mean(st.iterations.astype(jnp.float32)),
        max_iterations=jnp.max(st.iterations),
        mean_sigma=jnp.mean(st.sigma),
        max_nu_norm=jnp.max(st.nu_norm),
    )


def sample_dispersions(params, key, batch: int, *,
                       r_std=0.3, v_std=0.2, m_frac_std=0.05):
    """Monte-Carlo dispersion sampler: perturb initial position / velocity / wet
    mass (the BASELINE config-3/4 scenario generator). Deterministic in ``key``;
    lane RNG is folded from the scenario index, not wall clock (SURVEY §5)."""
    kr, kv, km = jax.random.split(key, 3)
    dtype = params.r_init.dtype

    def tile(leaf):
        return jnp.broadcast_to(leaf, (batch,) + jnp.shape(leaf))

    pb = jax.tree.map(tile, params)
    r0 = pb.r_init + r_std * jax.random.normal(kr, (batch, 3), dtype)
    v0 = pb.v_init + v_std * jax.random.normal(kv, (batch, 3), dtype)
    m0 = pb.m_wet * (1.0 + m_frac_std * jax.random.normal(km, (batch,), dtype))
    return pb.replace(r_init=r0, v_init=v0, m_wet=m0)
