"""Mesh/sharding tests on the 8-virtual-device CPU backend (SURVEY §4.2
'Distributed, fake backend')."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.parallel import mesh as mesh_lib
from successiveconvexification_tpu.parallel.batch import (
    batch_stats,
    sample_dispersions,
    solve_batch,
    solve_batch_sharded,
)

F64 = jnp.float64


@pytest.fixture(scope="module")
def small_cfg():
    return scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=8, substeps=3),
        ipm=scvx.IPMConfig(max_iters=12, refine_steps=1),
        scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=4),
    )


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_sweep_runs_and_matches_unsharded(small_cfg):
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    B = 16
    pb = sample_dispersions(params, jax.random.PRNGKey(0), B,
                            r_std=0.2, v_std=0.1, m_frac_std=0.02)
    mesh = mesh_lib.make_mesh()
    out_sharded = solve_batch_sharded(model, pb, small_cfg, mesh=mesh)
    out_local = solve_batch(model, pb, small_cfg)
    np.testing.assert_allclose(
        np.asarray(out_sharded.sigma), np.asarray(out_local.sigma), atol=1e-8
    )
    # outputs actually live on the mesh
    shard_devs = {s.device for s in out_sharded.X.addressable_shards}
    assert len(shard_devs) == 8


def test_batch_stats_reduce(small_cfg):
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    pb = sample_dispersions(params, jax.random.PRNGKey(1), 8)
    out = solve_batch(model, pb, small_cfg)
    stats = batch_stats(out)
    assert int(stats.n_total) == 8
    assert 0 <= int(stats.n_converged) <= 8
    assert np.isfinite(float(stats.mean_sigma))


def test_graft_entry_single_and_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.X)
    assert bool(jnp.all(jnp.isfinite(out.X)))

    mod.dryrun_multichip(8)
