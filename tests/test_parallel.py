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
        # soft mode for the strict sharded==unsharded comparison: hard-TR
        # accept/reject decisions sit on knife edges where reduction-order fp
        # noise between sharded and local execution can flip a branch and
        # diverge a lane (not a sharding bug; observed 2.8e-6 on 1/16 lanes)
        scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=4, tr_mode="soft"),
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


def test_ksharded_blocktridiag_matches_local():
    """P3/P4: the K-sharded substructuring solve equals the local scan solve
    on a random SPD block-tridiagonal system sharded over 8 devices."""
    from successiveconvexification_tpu.ops.ipm import (
        _blocktridiag_factor,
        _blocktridiag_solve,
    )
    from successiveconvexification_tpu.parallel.kkt_sharded import (
        solve_blocktridiag_ksharded,
    )

    N, nx = 48, 7
    rng = np.random.default_rng(0)
    # build SPD block tridiag: M = A A' + N*I restricted to tridiag pattern
    # simpler: random couplings + diagonally-dominant diagonal blocks
    O = jnp.asarray(rng.standard_normal((N - 1, nx, nx)))
    Dsym = rng.standard_normal((N, nx, nx))
    D = jnp.asarray(Dsym @ np.swapaxes(Dsym, 1, 2)) + (
        4.0 * nx * jnp.eye(nx)[None]
    )
    rhs = jnp.asarray(rng.standard_normal((N, nx)))

    u_ref = _blocktridiag_solve(*_blocktridiag_factor(D, O), rhs)

    mesh = mesh_lib.make_mesh(axes=("kkt",))
    u_sh = solve_blocktridiag_ksharded(D, O, rhs, mesh=mesh, axis="kkt")
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-9, atol=1e-9)

    # shape guard: indivisible N raises
    with pytest.raises(ValueError):
        solve_blocktridiag_ksharded(D[:10], O[:9], rhs[:10], mesh=mesh)
