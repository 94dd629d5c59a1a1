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

    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(repo_root, "__graft_entry__.py")
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
    from successiveconvexification_tpu.ops.smallla import (
        blocktridiag_factor as _blocktridiag_factor,
        blocktridiag_solve as _blocktridiag_solve,
    )
    from successiveconvexification_tpu.parallel.kkt_sharded import (
        solve_blocktridiag_ksharded,
    )

    mesh = mesh_lib.make_mesh(axes=("kkt",))
    rng = np.random.default_rng(0)
    # N=48 divides the 8 shards; N=49 (the flagship K-1, prime) and N=10
    # exercise the identity-block padding path
    for N in (48, 49, 10):
        nx = 7
        O = jnp.asarray(rng.standard_normal((N - 1, nx, nx)))
        Dsym = rng.standard_normal((N, nx, nx))
        D = jnp.asarray(Dsym @ np.swapaxes(Dsym, 1, 2)) + (
            4.0 * nx * jnp.eye(nx)[None]
        )
        rhs = jnp.asarray(rng.standard_normal((N, nx)))

        u_ref = _blocktridiag_solve(*_blocktridiag_factor(D, O), rhs)
        u_sh = solve_blocktridiag_ksharded(D, O, rhs, mesh=mesh, axis="kkt")
        np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                                   rtol=1e-9, atol=1e-9, err_msg=f"N={N}")


def test_4096_lane_shapes_sharding_masking():
    """4096-lane smoke of the config-4 LANE COUNT: one masked SCvx iteration
    at tiny K, sharded over the 8-virtual-device mesh. This validates
    shapes/sharding/masking at production lane count ONLY — converged-sweep
    SEMANTICS at scale are covered by the (smaller, fully-converged)
    sharded==unsharded gates above; the converged THROUGHPUT at scale is a
    hardware benchmark (bench.py), not a CPU test."""
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=jnp.float32)
    cfg = scvx.SolverConfig(
        dtype="float32",
        disc=scvx.DiscretizationConfig(K=5, substeps=1),
        ipm=scvx.IPMConfig(max_iters=2, refine_steps=0),
        scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=1),
    )
    B = 4096
    pb = sample_dispersions(params, jax.random.PRNGKey(7), B,
                            r_std=0.2, v_std=0.1, m_frac_std=0.02)
    mesh = mesh_lib.make_mesh()
    out = solve_batch_sharded(model, pb, cfg, mesh=mesh)
    stats = batch_stats(out)
    assert out.X.shape == (B, 5, 7)
    assert int(stats.n_total) == B
    assert bool(jnp.all(jnp.isfinite(out.sigma)))
    assert len({s.device for s in out.X.addressable_shards}) == 8


def test_ksharded_ipm_matches_scan_on_flagship_subproblem():
    """kkt_solver="ksharded" inside the REAL solver: the first flagship-scale
    (K=50) 6-DoF subproblem solved with the cross-chip substructured KKT on an
    8-virtual-device mesh must match the local scan backend."""
    from successiveconvexification_tpu.models import rocket6dof as rk
    from successiveconvexification_tpu.ops import ipm, socp
    from successiveconvexification_tpu.ops.discretize import discretize
    from successiveconvexification_tpu.ops.scvx import scvx_init
    from successiveconvexification_tpu.parallel import kkt_sharded

    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=50, substeps=3),
        # 45-iter budget: the equilibrated cold solve needs 31 iterations to
        # cross tol_gap=1e-7 (the raw-space one needed 29); the while_loop
        # exits on convergence so headroom is free
        ipm=scvx.IPMConfig(max_iters=45, refine_steps=1),
    )
    st = scvx_init(model, params, cfg)
    d = socp.assemble(
        model, cfg.scvx, params,
        discretize(model, params, st.X, st.U, st.sigma, substeps=3),
        st.X, st.U, st.sigma, st.tr_radius, True, st.penalty_scale,
    )

    sol_scan = jax.jit(lambda d: ipm.ipm_solve(d, cfg.ipm))(d)

    mesh = mesh_lib.make_mesh(axes=("kkt",))
    kkt_sharded.set_kkt_mesh(mesh, "kkt")
    try:
        cfg_sh = dataclasses.replace(cfg.ipm, kkt_solver="ksharded")
        sol_sh = jax.jit(lambda d: ipm.ipm_solve(d, cfg_sh))(d)
    finally:
        kkt_sharded.set_kkt_mesh(None)

    assert bool(sol_scan.converged) and bool(sol_sh.converged)
    np.testing.assert_allclose(
        np.asarray(sol_sh.x.w), np.asarray(sol_scan.x.w), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        float(sol_sh.x.sig), float(sol_scan.x.sig), atol=1e-8
    )


def test_compact_device_under_mesh(small_cfg):
    """Device-side tail compaction composes with P2 sharding (VERDICT r2
    item 5 'works under an 8-virtual-device mesh'): a scenario-sharded batch
    run through solve_batch_compact_device matches the plain local sweep."""
    from successiveconvexification_tpu.parallel.batch import (
        solve_batch_compact_device,
    )

    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    B = 16
    pb = sample_dispersions(params, jax.random.PRNGKey(3), B,
                            r_std=0.2, v_std=0.1, m_frac_std=0.02)
    out_local = solve_batch(model, pb, small_cfg)

    mesh = mesh_lib.make_mesh()
    pb_sh = mesh_lib.shard_scenario_tree(pb, mesh)
    out_c = solve_batch_compact_device(model, pb_sh, small_cfg,
                                       chunk=2, min_bucket=8)
    np.testing.assert_array_equal(
        np.asarray(out_c.converged), np.asarray(out_local.converged))
    np.testing.assert_allclose(
        np.asarray(out_c.sigma), np.asarray(out_local.sigma), atol=1e-8)


def test_sharded_hard_tr_converged_equivalence():
    """The SHIPPED default mode (hard TR) gets its own sharded==unsharded
    gate (VERDICT r2 item 7). Hard-TR accept decisions sit on fp knife edges
    where sharded-vs-local reduction order can flip a branch and diverge a
    lane's PATH (measured sigma drift 0.42 at a fixed 30-iteration budget on
    the pointmass creep problem) — so the gate compares the CONVERGED
    solutions of a problem that genuinely converges under the default
    schedule: the 6-DoF rocket at a short horizon. Every lane must converge
    in both runs, be fully feasible, and land at the same time-of-flight and
    trajectory within solver tolerance."""
    from successiveconvexification_tpu.models import rocket6dof as rk

    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=10, substeps=3),
        ipm=scvx.IPMConfig(max_iters=20, refine_steps=1),
        scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=45),
    )
    assert cfg.scvx.tr_mode == "hard"   # the shipped default
    B = 8
    pb = sample_dispersions(params, jax.random.PRNGKey(7), B,
                            r_std=0.1, v_std=0.05, m_frac_std=0.02)
    out_local = solve_batch(model, pb, cfg)
    mesh = mesh_lib.make_mesh()
    out_sh = solve_batch_sharded(model, pb, cfg, mesh=mesh)

    conv_l = np.asarray(out_local.converged)
    conv_s = np.asarray(out_sh.converged)
    assert conv_l.all(), f"local: {conv_l.sum()}/{B} converged"
    assert conv_s.all(), f"sharded: {conv_s.sum()}/{B} converged"
    # same optimum per lane: time of flight agrees to solver tolerance
    np.testing.assert_allclose(
        np.asarray(out_sh.sigma), np.asarray(out_local.sigma),
        rtol=5e-3, atol=5e-3)
    # both runs certify full feasibility
    assert float(jnp.max(out_sh.defect_nl + out_sh.viol_nl)) < 1e-4
    assert float(jnp.max(out_local.defect_nl + out_local.viol_nl)) < 1e-4
