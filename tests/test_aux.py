"""Aux subsystems: checkpoint/resume, metrics, CLI, warm-start replanning."""

import dataclasses
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.io import checkpoint as ckpt
from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.ops.scvx import (
    scvx_init,
    scvx_iteration,
    scvx_warm_start,
)
from successiveconvexification_tpu.utils.metrics import JsonlLogger, cost_analysis

F64 = jnp.float64


@pytest.fixture(scope="module")
def small_cfg():
    return scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=10, substeps=4),
        ipm=scvx.IPMConfig(max_iters=20, refine_steps=1),
        scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=25),
    )


@pytest.fixture(scope="module")
def solved(small_cfg):
    # run the cold solve long enough to actually converge (defect ~1e-3);
    # the replanning test warm-starts from this endpoint and its quality
    # gate assumes a genuinely solved base trajectory
    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    it = jax.jit(lambda p, s: scvx_iteration(model, p, small_cfg, s))
    st = scvx_init(model, params, small_cfg)
    for _ in range(25):
        st = it(params, st)
    return model, params, st


def test_checkpoint_roundtrip(tmp_path, solved, small_cfg):
    model, params, st = solved
    path = str(tmp_path / "ck")
    ckpt.save(path, st, cfg=small_cfg, step=3)
    like = jax.tree.map(jnp.zeros_like, st)
    st2 = ckpt.restore(path, like, cfg=small_cfg)
    np.testing.assert_allclose(np.asarray(st2.X), np.asarray(st.X))
    assert float(st2.sigma) == float(st.sigma)


def test_checkpoint_config_mismatch_raises(tmp_path, solved, small_cfg):
    model, params, st = solved
    path = str(tmp_path / "ck2")
    ckpt.save(path, st, cfg=small_cfg)
    other = small_cfg.replace(dtype="float32")
    like = jax.tree.map(jnp.zeros_like, st)
    if os.path.exists(path + ".meta.json"):
        with pytest.raises(ValueError):
            ckpt.restore(path, like, cfg=other)


def test_warm_start_replanning(solved, small_cfg):
    """A perturbed problem warm-started from the previous solution reaches
    better quality than the converged cold start in a much smaller budget —
    the replanning path the framework advertises."""
    model, params, st = solved
    params2 = params.replace(r_init=params.r_init + jnp.asarray([0.1, -0.1, 0.05]))
    it = jax.jit(lambda p, s: scvx_iteration(model, p, small_cfg, s))

    warm = scvx_warm_start(model, params2, small_cfg, st.X, st.U, st.sigma)
    # BCs rewritten to the new initial state
    np.testing.assert_allclose(np.asarray(warm.X[0, 1:4]),
                               np.asarray(params2.r_init), atol=1e-12)
    # warm-start radius is scaled to the BC-perturbation defect, not tr_init
    assert float(warm.tr_radius) < small_cfg.scvx.tr_init
    for _ in range(10):
        warm = it(params2, warm)
    assert float(warm.defect_nl) < 2e-3
    assert float(warm.viol_nl) < 1e-3


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = JsonlLogger(path, manifest={"run": "test"})
    lg.log({"a": 1, "b": jnp.asarray(2.5)})
    lg.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["_manifest"]["run"] == "test"
    assert lines[1]["b"] == 2.5


def test_cost_analysis_helper():
    out = cost_analysis(lambda x: x @ x, jnp.ones((64, 64)))
    assert out.get("flops", 0) > 0


def test_cli_solve_smoke(tmp_path):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               SCVX_SMALL_LA="lax",
               PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    out = subprocess.run(
        [sys.executable, "-m", "successiveconvexification_tpu.cli", "solve",
         "--model", "pointmass3dof", "--K", "8", "--dtype", "float64",
         "--out", str(tmp_path / "t.npz"),
         "--scvx.max_iters=4", "--ipm.max_iters=12", "--disc.substeps=3"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    data = np.load(tmp_path / "t.npz")
    assert data["X"].shape == (8, 7)


def test_plotting(tmp_path, solved):
    model, params, st = solved
    from successiveconvexification_tpu.utils.plotting import plot_trajectory

    p = str(tmp_path / "traj.png")
    plot_trajectory(st.X, st.U, st.sigma, params=params, path=p)
    assert os.path.getsize(p) > 10000


def test_animation(tmp_path, solved):
    model, params, st = solved
    from successiveconvexification_tpu.utils.plotting import animate_trajectory

    p = str(tmp_path / "traj.gif")
    animate_trajectory(st.X, st.U, st.sigma, params=params, path=p, fps=5)
    assert os.path.getsize(p) > 10000


def test_deterministic_resume_equals_uninterrupted(tmp_path, small_cfg):
    """SURVEY §5 failure recovery: resume-from-checkpoint must reproduce the
    uninterrupted sweep exactly (deterministic carry, no wall-clock state)."""
    from successiveconvexification_tpu.parallel.batch import sample_dispersions

    model = pm.pointmass3dof_model()
    params = pm.default_params(dtype=F64)
    pb = sample_dispersions(params, jax.random.PRNGKey(7), 4)
    it = jax.jit(jax.vmap(lambda p, s: scvx_iteration(model, p, small_cfg, s)))
    st = jax.jit(jax.vmap(lambda p: scvx_init(model, p, small_cfg)))(pb)

    for _ in range(3):
        st = it(pb, st)
    path = str(tmp_path / "mid")
    ckpt.save(path, st, cfg=small_cfg, step=3)

    # uninterrupted continuation
    st_a = st
    for _ in range(3):
        st_a = it(pb, st_a)

    # simulated failure: restore into a fresh process-equivalent state
    like = jax.tree.map(jnp.zeros_like, st)
    st_b = ckpt.restore(path, like, cfg=small_cfg)
    st_b = jax.tree.map(jnp.asarray, st_b)
    for _ in range(3):
        st_b = it(pb, st_b)

    np.testing.assert_array_equal(np.asarray(st_a.X), np.asarray(st_b.X))
    np.testing.assert_array_equal(np.asarray(st_a.sigma), np.asarray(st_b.sigma))


def test_sharded_restore_refuses_missing_tiles(tmp_path, solved):
    """A shard file that lost a leaf's tiles (host died mid-write) must make
    restore raise — zero-filling would fabricate recovered state. Also: the
    atomic-save tmp file must never be picked up as a shard."""
    import glob

    import numpy as np

    from successiveconvexification_tpu.io import checkpoint as ckpt

    model, params, st = solved
    path = str(tmp_path / "sweep")
    ckpt.save_sharded(path, st, step=3)
    files = glob.glob(f"{path}.shard*.npz")
    assert len(files) == 1

    # leftover tmp from an interrupted save is ignored by restore's glob
    with open(files[0] + ".tmp", "wb") as fh:
        fh.write(b"garbage")

    like = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), st)
    out = ckpt.restore_sharded(path, like)
    np.testing.assert_array_equal(np.asarray(out.X), np.asarray(st.X))

    # drop every blob of leaf 0 (X) from the shard file -> restore must raise
    z = np.load(files[0], allow_pickle=False)
    kept = {k: z[k] for k in z.files if not k.startswith("leaf0|")}
    np.savez(files[0].replace(".npz", "") , **kept)  # np appends .npz
    with pytest.raises(ValueError, match="do not cover"):
        ckpt.restore_sharded(path, like)
