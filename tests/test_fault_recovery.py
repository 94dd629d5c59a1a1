"""Fault injection + multi-host recovery (SURVEY §5 "Failure detection").

Three phases over a 2-process loopback ``jax.distributed`` mesh:

  1. FULL:   uninterrupted 4-step scenario-sharded sweep; each process prints
             the SHA-256 digest of its local shard bytes after every step.
  2. CRASH:  same sweep, but process 1 hard-exits (``os._exit``) right after
             the step-2 sharded checkpoint — an uncoordinated failure.
             Process 0 blocks in the next cross-process reduction and is
             killed by the parent BY EXACT PID.
  3. RESUME: a fresh 2-process ensemble restores the sharded checkpoint
             (``io.checkpoint.restore_sharded`` — shard-by-shard, no
             host-gather) and runs the remaining steps.

The digests of RESUME's final state must equal FULL's — bitwise recovery.
"""

import hashlib
import os
import subprocess
import sys
import time

import pytest

_WORKER = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SCVX_SMALL_LA"] = "lax"
os.environ["XLA_FLAGS"] = ""  # drop the 8-virtual-device flag from the parent
pid = int(sys.argv[1])
mode = sys.argv[2]           # full | crash | resume
port = sys.argv[3]
ckpt = sys.argv[4]
repo_root = sys.argv[5]
import jax
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
jax.config.update("jax_enable_x64", True)
import dataclasses, hashlib
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, repo_root)
import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.io import checkpoint as ckpt_lib
from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.ops.scvx import scvx_init, scvx_iteration

devs = jax.devices()
assert len(devs) == 2, devs
mesh = Mesh(np.asarray(devs), ("scenario",))

model = pm.pointmass3dof_model()
params = pm.default_params(dtype=jnp.float64)
cfg = scvx.SolverConfig(
    dtype="float64",
    disc=scvx.DiscretizationConfig(K=8, substeps=3),
    ipm=scvx.IPMConfig(max_iters=10, refine_steps=1),
    scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=8),
)
B = 4
pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + jnp.shape(a)), params)
r0 = jnp.stack([params.r_init * (1.0 + 0.02 * i) for i in range(B)])
pb = pb.replace(r_init=r0)
pb = jax.tree.map(
    lambda a: jax.make_array_from_callback(
        a.shape, NamedSharding(mesh, P("scenario", *([None] * (a.ndim - 1)))),
        lambda idx: np.asarray(a[idx])),
    pb,
)

@jax.jit
def step(pb, states):
    states = jax.vmap(lambda p, s: scvx_iteration(model, p, cfg, s))(pb, states)
    return states, jnp.mean(states.sigma)   # cross-process psum every step

def digest(states):
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(states):
        for sh in sorted(leaf.addressable_shards,
                         key=lambda s: str(s.index)):
            h.update(np.asarray(sh.data).tobytes())
    return h.hexdigest()

init = jax.jit(jax.vmap(lambda p: scvx_init(model, p, cfg)))
N_CKPT, N_TOTAL = 2, 4

if mode in ("full", "crash"):
    states = init(pb)
    for i in range(N_TOTAL):
        states, ms = step(pb, states)
        jax.block_until_ready(ms)
        if i == N_CKPT - 1:
            ckpt_lib.save_sharded(ckpt, states, cfg=cfg, step=i + 1)
            if mode == "crash" and pid == 1:
                os._exit(9)     # uncoordinated mid-sweep failure
    print(f"proc{pid} digest={digest(states)}", flush=True)
else:  # resume
    like = init(pb)             # shapes + shardings only
    states = ckpt_lib.restore_sharded(ckpt, like, cfg=cfg)
    for i in range(N_CKPT, N_TOTAL):
        states, ms = step(pb, states)
        jax.block_until_ready(ms)
    print(f"proc{pid} digest={digest(states)}", flush=True)
"""


def _run_pair(tmp_path, mode: str, port: int, expect_fail: bool = False):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    ckpt = str(tmp_path / "sweep_ckpt")
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), mode, str(port), ckpt,
             os.path.dirname(os.path.dirname(os.path.abspath(__file__)))],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [None, None]
    if expect_fail:
        # proc1 self-destructs; proc0 blocks in the next collective -> kill
        # it by EXACT PID once the checkpoint files exist and proc1 is gone
        outs[1] = procs[1].communicate(timeout=420)[0]
        deadline = time.time() + 120
        while time.time() < deadline and not (
            os.path.exists(ckpt + ".shard0.npz")
            and os.path.exists(ckpt + ".shard1.npz")
        ):
            time.sleep(1.0)
        time.sleep(2.0)          # let proc0 reach (and block in) the psum
        procs[0].kill()          # exact PID of the process we spawned
        outs[0] = procs[0].communicate(timeout=60)[0]
        assert procs[1].returncode == 9, outs[1][-2000:]
    else:
        for i, p in enumerate(procs):
            outs[i] = p.communicate(timeout=420)[0]
        for i, p in enumerate(procs):
            assert p.returncode == 0, f"proc{i} ({mode}):\n{outs[i][-3000:]}"
    return outs


def _digests(outs):
    return sorted(o.split("digest=")[1].split()[0] for o in outs)


@pytest.mark.skipif(os.environ.get("SCVX_SKIP_MULTIPROC") == "1",
                    reason="explicitly disabled")
def test_kill_one_process_resume_bitwise(tmp_path):
    import shutil

    (tmp_path / "full").mkdir()
    (tmp_path / "crash").mkdir()
    (tmp_path / "resume").mkdir()
    full = _run_pair(tmp_path / "full", "full", 12491)
    _run_pair(tmp_path / "crash", "crash", 12492, expect_fail=True)
    # recover from the CRASHED run's checkpoint in a fresh ensemble
    for s in ("0", "1"):
        shutil.copy(
            str(tmp_path / "crash" / f"sweep_ckpt.shard{s}.npz"),
            str(tmp_path / "resume" / f"sweep_ckpt.shard{s}.npz"),
        )
    resume = _run_pair(tmp_path / "resume", "resume", 12493)
    assert _digests(resume) == _digests(full)
