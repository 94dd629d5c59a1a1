"""Multi-process jax.distributed bring-up over loopback (SURVEY §4.2).

Two CPU processes form a global 2-device mesh; a scenario-sharded sweep step
runs with jit-inserted cross-process collectives for the metrics reduction.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SCVX_SMALL_LA"] = "lax"
os.environ["XLA_FLAGS"] = ""  # drop the 8-virtual-device flag from the parent
pid = int(sys.argv[1])
import jax
jax.distributed.initialize("localhost:12391", num_processes=2, process_id=pid)
jax.config.update("jax_enable_x64", True)
import dataclasses
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, "/root/repo")
import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.ops.scvx import scvx_init, scvx_iteration

assert jax.process_count() == 2
devs = jax.devices()
assert len(devs) == 2, devs
mesh = Mesh(np.asarray(devs), ("scenario",))

model = pm.pointmass3dof_model()
params = pm.default_params(dtype=jnp.float64)
cfg = scvx.SolverConfig(
    dtype="float64",
    disc=scvx.DiscretizationConfig(K=8, substeps=3),
    ipm=scvx.IPMConfig(max_iters=10, refine_steps=1),
    scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=2),
)
B = 4
pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + jnp.shape(a)), params)
r0 = jnp.stack([params.r_init * (1.0 + 0.02 * i) for i in range(B)])
pb = pb.replace(r_init=r0)

sh = NamedSharding(mesh, P("scenario"))
pb = jax.tree.map(
    lambda a: jax.make_array_from_callback(
        a.shape, NamedSharding(mesh, P("scenario", *([None] * (a.ndim - 1)))),
        lambda idx: np.asarray(a[idx])),
    pb,
)

@jax.jit
def step(pb, states):
    states = jax.vmap(lambda p, s: scvx_iteration(model, p, cfg, s))(pb, states)
    mean_sigma = jnp.mean(states.sigma)  # cross-process psum via jit
    return states, mean_sigma

states = jax.jit(jax.vmap(lambda p: scvx_init(model, p, cfg)))(pb)
states, ms = step(pb, states)
print(f"proc{pid} OK mean_sigma={float(ms):.6f}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("SCVX_SKIP_MULTIPROC") == "1",
                    reason="explicitly disabled")
def test_two_process_sharded_sweep(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} OK" in out
    # both processes computed the same global reduction
    v0 = outs[0].split("mean_sigma=")[1].split()[0]
    v1 = outs[1].split("mean_sigma=")[1].split()[0]
    assert v0 == v1
