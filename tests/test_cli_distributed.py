"""The SHIPPED CLI's multi-host path (VERDICT r2 item 6): a 2-process
loopback ``scvx sweep --distributed`` run — jax.distributed bring-up, scenario
mesh over both processes' devices, periodic sharded checkpointing, and
resume-on-restart — all reachable from the command line, not just test code.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_env():
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "SCVX_SMALL_LA": "lax",
        "XLA_FLAGS": "",      # drop the parent's 8-virtual-device flag
        "PYTHONPATH": REPO,
    })
    return env


def _run_sweep_pair(ckpt: str, port: int, extra=()):
    base = [
        sys.executable, "-m", "successiveconvexification_tpu.cli", "sweep",
        "--model", "pointmass3dof", "--batch", "8", "--seed", "1",
        "--checkpoint", ckpt, "--ckpt-every", "2",
        "--distributed", "--coordinator", f"localhost:{port}",
        "--num-processes", "2",
        "--disc.K=8", "--disc.substeps=3",
        "--ipm.max_iters=10", "--scvx.max_iters=5",
    ]
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(i)] + list(extra),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_cli_env(), cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
    return outs


@pytest.mark.skipif(os.environ.get("SCVX_SKIP_MULTIPROC") == "1",
                    reason="explicitly disabled")
def test_cli_distributed_sweep_with_checkpoint_and_resume(tmp_path):
    # dynamic ports: a fixed pair collides with TIME_WAIT sockets from any
    # earlier run of this test in the same CI session
    base_port = 20000 + (os.getpid() % 2000)
    ckpt = str(tmp_path / "sweep_ck")
    outs = _run_sweep_pair(ckpt, base_port)

    # process 0 prints the sweep stats computed over the GLOBAL batch
    rec = json.loads("{" + outs[0].split("{", 1)[1].rsplit("}", 1)[0] + "}")
    assert rec["n_total"] == 8
    assert rec["mean_iterations"] > 0

    # each process committed its own shard file with step metadata
    import numpy as np
    for pid in (0, 1):
        f = f"{ckpt}.shard{pid}.npz"
        assert os.path.exists(f), f
        z = np.load(f, allow_pickle=False)
        assert json.loads(str(z["_meta"]))["step"] >= 2

    # resume-on-restart: a fresh ensemble restores the finished sweep and
    # exits immediately (every lane already terminal) with the same stats
    outs2 = _run_sweep_pair(ckpt, base_port + 1)
    rec2 = json.loads("{" + outs2[0].split("{", 1)[1].rsplit("}", 1)[0] + "}")
    assert rec2["n_total"] == rec["n_total"]
    assert rec2["mean_iterations"] == rec["mean_iterations"]
