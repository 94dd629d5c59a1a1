"""Measure the effect of Ruiz equilibration on IPM iteration counts.

Runs the flagship 6-DoF K=50 SCvx path twice (equilibrate on / off) and
reports per-SCvx-iteration IPM iteration counts and final quality — the
diagnostic VERDICT r1 item 6 asks for. CPU f32 mirrors the TPU precision
regime; run with:

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/equilibration_study.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops.scvx import scvx_init, scvx_iteration


def run(equilibrate: bool, n_iters: int = 20, K: int = 50):
    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=jnp.float32)
    cfg = scvx.SolverConfig(
        dtype="float32",
        disc=scvx.DiscretizationConfig(K=K, substeps=8),
        ipm=scvx.IPMConfig(max_iters=25, refine_steps=1, warm_start=True,
                           equilibrate=equilibrate),
        scvx=dataclasses.replace(scvx.ScvxConfig(), max_iters=n_iters),
    )
    it = jax.jit(lambda p, s: scvx_iteration(model, p, cfg, s))
    st = scvx_init(model, params, cfg)
    ipm_iters = []
    for _ in range(n_iters):
        st = it(params, st)
        ipm_iters.append(int(st.ipm_iters))
        if bool(st.converged):
            break
    return {
        "equilibrate": equilibrate,
        "scvx_iters_run": len(ipm_iters),
        "converged": bool(st.converged),
        "ipm_iters_per_scvx": ipm_iters,
        "ipm_iters_total": sum(ipm_iters),
        "final_defect_l1": float(st.defect_nl),
        "final_viol": float(st.viol_nl),
        "final_sigma": float(st.sigma),
    }


if __name__ == "__main__":
    for eq in (False, True):
        print(json.dumps(run(eq)))
