"""Per-iteration telemetry for the flagship K=50 6-DoF solve (debugging aid).

Usage:
  python examples/debug_flagship.py [--dtype float32] [--iters 50] [--batch 0]
  JAX_PLATFORMS=cpu python examples/debug_flagship.py --dtype float64
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops.scvx import scvx_init, scvx_iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--K", type=int, default=50)
    ap.add_argument("--ipm-iters", type=int, default=20)
    ap.add_argument("--lane", type=int, default=-1,
                    help=">=0: run a dispersed lane instead of nominal")
    ap.add_argument("--set", action="append", default=[],
                    help="scvx config override k=v (float)")
    args = ap.parse_args()

    model = rk.rocket6dof_model()
    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    params = rk.default_params(dtype=dtype)
    if args.lane >= 0:
        from successiveconvexification_tpu.parallel.batch import sample_dispersions
        pb = sample_dispersions(params, jax.random.PRNGKey(0), 256)
        params = jax.tree.map(lambda a: a[args.lane], pb)

    import dataclasses
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=")
        overrides[k] = float(v)
    cfg = scvx.SolverConfig(
        dtype=args.dtype,
        disc=scvx.DiscretizationConfig(K=args.K, substeps=8),
        ipm=scvx.IPMConfig(max_iters=args.ipm_iters, refine_steps=1),
        scvx=dataclasses.replace(scvx.ScvxConfig(), **overrides),
    )

    it = jax.jit(lambda p, s: scvx_iteration(model, p, cfg, s))
    st = scvx_init(model, params, cfg)
    print(f"{'it':>3} {'acc':>3} {'rho':>9} {'tr':>9} {'defect':>10} "
          f"{'viol':>9} {'sigma':>8} {'J':>10} {'pred':>10} {'dx':>9} "
          f"{'gap':>8} {'ki':>3} {'pen':>6} {'cv':>2}")
    for i in range(args.iters):
        st = it(params, st)
        print(f"{i:>3} {int(st.accepted):>3} {float(st.rho):>9.3f} "
              f"{float(st.tr_radius):>9.2e} {float(st.defect_nl):>10.3e} "
              f"{float(st.viol_nl):>9.2e} {float(st.sigma):>8.4f} "
              f"{float(st.J_nl):>10.4f} {float(st.pred_dec):>10.3e} "
              f"{float(st.dx_max):>9.2e} {float(st.ipm_gap):>8.1e} "
              f"{int(st.ipm_iters):>3} {float(st.penalty_scale):>6.1f} "
              f"{int(st.converged):>2}")
        if bool(st.converged):
            break


if __name__ == "__main__":
    main()
