"""Full-trajectory oracle equivalence (the BASELINE <1e-3 control gate).

The reference's accuracy gate is "control deviation < 1e-3 vs the ECOS/JuMP
solution at the same K" (BASELINE.json). ECOS cannot run here (SURVEY §0), so
the gate is anchored to the in-repo native C++ oracle: along the ENGINE's own
SCvx solution path, every subproblem is re-solved by the independent native
solver and the candidate controls must agree within 1e-3 — which by induction
pins the whole control trajectory to what an external-native-solver pipeline
would produce.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dense_ref
import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import ipm, socp
from successiveconvexification_tpu.ops.discretize import discretize
from successiveconvexification_tpu.ops.scvx import scvx_init, scvx_iteration
from successiveconvexification_tpu.oracle import native

F64 = jnp.float64

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ build failed")


def test_controls_match_native_oracle_along_solution_path():
    model = rk.rocket6dof_model()
    params = rk.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=10, substeps=5),
        ipm=scvx.IPMConfig(max_iters=35, refine_steps=2, tol_gap=1e-9,
                           tol_feas=1e-9),
        # soft mode: the LM damping makes every subproblem strictly convex, so
        # the primal solution is unique and control-level comparison against
        # the independent solver is well-posed. (Hard-TR subproblems can be
        # degenerate — equal objectives, different optimal controls — covered
        # by the objective-equivalence tests in test_ipm_structured.py.)
        scvx=dataclasses.replace(
            scvx.ScvxConfig(), tr_mode="soft", w_feas=1000.0, tr_init=0.1
        ),
    )
    it_jit = jax.jit(lambda p, stt: scvx_iteration(model, p, cfg, stt))
    ipm_jit = jax.jit(lambda d: ipm.ipm_solve(d, cfg.ipm))

    st = scvx_init(model, params, cfg)
    nrx, nu = model.nr, model.nu
    max_du = 0.0
    checked = 0
    for i in range(8):
        disc = discretize(model, params, st.X, st.U, st.sigma,
                          substeps=cfg.disc.substeps)
        d = socp.assemble(model, cfg.scvx, params, disc, st.X, st.U, st.sigma,
                          st.tr_radius, True, st.penalty_scale)
        sol = ipm_jit(d)

        # independent native C++ solve of the same subproblem
        c, A, b, G, h, cones, P = dense_ref.materialize(d)
        res = native.solve(c, A, b, G, h, cones,
                           P=np.ascontiguousarray(P), tol=1e-11, max_iters=100)
        x_or = dense_ref.unflatten_primal(d, jnp.asarray(res.x))

        du = float(jnp.max(jnp.abs(
            sol.x.w[:, nrx:nrx + nu] - x_or.w[:, nrx:nrx + nu]
        )))
        dsig = abs(float(sol.x.sig) - float(x_or.sig))
        max_du = max(max_du, du, dsig)
        checked += 1

        st = it_jit(params, st)
        if bool(st.converged):
            break

    assert checked >= 5
    assert max_du < 1e-3, max_du
