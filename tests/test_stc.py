"""Angle-of-attack state-triggered constraint (Szmuk STC lineage).

The continuous STC h(x) = -min(g, 0) * c <= 0 enforces c <= 0 only where the
trigger g < 0 fires (here: AoA <= alpha_max only above a trigger speed). The
linearized row enters the subproblem exactly like the thrust-lower-bound row;
the nonlinear merit picks it up automatically through model.stage_cones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops.scvx import scvx_init, scvx_iteration
from successiveconvexification_tpu.utils.quaternion import quat_to_dcm

F64 = jnp.float64


def _mk_state(v, q=(1.0, 0.0, 0.0, 0.0), m=1.5):
    x = jnp.zeros(14, dtype=F64).at[0].set(m)
    x = x.at[4:7].set(jnp.asarray(v, F64))
    x = x.at[7:11].set(jnp.asarray(q, F64))
    return x


def test_stc_scalar_regions():
    params = rk.default_params(dtype=F64)
    u = jnp.asarray([1.5, 0.0, 0.0], F64)

    # below trigger speed: h == 0 regardless of attitude/AoA
    x_slow = _mk_state([0.3, 0.4, 0.0])
    assert float(rk._aoa_stc_scalar(params, x_slow, u)) == pytest.approx(0.0)

    # fast, flying body-axis-first into the airflow (v = -e1 * speed at
    # identity attitude -> AoA 0): h = (speed - v_trig) * (cos_amax - 1) < 0
    sp = 2.5
    x_good = _mk_state([-sp, 0.0, 0.0])
    h = float(rk._aoa_stc_scalar(params, x_good, u))
    expect = (sp - float(params.v_trigger)) * (float(params.cos_aoa_max) - 1.0) * sp
    assert h == pytest.approx(expect, rel=1e-6)
    assert h < 0.0

    # fast at 90-deg AoA (v along body +y): h > 0 (violated)
    x_bad = _mk_state([0.0, sp, 0.0])
    assert float(rk._aoa_stc_scalar(params, x_bad, u)) > 0.0


def test_stc_row_is_strictly_interior_when_off():
    """Trigger-off nodes must NOT produce the degenerate 0'd <= 0 row: the
    epsilon RHS keeps a strict interior for the IPM."""
    params = rk.default_params(dtype=F64)
    u = jnp.asarray([1.5, 0.0, 0.0], F64)
    G, h = rk._aoa_stc_row(params, _mk_state([0.2, 0.1, 0.0]), u)
    np.testing.assert_allclose(np.asarray(G), 0.0, atol=1e-12)
    assert float(h[0]) > 0.0


def test_stc_model_variant_shapes():
    m0 = rk.rocket6dof_model()
    m1 = rk.rocket6dof_model(aoa_stc=True)
    assert m1.n_lin == m0.n_lin + 1
    assert m1 is rk.rocket6dof_model(aoa_stc=True)  # cached identity
    params = rk.default_params(dtype=F64)
    x = _mk_state([0.0, 2.0, 0.0])
    u = jnp.asarray([1.5, 0.0, 0.0], F64)
    G, h, socs = m1.stage_cones(params, x, u)
    assert G.shape == (3, 17) and h.shape == (3,)
    assert len(socs) == len(m0.soc_dims)


@pytest.mark.slow
def test_aoa_stc_enforced_end_to_end():
    """With the STC model, the converged trajectory satisfies AoA <=
    alpha_max wherever speed exceeds the trigger — a constraint the vacuum
    solution violates by ~28 deg, so the row demonstrably binds."""
    model = rk.rocket6dof_model(aoa_stc=True)
    params = rk.default_params(dtype=F64)
    cfg = scvx.SolverConfig(
        dtype="float64",
        disc=scvx.DiscretizationConfig(K=14, substeps=5),
        ipm=scvx.IPMConfig(max_iters=30, refine_steps=2),
    )
    it = jax.jit(lambda p, s: scvx_iteration(model, p, cfg, s))
    st = scvx_init(model, params, cfg)
    for _ in range(45):
        st = it(params, st)
        if bool(st.converged):
            break
    assert bool(st.converged)
    assert float(st.defect_nl) < 1e-3
    assert float(st.viol_nl) < 1e-4

    X = np.asarray(st.X)
    vtrig = float(params.v_trigger)
    amax = np.degrees(np.arccos(float(params.cos_aoa_max)))
    worst = 0.0
    for k in range(X.shape[0]):
        v = X[k, 4:7]
        sp = float(np.linalg.norm(v))
        if sp <= vtrig + 1e-3:
            continue
        vb = np.asarray(quat_to_dcm(jnp.asarray(X[k, 7:11]))).T @ v
        aoa = float(np.degrees(np.arccos(np.clip(-vb[0] / sp, -1, 1))))
        worst = max(worst, aoa - amax)
    # tolerance: merit enforces the STC scalar to ~viol tolerance; allow a
    # small angular slop from the eps margin and node-level nonlinearity
    assert worst < 1.0, worst
