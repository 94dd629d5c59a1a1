"""3-DoF point-mass powered-descent model (milestone M1 / BASELINE config 1).

State (nx=7):   x = (m, r_I[3], v_I[3]), inertial up = e1.
Control (nu=3): u = T_I, thrust in the inertial frame (no attitude).

Dynamics:  mdot = -alpha_m ||T||,  rdot = v,  vdot = T/m + g.
Cones per node: mass lb (lin), linearized thrust lb (lin), glideslope SOC(3),
thrust ub SOC(4). This is the classic lossless-convexification problem shape
(max-min-max thrust arcs), used as the smallest end-to-end slice of the engine.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from successiveconvexification_tpu.models.base import Model, safe_norm

NX = 7
NU = 3

I_M = 0
I_R = slice(1, 4)
I_V = slice(4, 7)


@struct.dataclass
class PointMass3DoFParams:
    m_wet: jnp.ndarray
    m_dry: jnp.ndarray
    alpha_m: jnp.ndarray
    T_min: jnp.ndarray
    T_max: jnp.ndarray
    tan_gamma_gs: jnp.ndarray
    g_i: jnp.ndarray
    r_init: jnp.ndarray
    v_init: jnp.ndarray
    r_final: jnp.ndarray
    v_final: jnp.ndarray
    tf_guess: jnp.ndarray


def default_params(dtype=jnp.float32) -> PointMass3DoFParams:
    f = lambda *v: jnp.asarray(v if len(v) > 1 else v[0], dtype=dtype)
    return PointMass3DoFParams(
        m_wet=f(2.0),
        m_dry=f(1.0),
        alpha_m=f(0.05),
        T_min=f(0.5),
        T_max=f(6.0),
        tan_gamma_gs=f(jnp.tan(jnp.deg2rad(25.0))),
        g_i=f(-1.0, 0.0, 0.0),
        r_init=f(6.0, 6.0, 2.0),
        v_init=f(-0.5, -2.0, -0.5),
        r_final=f(0.0, 0.0, 0.0),
        v_final=f(-0.1, 0.0, 0.0),
        tf_guess=f(6.0),
    )


def dynamics(params: PointMass3DoFParams, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    m = x[I_M]
    v = x[I_V]
    mdot = -params.alpha_m * safe_norm(u)
    vdot = u / m + params.g_i
    return jnp.concatenate([mdot[None], v, vdot])


N_LIN = 2
SOC_DIMS = (3, 4)


def stage_cones(params: PointMass3DoFParams, xk: jnp.ndarray, uk: jnp.ndarray):
    dtype = xk.dtype
    nxu = NX + NU
    e = lambda *idx: jnp.zeros((len(idx), nxu), dtype=dtype).at[
        jnp.arange(len(idx)), jnp.asarray(idx)
    ].set(1.0)

    g_mass = -e(I_M)[0]
    h_mass = xk[I_M] - params.m_dry
    nhat = uk / safe_norm(uk)
    g_tlb = jnp.zeros((nxu,), dtype=dtype).at[NX:].set(-nhat)
    h_tlb = nhat @ uk - params.T_min
    G_lin = jnp.stack([g_mass, g_tlb])
    h_lin = jnp.stack([h_mass, h_tlb])

    r = xk[I_R]
    G_gs = jnp.stack(
        [-e(1)[0], -params.tan_gamma_gs * e(2)[0], -params.tan_gamma_gs * e(3)[0]]
    )
    h_gs = jnp.stack([r[0], params.tan_gamma_gs * r[1], params.tan_gamma_gs * r[2]])

    # delta columns enter G negated so s = h - G d is the cone vector at the
    # updated point (see rocket6dof.stage_cones)
    iu = (NX, NX + 1, NX + 2)
    G_tub = jnp.concatenate([jnp.zeros((1, nxu), dtype=dtype), -e(*iu)])
    h_tub = jnp.concatenate([params.T_max[None], uk])

    return G_lin, h_lin, ((G_gs, h_gs), (G_tub, h_tub))


def initial_guess(params: PointMass3DoFParams, K: int):
    dtype = params.m_wet.dtype
    a = jnp.linspace(1.0, 0.0, K, dtype=dtype)[:, None]
    m = a * params.m_wet + (1.0 - a) * params.m_dry
    r = a * params.r_init + (1.0 - a) * params.r_final
    v = a * params.v_init + (1.0 - a) * params.v_final
    X = jnp.concatenate([m, r, v], axis=1)
    U = -m * params.g_i
    return X, U, params.tf_guess


def pointmass3dof_model() -> Model:
    return Model(
        name="pointmass3dof",
        nx=NX,
        nu=NU,
        f=dynamics,
        stage_cones=stage_cones,
        n_lin=N_LIN,
        soc_dims=SOC_DIMS,
        mass_index=I_M,
        init_pinned=tuple([True] * NX),
        term_pinned=tuple([False] + [True] * 6),
        term_u_pinned=(False, False, False),
        initial_guess=initial_guess,
    )
