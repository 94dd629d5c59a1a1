"""6-DoF quaternion rocket powered-descent model (Szmuk-Acikmese).

State (nx=14):  x = (m, r_I[3], v_I[3], q_{I<-B}[4], omega_B[3]), inertial up = e1.
Control (nu=3): u = T_B, thrust vector in the body frame (nominal direction +e1).

Continuous dynamics (SURVEY.md §2.1 C2; mathematically forced by the problem class):
    mdot     = -alpha_m * ||T||
    rdot     = v
    vdot     = (C_IB(q) T - cd_a ||v|| v) / m + g_I     (cd_a = 0: vacuum)
    qdot     = 0.5 * q ⊗ (0, omega)
    omegadot = J^-1 (r_T x T - omega x J omega)

Per-node convex constraints (SURVEY.md §2.2 cone inventory), in deltas about
(xbar, ubar) with x = xbar + dx:
    mass        m >= m_dry                                   linear
    glideslope  tan(gamma_gs) ||r_{2,3}|| <= r_1             SOC(3)
    tilt        ||(q2, q3)|| <= sqrt((1-cos th_max)/2)       SOC(3)
    rate        ||omega|| <= omega_max                       SOC(4)
    thrust ub   ||T|| <= T_max                               SOC(4)
    thrust lb   T_min <= nhat' T, nhat = ubar/||ubar||       linear (linearized)
    gimbal      cos(delta_max) ||T|| <= e1' T                SOC(4)

Default parameters follow the nondimensionalized test case of the Szmuk-Acikmese
free-final-time paper family (PAPERS.md; arXiv:1802.03827 lineage) so single solves
converge in O(10) SCvx iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from successiveconvexification_tpu.models.base import Model, safe_norm
from successiveconvexification_tpu.utils.quaternion import (
    quat_kinematics,
    quat_to_dcm,
)

NX = 14
NU = 3

# state layout indices
I_M = 0
I_R = slice(1, 4)
I_V = slice(4, 7)
I_Q = slice(7, 11)
I_W = slice(11, 14)


@struct.dataclass
class Rocket6DoFParams:
    """Traced physical parameters (batchable for dispersion sweeps)."""

    m_wet: jnp.ndarray
    m_dry: jnp.ndarray
    alpha_m: jnp.ndarray          # 1 / (Isp * g0): mass-depletion rate per thrust
    T_min: jnp.ndarray
    T_max: jnp.ndarray
    cos_delta_max: jnp.ndarray    # gimbal half-angle cosine
    tan_gamma_gs: jnp.ndarray     # glideslope: tan of min elevation from horizontal
    c_tilt: jnp.ndarray           # sqrt((1 - cos(theta_max)) / 2)
    omega_max: jnp.ndarray
    J_b: jnp.ndarray              # principal inertia diagonal, shape (3,)
    r_t: jnp.ndarray              # thrust application point in body frame, shape (3,)
    g_i: jnp.ndarray              # inertial gravity, shape (3,)
    cd_a: jnp.ndarray             # drag: 0.5 * rho * C_D * A (0 = vacuum)
    # Angle-of-attack state-triggered constraint (used only by the
    # rocket6dof_model(aoa_stc=True) variant): when ||v|| > v_trigger,
    # enforce angle(body +x, -v) <= alpha_max.
    v_trigger: jnp.ndarray        # () trigger speed
    cos_aoa_max: jnp.ndarray      # () cos(alpha_max)
    r_init: jnp.ndarray           # (3,)
    v_init: jnp.ndarray           # (3,)
    q_init: jnp.ndarray           # (4,)
    w_init: jnp.ndarray           # (3,)
    r_final: jnp.ndarray          # (3,)
    v_final: jnp.ndarray          # (3,)
    tf_guess: jnp.ndarray         # initial time-of-flight guess (sigma_bar init)


def default_params(dtype=jnp.float32) -> Rocket6DoFParams:
    """Nondimensional benchmark landing scenario (converges in ~10 SCvx iters)."""
    f = lambda *v: jnp.asarray(v if len(v) > 1 else v[0], dtype=dtype)
    return Rocket6DoFParams(
        m_wet=f(2.0),
        m_dry=f(1.0),
        alpha_m=f(0.07),
        T_min=f(0.3),
        T_max=f(5.0),
        # 20 deg gimbal: the Szmuk-class value (tight attitude-thrust
        # coupling). Solved by the default config since the acceptance /
        # stationarity-certificate fixes; tests/test_scvx.py::
        # test_tight_gimbal_converges gates it end-to-end.
        cos_delta_max=f(jnp.cos(jnp.deg2rad(20.0))),
        tan_gamma_gs=f(jnp.tan(jnp.deg2rad(20.0))),
        c_tilt=f(jnp.sqrt((1.0 - jnp.cos(jnp.deg2rad(90.0))) / 2.0)),
        omega_max=f(jnp.deg2rad(60.0)),
        J_b=f(1e-2, 1e-2, 1e-2),
        r_t=f(-1e-2, 0.0, 0.0),
        g_i=f(-1.0, 0.0, 0.0),
        # vacuum by default (the arXiv:1802.03827 base case); set > 0 for the
        # Szmuk-2018 atmospheric variant — isotropic quadratic drag
        cd_a=f(0.0),
        # AoA STC defaults (consumed only by the aoa_stc=True model variant)
        v_trigger=f(1.5),
        cos_aoa_max=f(jnp.cos(jnp.deg2rad(30.0))),
        r_init=f(4.0, 4.0, 0.0),
        v_init=f(-0.5, -2.0, 0.0),
        q_init=f(1.0, 0.0, 0.0, 0.0),
        w_init=f(0.0, 0.0, 0.0),
        r_final=f(0.0, 0.0, 0.0),
        v_final=f(-1e-1, 0.0, 0.0),
        tf_guess=f(6.0),
    )


def dynamics(params: Rocket6DoFParams, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    m = x[I_M]
    v = x[I_V]
    q = x[I_Q]
    w = x[I_W]

    C_ib = quat_to_dcm(q)
    # mul-sum instead of @: identical math; under the SoA/Pallas discretize
    # vmap a batched 3x3 dot_general is rejected by Mosaic, elementwise+reduce
    # is not (and XLA fuses both identically on the normal path)
    thrust_i = jnp.sum(C_ib * u[None, :], axis=1)

    mdot = -params.alpha_m * safe_norm(u)
    rdot = v
    # isotropic quadratic drag (Szmuk-2018 atmospheric class; cd_a = 0 in the
    # vacuum base case): F_D = -cd_a * ||v|| * v. safe_norm keeps the
    # Jacobian finite at v = 0 (AD differentiates straight through this).
    drag_i = -params.cd_a * safe_norm(v) * v
    vdot = (thrust_i + drag_i) / m + params.g_i
    qdot = quat_kinematics(q, w)
    Jw = params.J_b * w
    wdot = (jnp.cross(params.r_t, u) - jnp.cross(w, Jw)) / params.J_b

    return jnp.concatenate([mdot[None], rdot, vdot, qdot, wdot])


# --------------------------------------------------------------------------- cones
N_LIN = 2                      # mass lower bound, linearized thrust lower bound
SOC_DIMS = (3, 3, 4, 4, 4)     # glideslope, tilt, rate, thrust-ub, gimbal

# margin added to every linearized STC row's RHS. The continuous-STC scalar
# h = -min(g, 0) * c is identically 0 wherever the trigger is off, which would
# emit the degenerate row 0'd <= 0 (feasible but with NO strict interior — the
# IPM cannot hold s_i > 0). The Szmuk-lineage papers flag exactly this
# degeneracy; an epsilon RHS restores a strict interior at tolerance-level
# cost (the nonlinear merit uses the same epsilon, keeping rho consistent).
STC_EPS = 1e-6


def _aoa_stc_scalar(params: Rocket6DoFParams, x: jnp.ndarray, u: jnp.ndarray):
    """Szmuk continuous state-triggered constraint scalar h(x) <= 0 for the
    angle-of-attack constraint (PAPERS.md arXiv:2510.09610 lineage; the
    classic formulation of arXiv:1811.10803):

        trigger     g(x) = v_trigger - ||v||        (enforce when g < 0)
        constraint  c(x) = cos(alpha_max)*||v|| + e1 . C_BI(q) v
        STC         h(x) = -min(g(x), 0) * c(x) <= 0

    c <= 0 says the angle between the body +x axis and the AIRFLOW (-v)
    is at most alpha_max. h is smooth a.e.; its AD gradient provides the
    linearized subproblem row exactly like the thrust-lower-bound row.
    """
    v = x[I_V]
    q = x[I_Q]
    speed = safe_norm(v)
    g = params.v_trigger - speed
    v_b = quat_to_dcm(q).T @ v          # C_BI = C_IB', body-frame velocity
    c = params.cos_aoa_max * speed + v_b[0]
    return -jnp.minimum(g, 0.0) * c


def _aoa_stc_row(params: Rocket6DoFParams, xk: jnp.ndarray, uk: jnp.ndarray):
    """Linearize the STC scalar about (xk, uk): G @ (dx,du) <= -h(xbar)+eps."""
    nxu = NX + NU

    def h_of(xu):
        return _aoa_stc_scalar(params, xu[:NX], xu[NX:])

    xu = jnp.concatenate([xk, uk])
    G = jax.grad(h_of)(xu)
    h = -h_of(xu) + jnp.asarray(STC_EPS, xk.dtype)
    return G.reshape(1, nxu), h.reshape(1)


def stage_cones(params: Rocket6DoFParams, xk: jnp.ndarray, uk: jnp.ndarray):
    """Emit (G_lin, h_lin, socs) for one node, in deltas about (xk, uk).

    Linear rows mean G @ (dx,du) <= h; SOC blocks mean h - G @ (dx,du) in SOC(d).
    """
    dtype = xk.dtype
    nxu = NX + NU
    e = lambda *idx: jnp.zeros((len(idx), nxu), dtype=dtype).at[
        jnp.arange(len(idx)), jnp.asarray(idx)
    ].set(1.0)

    # --- linear rows ------------------------------------------------------
    # mass:  m >= m_dry  ->  -dm <= m - m_dry
    g_mass = -e(I_M)[0]
    h_mass = xk[I_M] - params.m_dry
    # thrust lb (linearized about ubar): nhat'(u) >= T_min -> -nhat' du <= nhat'ubar - T_min
    nhat = uk / safe_norm(uk)
    g_tlb = jnp.zeros((nxu,), dtype=dtype).at[NX:].set(-nhat)
    h_tlb = nhat @ uk - params.T_min
    G_lin = jnp.stack([g_mass, g_tlb])
    h_lin = jnp.stack([h_mass, h_tlb])

    # --- SOC blocks: s = h - G d,  s in SOC ------------------------------
    r = xk[I_R]
    # glideslope SOC(3): s = (r1 , tan_gs * r_{2,3})... we need s0 >= ||s1||:
    #   r1 >= tan_gs * ||r23||  ->  s = (r1, tan_gs*r2, tan_gs*r3)
    G_gs = jnp.stack(
        [-e(1)[0], -params.tan_gamma_gs * e(2)[0], -params.tan_gamma_gs * e(3)[0]]
    )
    h_gs = jnp.stack([r[0], params.tan_gamma_gs * r[1], params.tan_gamma_gs * r[2]])

    # SOC convention: s = h - G d must be the cone vector AT THE UPDATED point
    # (head and tail alike), so delta columns enter G with a MINUS sign. A
    # flipped tail (s1 = val - dval) still has the right fixed points (d = 0)
    # but corrupts the SCvx acceptance ratio at first order.
    # tilt SOC(3): c_tilt >= ||(q2, q3)||
    G_tilt = jnp.stack([jnp.zeros((nxu,), dtype=dtype), -e(9)[0], -e(10)[0]])
    h_tilt = jnp.stack([params.c_tilt * jnp.ones((), dtype), xk[9], xk[10]])

    # rate SOC(4): omega_max >= ||omega||
    G_rate = jnp.concatenate([jnp.zeros((1, nxu), dtype=dtype), -e(11, 12, 13)])
    h_rate = jnp.concatenate([params.omega_max[None], xk[I_W]])

    # thrust ub SOC(4): T_max >= ||u||
    iu = (NX, NX + 1, NX + 2)
    G_tub = jnp.concatenate([jnp.zeros((1, nxu), dtype=dtype), -e(*iu)])
    h_tub = jnp.concatenate([params.T_max[None], uk])

    # gimbal SOC(4): u_1 / cos(delta_max) >= ||u||
    G_gim = jnp.concatenate([-e(NX) / params.cos_delta_max, -e(*iu)])
    h_gim = jnp.concatenate([(uk[0] / params.cos_delta_max)[None], uk])

    return G_lin, h_lin, ((G_gs, h_gs), (G_tilt, h_tilt), (G_rate, h_rate),
                          (G_tub, h_tub), (G_gim, h_gim))


def stage_cones_aoa_stc(params: Rocket6DoFParams, xk: jnp.ndarray,
                        uk: jnp.ndarray):
    """stage_cones + the linearized angle-of-attack STC row (n_lin = 3)."""
    G_lin, h_lin, socs = stage_cones(params, xk, uk)
    G_stc, h_stc = _aoa_stc_row(params, xk, uk)
    return (jnp.concatenate([G_lin, G_stc], axis=0),
            jnp.concatenate([h_lin, h_stc], axis=0), socs)


def initial_guess(params: Rocket6DoFParams, K: int):
    """Straight-line interpolation of BCs + hover-ish thrust (SURVEY §3.1)."""
    dtype = params.m_wet.dtype
    a = jnp.linspace(1.0, 0.0, K, dtype=dtype)[:, None]
    m = (a * params.m_wet + (1.0 - a) * params.m_dry)  # (K,1)
    r = a * params.r_init + (1.0 - a) * params.r_final
    v = a * params.v_init + (1.0 - a) * params.v_final
    q = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype), (K, 4))
    w = jnp.zeros((K, 3), dtype=dtype)
    X = jnp.concatenate([m, r, v, q, w], axis=1)
    # thrust opposing gravity, scaled by local mass: u = -m * g (body==inertial at q=I)
    U = -m * params.g_i
    sigma = params.tf_guess
    return X, U, sigma


def project_state(X: jnp.ndarray) -> jnp.ndarray:
    """Renormalize the quaternion block (attitude lives on S^3; the convex
    subproblem cannot know that, so accepted steps are projected back)."""
    from successiveconvexification_tpu.utils.quaternion import quat_normalize

    return X.at[..., 7:11].set(quat_normalize(X[..., 7:11]))


def project_jac(x: jnp.ndarray) -> jnp.ndarray:
    """d(project_state)/dx at a single state: identity except the q block,
    which gets the renormalization Jacobian (I - qhat qhat') / ||q||."""
    J = jnp.eye(NX, dtype=x.dtype)
    q = x[I_Q]
    n = jnp.sqrt(jnp.sum(q * q))
    qhat = q / n
    Jq = (jnp.eye(4, dtype=x.dtype) - jnp.outer(qhat, qhat)) / n
    return J.at[7:11, 7:11].set(Jq)


def state_basis(params: Rocket6DoFParams, xk: jnp.ndarray) -> jnp.ndarray:
    """Per-node tangent basis (14 x 13): identity on (m, r, v, omega), and the
    standard orthonormal quaternion tangent basis q ⊗ e_i on the q block
    (manifold-SCP reduction — attitude deltas have no radial dimension)."""
    dtype = xk.dtype
    q = xk[I_Q] / jnp.sqrt(jnp.sum(xk[I_Q] ** 2))
    q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
    # columns: q ⊗ e1, q ⊗ e2, q ⊗ e3 (orthonormal, each ⊥ q)
    Vq = jnp.stack(
        [
            jnp.stack([-q1, -q2, -q3]),
            jnp.stack([q0, -q3, q2]),
            jnp.stack([q3, q0, -q1]),
            jnp.stack([-q2, q1, q0]),
        ],
        axis=0,
    ).astype(dtype)
    B = jnp.zeros((NX, NX - 1), dtype)
    B = B.at[:7, :7].set(jnp.eye(7, dtype=dtype))
    B = B.at[7:11, 7:10].set(Vq)
    B = B.at[11:14, 10:13].set(jnp.eye(3, dtype=dtype))
    return B


def rocket6dof_model(aoa_stc: bool = False) -> Model:
    """6-DoF model; ``aoa_stc=True`` adds the angle-of-attack
    state-triggered constraint row (Szmuk STC lineage, see _aoa_stc_scalar).
    Variants are cached so jit sees one Model identity per flag value."""
    key = bool(aoa_stc)
    if key in _MODELS:
        return _MODELS[key]
    m = Model(
        name="rocket6dof_stc" if aoa_stc else "rocket6dof",
        nx=NX,
        nu=NU,
        f=dynamics,
        stage_cones=stage_cones_aoa_stc if aoa_stc else stage_cones,
        n_lin=N_LIN + (1 if aoa_stc else 0),
        soc_dims=SOC_DIMS,
        mass_index=I_M,
        # initial: m, r, v, omega pinned; ATTITUDE FREE (the guidance problem
        # starts at ignition where attitude is a choice — Szmuk's BCs; pinning
        # it upright with lateral initial velocity makes the tight gimbal cone
        # force an infeasible attitude boundary layer)
        init_pinned=tuple([True] * 7 + [False] * 4 + [True] * 3),
        # terminal: r, v, q, omega pinned; mass free
        term_pinned=tuple([False] + [True] * 13),
        term_u_pinned=(False, False, False),
        initial_guess=initial_guess,
        project_state=project_state,
        project_jac=project_jac,
        state_basis=state_basis,
        nr=NX - 1,
        # reduced coords: (m, r3, v3, qtangent3, w3) = 13
        init_pinned_r=tuple([True] * 7 + [False] * 3 + [True] * 3),
        term_pinned_r=tuple([False] + [True] * 12),
    )
    _MODELS[key] = m
    return m


_MODELS: dict = {}


def get_model() -> Model:
    return rocket6dof_model()
