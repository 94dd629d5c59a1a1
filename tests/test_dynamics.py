import jax
import jax.numpy as jnp
import numpy as np
import pytest

from successiveconvexification_tpu.models import pointmass3dof as pm
from successiveconvexification_tpu.models import rocket6dof as rk


F64 = jnp.float64


@pytest.fixture
def params6():
    return rk.default_params(dtype=F64)


@pytest.fixture
def params3():
    return pm.default_params(dtype=F64)


def test_hover_equilibrium_6dof(params6):
    """At identity attitude, u = -m*g cancels gravity; zero rates stay zero."""
    m = 1.5
    x = jnp.zeros(14, dtype=F64).at[0].set(m).at[7].set(1.0).at[1].set(2.0)
    u = -m * params6.g_i
    xdot = rk.dynamics(params6, x, u)
    # rdot = v = 0, vdot = 0, qdot = 0, wdot = 0 (r_t parallel to u); mdot < 0
    np.testing.assert_allclose(xdot[1:], np.zeros(13), atol=1e-12)
    assert float(xdot[0]) == pytest.approx(-float(params6.alpha_m) * m, rel=1e-12)


def test_free_fall_6dof(params6):
    x = jnp.zeros(14, dtype=F64).at[0].set(2.0).at[7].set(1.0).at[4].set(0.5)
    u = jnp.zeros(3, dtype=F64)
    xdot = rk.dynamics(params6, x, u)
    np.testing.assert_allclose(xdot[4:7], params6.g_i, atol=1e-12)  # vdot = g
    np.testing.assert_allclose(xdot[1:4], x[4:7], atol=1e-12)       # rdot = v
    assert abs(float(xdot[0])) < 1e-5                                # mdot ~ 0


def test_pure_spin_isotropic_6dof(params6):
    """Isotropic inertia + no thrust => wdot = 0 (w x Jw = 0)."""
    x = jnp.zeros(14, dtype=F64).at[0].set(2.0).at[7].set(1.0)
    x = x.at[11:14].set(jnp.array([0.3, -0.2, 0.1], dtype=F64))
    xdot = rk.dynamics(params6, x, jnp.zeros(3, dtype=F64))
    np.testing.assert_allclose(xdot[11:14], np.zeros(3), atol=1e-12)


def test_torque_from_lever_arm(params6):
    """Lateral thrust at lever arm r_t = (-l,0,0) produces wdot = (r_t x u)/J."""
    x = jnp.zeros(14, dtype=F64).at[0].set(2.0).at[7].set(1.0)
    u = jnp.array([1.0, 0.5, 0.0], dtype=F64)
    xdot = rk.dynamics(params6, x, u)
    expected = np.cross(np.asarray(params6.r_t), np.asarray(u)) / np.asarray(params6.J_b)
    np.testing.assert_allclose(xdot[11:14], expected, atol=1e-12)


def test_rotated_thrust_direction(params6):
    """90 deg rotation about e3 maps body e1 thrust to inertial e2."""
    from successiveconvexification_tpu.utils.quaternion import euler_to_quat

    q = euler_to_quat(0.0, 0.0, jnp.pi / 2).astype(F64)
    x = jnp.zeros(14, dtype=F64).at[0].set(1.0)
    x = x.at[7:11].set(q)
    u = jnp.array([1.0, 0.0, 0.0], dtype=F64)
    xdot = rk.dynamics(params6, x, u)
    np.testing.assert_allclose(
        xdot[4:7], np.asarray([0.0, 1.0, 0.0]) + np.asarray(params6.g_i), atol=1e-12
    )


def test_jacobians_match_finite_differences(params6, rng):
    x = jnp.asarray(rng.normal(size=14)).at[0].set(2.0)
    x = x.at[7:11].set(x[7:11] / jnp.linalg.norm(x[7:11]))
    u = jnp.asarray(rng.normal(size=3)) + jnp.array([2.0, 0.0, 0.0])
    model = rk.rocket6dof_model()
    A, B = model.jacobians(params6, x, u)
    eps = 1e-6

    def fd(fun, v):
        cols = []
        for i in range(v.shape[0]):
            dv = jnp.zeros_like(v).at[i].set(eps)
            cols.append((fun(v + dv) - fun(v - dv)) / (2 * eps))
        return jnp.stack(cols, axis=1)

    A_fd = fd(lambda xx: rk.dynamics(params6, xx, u), x)
    B_fd = fd(lambda uu: rk.dynamics(params6, x, uu), u)
    np.testing.assert_allclose(A, A_fd, atol=1e-6)
    np.testing.assert_allclose(B, B_fd, atol=1e-6)


def test_jacobians_match_finite_differences_3dof(params3, rng):
    x = jnp.asarray(rng.normal(size=7)).at[0].set(2.0)
    u = jnp.asarray(rng.normal(size=3)) + jnp.array([2.0, 0.0, 0.0])
    model = pm.pointmass3dof_model()
    A, B = model.jacobians(params3, x, u)
    eps = 1e-6

    def fd(fun, v):
        cols = []
        for i in range(v.shape[0]):
            dv = jnp.zeros_like(v).at[i].set(eps)
            cols.append((fun(v + dv) - fun(v - dv)) / (2 * eps))
        return jnp.stack(cols, axis=1)

    np.testing.assert_allclose(A, fd(lambda xx: pm.dynamics(params3, xx, u), x), atol=1e-6)
    np.testing.assert_allclose(B, fd(lambda uu: pm.dynamics(params3, x, uu), u), atol=1e-6)


def test_dynamics_jittable_and_vmappable(params6):
    model = rk.rocket6dof_model()
    X = jnp.tile(jnp.zeros(14, dtype=F64).at[0].set(2.0).at[7].set(1.0), (8, 1))
    U = jnp.tile(jnp.array([2.0, 0.0, 0.0], dtype=F64), (8, 1))
    out = jax.jit(jax.vmap(lambda x, u: model.f(params6, x, u)))(X, U)
    assert out.shape == (8, 14)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_drag_term_6dof(params6):
    """Atmospheric variant: vdot picks up exactly -cd_a*||v||*v/m; all other
    components (and the vacuum default cd_a=0) are untouched."""
    p_drag = params6.replace(cd_a=jnp.asarray(0.3, F64))
    m = 1.7
    v = jnp.asarray([0.4, -1.2, 0.9], F64)
    x = jnp.zeros(14, dtype=F64).at[0].set(m).at[7].set(1.0)
    x = x.at[4:7].set(v)
    u = jnp.asarray([0.5, 0.1, -0.2], F64)
    d0 = rk.dynamics(params6, x, u)
    d1 = rk.dynamics(p_drag, x, u)
    expect = -0.3 * jnp.linalg.norm(v) * v / m
    np.testing.assert_allclose(np.asarray(d1[4:7] - d0[4:7]),
                               np.asarray(expect), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d1[jnp.asarray([0, 1, 2, 3])]),
                               np.asarray(d0[jnp.asarray([0, 1, 2, 3])]))
    np.testing.assert_allclose(np.asarray(d1[7:]), np.asarray(d0[7:]))
    # AD Jacobians stay finite at v = 0 (safe_norm)
    x0 = x.at[4:7].set(0.0)
    A, B = rk.rocket6dof_model().jacobians(p_drag, x0, u)
    assert bool(jnp.all(jnp.isfinite(A))) and bool(jnp.all(jnp.isfinite(B)))
