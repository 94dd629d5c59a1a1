import jax.numpy as jnp
import numpy as np

from successiveconvexification_tpu.utils import quaternion as qt


def random_unit_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_identity_dcm():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(qt.quat_to_dcm(q), np.eye(3), atol=1e-14)


def test_rotate_matches_dcm(rng):
    q = jnp.asarray(random_unit_quat(rng))
    v = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(
        qt.quat_rotate(q, v), qt.quat_to_dcm(q) @ v, atol=1e-12
    )


def test_dcm_orthonormal(rng):
    q = jnp.asarray(random_unit_quat(rng))
    C = qt.quat_to_dcm(q)
    np.testing.assert_allclose(C @ C.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(C), 1.0, atol=1e-12)


def test_composition(rng):
    p = jnp.asarray(random_unit_quat(rng))
    q = jnp.asarray(random_unit_quat(rng))
    np.testing.assert_allclose(
        qt.quat_to_dcm(qt.quat_multiply(p, q)),
        qt.quat_to_dcm(p) @ qt.quat_to_dcm(q),
        atol=1e-12,
    )


def test_kinematics_preserves_norm(rng):
    # qdot is orthogonal to q => d/dt ||q||^2 = 0
    q = jnp.asarray(random_unit_quat(rng))
    w = jnp.asarray(rng.normal(size=3))
    qdot = qt.quat_kinematics(q, w)
    assert abs(float(jnp.dot(q, qdot))) < 1e-12


def test_kinematics_small_rotation():
    # Integrating constant omega about e3 for time t rotates by angle |w| t.
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    w = jnp.array([0.0, 0.0, 1.0])
    dt = 1e-5
    for _ in range(100):
        q = q + dt * qt.quat_kinematics(q, w)
        q = qt.quat_normalize(q)
    # use arcsin of the vector part: well-conditioned for tiny angles
    angle = 2 * np.arcsin(float(np.linalg.norm(np.asarray(q)[1:])))
    np.testing.assert_allclose(angle, 100 * dt, rtol=1e-6)


def test_skew(rng):
    v = jnp.asarray(rng.normal(size=3))
    w = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(qt.skew(v) @ w, np.cross(v, w), atol=1e-12)
