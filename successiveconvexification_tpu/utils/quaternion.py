"""Quaternion algebra for the 6-DoF attitude states.

Convention (documented once, used everywhere): quaternions are scalar-first
``q = (q0, q1, q2, q3)`` unit quaternions representing the rotation BODY -> INERTIAL,
i.e. ``v_I = C_IB(q) @ v_B`` and the kinematics are ``qdot = 0.5 * q ⊗ (0, omega_B)``
with ``omega_B`` the body-frame angular rate.

The inertial "up" axis is e1 (x-up), matching the Szmuk-Acikmese formulation the
reference implements (SURVEY.md §2.1 C2): the tilt constraint then reads
``||(q2, q3)|| <= sqrt((1 - cos(theta_max)) / 2)``.

All functions are dtype-polymorphic, jit/vmap-safe pure jnp.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_multiply(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product p ⊗ q, scalar-first."""
    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            p0 * q0 - p1 * q1 - p2 * q2 - p3 * q3,
            p0 * q1 + p1 * q0 + p2 * q3 - p3 * q2,
            p0 * q2 - p1 * q3 + p2 * q0 + p3 * q1,
            p0 * q3 + p1 * q2 - p2 * q1 + p3 * q0,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_to_dcm(q: jnp.ndarray) -> jnp.ndarray:
    """Direction cosine matrix C_IB mapping body-frame vectors to inertial frame.

    Valid for unit quaternions; does not renormalize.
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [
            1.0 - 2.0 * (q2 * q2 + q3 * q3),
            2.0 * (q1 * q2 - q0 * q3),
            2.0 * (q1 * q3 + q0 * q2),
        ],
        axis=-1,
    )
    r1 = jnp.stack(
        [
            2.0 * (q1 * q2 + q0 * q3),
            1.0 - 2.0 * (q1 * q1 + q3 * q3),
            2.0 * (q2 * q3 - q0 * q1),
        ],
        axis=-1,
    )
    r2 = jnp.stack(
        [
            2.0 * (q1 * q3 - q0 * q2),
            2.0 * (q2 * q3 + q0 * q1),
            1.0 - 2.0 * (q1 * q1 + q2 * q2),
        ],
        axis=-1,
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def quat_kinematics(q: jnp.ndarray, omega_b: jnp.ndarray) -> jnp.ndarray:
    """qdot = 0.5 * q ⊗ (0, omega_B) for q = q_{I<-B}."""
    zero = jnp.zeros(omega_b.shape[:-1] + (1,), dtype=omega_b.dtype)
    omega_quat = jnp.concatenate([zero, omega_b], axis=-1)
    return 0.5 * quat_multiply(q, omega_quat)


def quat_rotate(q: jnp.ndarray, v_b: jnp.ndarray) -> jnp.ndarray:
    """Rotate a body-frame vector into the inertial frame: v_I = q ⊗ (0,v) ⊗ q*."""
    zero = jnp.zeros(v_b.shape[:-1] + (1,), dtype=v_b.dtype)
    vq = jnp.concatenate([zero, v_b], axis=-1)
    out = quat_multiply(quat_multiply(q, vq), quat_conjugate(q))
    return out[..., 1:]


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix: skew(v) @ w == cross(v, w)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def euler_to_quat(roll: float, pitch: float, yaw: float) -> jnp.ndarray:
    """ZYX Euler angles -> scalar-first quaternion (convenience for test setups)."""
    cr, sr = jnp.cos(roll / 2.0), jnp.sin(roll / 2.0)
    cp, sp = jnp.cos(pitch / 2.0), jnp.sin(pitch / 2.0)
    cy, sy = jnp.cos(yaw / 2.0), jnp.sin(yaw / 2.0)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )
