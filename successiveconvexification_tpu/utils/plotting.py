"""Trajectory visualization (reference L7/C12, SURVEY.md §2.1).

Static matplotlib figures: 3D trajectory with thrust vectors, plus time
histories (position, velocity, thrust magnitude/gimbal, tilt, rates, mass).
"""

from __future__ import annotations

import numpy as np


def plot_trajectory(X, U, sigma, params=None, path: str = "trajectory.png"):
    """Render a 6-DoF (or 3-DoF) trajectory to ``path``. Returns the figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    X = np.asarray(X)
    U = np.asarray(U)
    K, nx = X.shape
    t = np.linspace(0.0, float(sigma), K)
    is6dof = nx >= 14

    fig = plt.figure(figsize=(14, 9))
    ax3 = fig.add_subplot(2, 3, 1, projection="3d")
    r = X[:, 1:4]
    # axes: x = up; plot as (east, north, up) for readability
    ax3.plot(r[:, 1], r[:, 2], r[:, 0], "-o", ms=2, lw=1)
    # thrust vectors (every few nodes)
    step = max(1, K // 20)
    if is6dof:
        from successiveconvexification_tpu.utils.quaternion import quat_to_dcm
        import jax.numpy as jnp

        for k in range(0, K, step):
            C = np.asarray(quat_to_dcm(jnp.asarray(X[k, 7:11])))
            Ti = C @ U[k]
            ax3.quiver(r[k, 1], r[k, 2], r[k, 0], -Ti[1], -Ti[2], -Ti[0],
                       length=0.12, color="tab:red", normalize=False)
    ax3.set_xlabel("east")
    ax3.set_ylabel("north")
    ax3.set_zlabel("up")
    ax3.set_title(f"trajectory (tf = {float(sigma):.3f})")

    ax = fig.add_subplot(2, 3, 2)
    ax.plot(t, r)
    ax.set_title("position")
    ax.legend(["up", "east", "north"], fontsize=7)

    ax = fig.add_subplot(2, 3, 3)
    ax.plot(t, X[:, 4:7])
    ax.set_title("velocity")

    ax = fig.add_subplot(2, 3, 4)
    ax.plot(t, np.linalg.norm(U, axis=1), label="|T|")
    if params is not None:
        ax.axhline(float(params.T_max), ls="--", c="gray")
        ax.axhline(float(params.T_min), ls="--", c="gray")
    ax.set_title("thrust magnitude")

    ax = fig.add_subplot(2, 3, 5)
    if is6dof:
        tilt = 2.0 * np.arcsin(np.clip(np.linalg.norm(X[:, 9:11], axis=1), 0, 1))
        ax.plot(t, np.rad2deg(tilt), label="tilt")
        ax.plot(t, np.rad2deg(np.linalg.norm(X[:, 11:14], axis=1)), label="|omega|")
        ax.legend(fontsize=7)
        ax.set_title("attitude")
    else:
        ax.plot(t, X[:, 0])
        ax.set_title("mass")

    ax = fig.add_subplot(2, 3, 6)
    ax.plot(t, X[:, 0])
    ax.set_title("mass")

    fig.tight_layout()
    fig.savefig(path, dpi=110)
    return fig
