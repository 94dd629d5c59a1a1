"""Directly probe pallas_disc.discretize_lanes at L=128 (single tile)."""
import sys
import jax, jax.numpy as jnp

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import pallas_disc as PD
from successiveconvexification_tpu.ops import discretize as D

model = scvx.rocket6dof_model()
params0 = rk.default_params(dtype=jnp.float32)
nx, nu = model.nx, model.nu
L = int(sys.argv[1]) if len(sys.argv) > 1 else 128
dtype = jnp.float32

plead = jax.tree.map(lambda a: jnp.broadcast_to(jnp.asarray(a, dtype)[None],
                                                (L,) + jnp.shape(a)), params0)
key = jax.random.PRNGKey(0)
xk = jnp.ones((nx, L), dtype) * 0.1
xk = xk.at[0].set(20.0)
xk = xk.at[7].set(1.0)
xk = xk + 0.01 * jax.random.normal(key, (nx, L), dtype)
uk = jnp.ones((nu, L), dtype) * 40.0
ukp1 = uk * 1.01
sig = jnp.full((L,), 4.0, dtype)

A, Bm, Bp, S, z, xe = PD.discretize_lanes(
    model, plead, xk, uk, ukp1, sig, 1.0 / 49, 8, True)
print("kernel shapes", A.shape, Bm.shape, S.shape)
import os
print("finite", bool(jnp.all(jnp.isfinite(A))), float(jnp.sum(A)))
if os.environ.get("CHECK_REF") == "1":
    pt = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), plead)
    A2, Bm2, Bp2, S2, z2, xe2 = D._aug_rk4_soa(
        model, pt, xk, uk, ukp1, sig, 1.0 / 49, 8, True)
    for n, a, b in [("A", A, A2), ("Bm", Bm, Bm2), ("Bp", Bp, Bp2),
                    ("S", S, S2), ("z", z, z2), ("xe", xe, xe2)]:
        err = float(jnp.max(jnp.abs(a - b)))
        print(n, "maxerr", err)
        assert err < 1e-4, (n, err)
print("LANES OK")
