"""Time the fused discretize kernel vs the XLA SoA path at production scale."""
import sys, time
import jax, jax.numpy as jnp

import successiveconvexification_tpu as scvx
from successiveconvexification_tpu.models import rocket6dof as rk
from successiveconvexification_tpu.ops import pallas_disc as PD
from successiveconvexification_tpu.ops import discretize as D

model = scvx.rocket6dof_model()
params0 = rk.default_params(dtype=jnp.float32)
nx, nu = model.nx, model.nu
L = int(sys.argv[1]) if len(sys.argv) > 1 else 12544
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
pt = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), plead)

kern = jax.jit(lambda p, x, u, up, s: PD.discretize_lanes(
    model, p, x, u, up, s, 1.0 / 49, 8, True))
xla = jax.jit(lambda p, x, u, up, s: D._aug_rk4_soa(
    model, p, x, u, up, s, 1.0 / 49, 8, True))


def bench(f, args, tag):
    out = f(*args)
    _ = float(jnp.sum(out[0]))     # honest axon barrier
    t0 = time.perf_counter()
    reps = 10
    for _i in range(reps):
        out = f(*args)
        _ = float(jnp.sum(out[0]))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{tag}: {dt:.2f} ms", flush=True)
    return out, dt


ok, tk = bench(kern, (plead, xk, uk, ukp1, sig), "kernel")
ox, tx = bench(xla, (pt, xk, uk, ukp1, sig), "xla_soa")
err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(ok, ox))
print(f"maxerr {err:.3e}  speedup {tx / tk:.2f}x")
