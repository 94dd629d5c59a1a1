"""Full-precision matmul scope for the solver's linear algebra.

On TPU, JAX's default matmul/einsum precision truncates f32 operands to
bfloat16 for the MXU passes. That is fine for neural-network layers and
catastrophic for interior-point linear algebra: with ~3 decimal digits per
pass the Mehrotra IPM on the flagship K=50 problem plateaus at a relative
duality gap of O(0.1) and the SCvx loop above it never converges (measured:
the identical program converges in 22 iterations at full f32 precision and
in 0/256 lanes at the bf16 default). The solver's hot matmuls are small
batched blocks that are latency/bandwidth bound, not MXU-throughput bound,
so the extra passes cost little.

This is deliberately NOT a config knob: every numeric path in the engine is
wrapped, and there is no configuration in which bf16 KKT algebra is usable.
"""

from __future__ import annotations

import functools

import jax


def full_precision(fn):
    """Decorator: trace ``fn`` under ``jax.default_matmul_precision("highest")``.

    Compose UNDER ``jax.jit`` (jit outermost) so the scope is active while the
    function body is traced — the precision is baked into the jaxpr.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
