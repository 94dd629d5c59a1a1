"""Static (compile-time) configuration tree for the SCvx engine.

Design rule (SURVEY.md §5 "Config / flag system"): *physics* parameters are traced
values (they live in the model parameter structs and can be batched for Monte-Carlo
dispersions), while *algorithm* parameters here are static Python values — changing
them triggers a retrace/recompile, which is the idiomatic JAX split.

All configs are frozen dataclasses, hashable, and therefore usable as static args to
``jax.jit``. ``SolverConfig.from_dict`` / ``to_dict`` support YAML round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping


@dataclasses.dataclass(frozen=True)
class DiscretizationConfig:
    """RK4 multiple-shooting discretization settings (reference layer L3, SURVEY §1)."""

    K: int = 50          # number of trajectory nodes (the "sequence axis")
    substeps: int = 10   # RK4 sub-steps per interval [tau_k, tau_{k+1}]
    foh: bool = True     # first-order hold on controls (False -> zero-order hold)

    def __post_init__(self):
        if self.K < 3:
            raise ValueError(f"K must be >= 3, got {self.K}")
        if self.substeps < 1:
            raise ValueError(f"substeps must be >= 1, got {self.substeps}")


@dataclasses.dataclass(frozen=True)
class IPMConfig:
    """In-graph primal-dual interior-point method settings (replaces ECOS, SURVEY §3.3).

    The solver runs a *fixed* number of iterations with per-lane convergence masks
    (fixed-shape compute under vmap); ``tol_*`` only control when a lane freezes.
    """

    max_iters: int = 30
    tol_gap: float = 1e-7        # duality-gap tolerance (relative)
    tol_feas: float = 1e-7       # primal/dual residual tolerance (relative)
    static_reg: float = 1e-8     # static regularization delta on the KKT system
    frac_to_boundary: float = 0.98
    min_step: float = 1e-10      # step floor before a lane is declared stalled
    refine_steps: int = 1        # iterative-refinement sweeps on each KKT solve
    corrector: bool = True       # Mehrotra predictor-corrector (False = plain AHO)
    # Block-tridiagonal KKT backend: "scan" (sequential block Cholesky, O(K)
    # depth) or "pcr" (parallel cyclic reduction, O(log K) depth — the
    # TPU-latency-friendly choice for batched solves).
    kkt_solver: str = "scan"
    # Warm-start the IPM from the previous SCvx iteration's subproblem solution.
    warm_start: bool = True
    warm_margin: float = 1e-3    # interior pushback for reused slacks/duals


@dataclasses.dataclass(frozen=True)
class ScvxConfig:
    """SCvx outer-loop settings: trust region, penalties, acceptance (reference L6)."""

    max_iters: int = 15
    # Trust-region mode: "hard" (per-node SOC radius, classic SCvx — the
    # default; converges markedly deeper per iteration since the cone-sign
    # acceptance fix) or "soft" (LM-style quadratic damping lambda =
    # soft_tr_weight / tr_radius, with the same rho-driven shrink/grow adapting
    # the damping). Both use the nonlinear-cost acceptance ratio.
    tr_mode: str = "hard"
    soft_tr_weight: float = 5.0        # per-node quadratic weight on (dx, du)
    soft_tr_sigma_weight: float = 5.0  # quadratic weight on dsigma
    soft_tr_cap: float = 2.0           # hard per-node step cap in soft mode
    # Quadratic weight on model-declared penalized directions (e.g. the radial
    # quaternion direction); large = effectively a tangent-space constraint.
    w_dir_penalty: float = 1e4
    # tr_radius: hard-mode SOC radius, or soft-mode inverse-damping state.
    tr_init: float = 1.0
    tr_min: float = 1e-4
    tr_max: float = 100.0
    tr_shrink: float = 0.5       # Delta <- tr_shrink * Delta on reject / weak accept
    tr_grow: float = 2.0         # Delta <- tr_grow * Delta on strong accept
    # Time trust region |dsigma| <= tr_sigma_frac * sigma_bar.
    tr_sigma_frac: float = 0.3
    # Acceptance-ratio thresholds (rho = actual/predicted nonlinear cost decrease).
    rho0: float = 0.0            # below: reject + shrink
    rho1: float = 0.25           # [rho0, rho1): accept + shrink
    rho2: float = 0.7            # [rho1, rho2): accept, keep; >= rho2: accept + grow
    # Soft (LM) mode only: growth factor for mid-zone accepts (rho1 <= rho < rho2).
    # Classic SCvx holds the radius there, which under quadratic damping locks
    # the iteration into a constant-step creep (the damping itself caps rho below
    # rho2); gentle growth on every healthy accept lets the damping relax, and
    # the reject->shrink rule self-corrects any overshoot. 1.0 = classic hold.
    tr_grow_mid: float = 1.4142135623730951
    # On a penalty bump the merit landscape rescales, so the trust state is
    # re-opened — but only to tr_bump_grow x the current working radius (capped
    # at tr_init): a full reset to tr_init wastes ~log2(tr_init/tr_work)
    # rejected iterations re-shrinking every continuation round.
    tr_bump_grow: float = 16.0
    # Filter-style second acceptance track: a step that reduces the raw
    # infeasibility (defect + violation) to <= filter_gamma of its current value
    # is accepted regardless of rho. This permits the large early
    # defect-digesting steps SCP needs (non-monotone in the penalized merit)
    # while the ratio track keeps the tail disciplined.
    filter_gamma: float = 0.9
    # Penalty weights. Exact-penalty theory needs w_nu > ||dynamics duals||_inf
    # (O(1)-O(10) for the nondimensional problems); far larger values cripple the
    # acceptance ratio, capping accepted steps at ~1/(w_nu * curvature).
    w_nu: float = 100.0          # L1 virtual-control (dynamics defect) weight
    w_feas: float = 100.0        # per-stage feasibility-buffer weight (state cones)
    w_sigma: float = 1.0         # time-of-flight weight (min-time term)
    w_mass: float = 0.0          # fuel weight: adds -w_mass * m_K to the cost
    # Penalty continuation (SCvx*-style): when the loop stalls (tiny steps) at an
    # infeasible point — a spurious minimum of the penalized merit — multiply the
    # penalty scale and reset the trust state. Small base weights keep the
    # acceptance ratio healthy early; continuation guarantees exactness late.
    penalty_grow: float = 10.0
    penalty_scale_max: float = 1e4
    # Warm-start hygiene: a subproblem solve ending with relative gap above this
    # is considered failed and the IPM warm-start carry is reset to the interior
    # unit point (also reset on every penalty bump — stale duals from a
    # differently-scaled objective poison subsequent solves).
    carry_reset_gap: float = 1e3
    # Convergence: step size below conv_tol_tr AND total (defect+violation) L1
    # below conv_tol_feas.
    conv_tol_tr: float = 1e-4
    conv_tol_feas: float = 1e-6
    conv_tol_nu: float = 1e-7  # legacy alias used by linear-merit checks
    # Guard: minimum sigma (time dilation) as a fraction of the initial guess.
    sigma_min_frac: float = 0.2
    sigma_max_frac: float = 4.0


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Top-level static config bundle."""

    disc: DiscretizationConfig = dataclasses.field(default_factory=DiscretizationConfig)
    ipm: IPMConfig = dataclasses.field(default_factory=IPMConfig)
    scvx: ScvxConfig = dataclasses.field(default_factory=ScvxConfig)
    # Compute dtype for the solver ("float32" on TPU, "float64" for CPU oracles).
    dtype: str = "float32"
    # Use the Pallas TPU kernels for the hot paths when available.
    use_pallas: bool = False
    free_final_time: bool = True

    # ------------------------------------------------------------------ serde
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "SolverConfig":
        d = dict(d)
        kwargs: dict[str, Any] = {}
        for sub_name, sub_cls in (
            ("disc", DiscretizationConfig),
            ("ipm", IPMConfig),
            ("scvx", ScvxConfig),
        ):
            if sub_name in d:
                sub = d.pop(sub_name)
                kwargs[sub_name] = sub_cls(**sub) if isinstance(sub, Mapping) else sub
        kwargs.update(d)
        return cls(**kwargs)

    @classmethod
    def from_yaml(cls, path: str) -> "SolverConfig":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})

    def replace(self, **kwargs) -> "SolverConfig":
        return dataclasses.replace(self, **kwargs)
