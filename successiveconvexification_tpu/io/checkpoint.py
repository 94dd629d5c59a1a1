"""Checkpoint / resume for Monte-Carlo sweeps (SURVEY.md §5).

The reference has nothing here (seconds-long runs). Ours: the sweep carry
(batched ScvxState + params + RNG key + config hash) is checkpointed via Orbax
with an .npz fallback, so multi-host runs recover from host loss by reload +
reshard (scenario shards are stateless beyond the carry). Determinism: lane RNG
is folded from scenario indices, never wall clock.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Optional

import jax
import numpy as np


def config_hash(cfg) -> str:
    return hashlib.sha256(
        json.dumps(cfg.to_dict(), sort_keys=True).encode()
    ).hexdigest()[:16]


def _flatten_with_paths(tree):
    flat, treedef = jax.tree.flatten(tree)
    return flat, treedef


def save(path: str, sweep_state, cfg=None, step: int = 0) -> None:
    """Save a pytree sweep state. Uses Orbax if available, else npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta = {"step": step}
    if cfg is not None:
        meta["config_hash"] = config_hash(cfg)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), jax.tree.map(np.asarray, sweep_state),
                   force=True)
        ckptr.wait_until_finished()
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
        return
    except Exception:
        pass
    flat, _ = _flatten_with_paths(sweep_state)
    np.savez(
        path + ".npz", *[np.asarray(x) for x in flat], _meta=json.dumps(meta)
    )


def restore(path: str, like, cfg=None):
    """Restore a sweep state saved by ``save``; ``like`` provides the pytree
    structure (e.g. a freshly-initialized state of the same shapes)."""
    if cfg is not None and os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        if meta.get("config_hash") not in (None, config_hash(cfg)):
            raise ValueError(
                "checkpoint was written with a different config "
                f"({meta.get('config_hash')} != {config_hash(cfg)})"
            )
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(
                os.path.abspath(path), jax.tree.map(np.asarray, like)
            )
    except Exception:
        pass
    data = np.load(path + ".npz", allow_pickle=False)
    flat, treedef = _flatten_with_paths(like)
    arrs = [data[f"arr_{i}"] for i in range(len(flat))]
    return jax.tree.unflatten(treedef, arrs)
