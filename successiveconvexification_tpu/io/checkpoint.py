"""Checkpoint / resume for Monte-Carlo sweeps (SURVEY.md §5).

The reference has nothing here (seconds-long runs). Ours: the sweep carry
(batched ScvxState + params + RNG key + config hash) is checkpointed via Orbax
with an .npz fallback; multi-host runs use ``save_sharded``/``restore_sharded``
(each process writes only its addressable shards, restore rebuilds the global
arrays shard-by-shard — no host-gather), exercised end-to-end by the
kill-one-process fault-injection test (tests/test_fault_recovery.py).
Determinism: lane RNG is folded from scenario indices, never wall clock.
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


# ---------------------------------------------------------------------------
# Shard-aware save / restore (multi-host recovery, SURVEY §5)
# ---------------------------------------------------------------------------
# ``save``/``restore`` above round-trip through np.asarray, which on a
# multi-host sweep would all-gather the full batch onto every host. The
# sharded variants write only each process's ADDRESSABLE shards to a
# process-local file and rebuild the global arrays shard-by-shard with
# ``jax.make_array_from_callback`` — no host ever materializes the sweep.
# Restore works with ANY process count whose sharding tiles the same global
# shapes (the recovery ensemble may be smaller than the one that crashed,
# e.g. the 2-process fault-injection test resuming single-process).


def _index_key(leaf_i: int, index) -> str:
    parts = []
    for sl in index:
        start = "" if sl.start is None else int(sl.start)
        stop = "" if sl.stop is None else int(sl.stop)
        parts.append(f"{start}_{stop}")
    return f"leaf{leaf_i}|" + "|".join(parts)


def save_sharded(path: str, sweep_state, cfg=None, step: int = 0) -> None:
    """Save only this process's addressable shards (one .npz per process)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pid = jax.process_index()
    flat, _ = jax.tree.flatten(sweep_state)
    blobs = {}
    for leaf_i, leaf in enumerate(flat):
        if hasattr(leaf, "addressable_shards") and leaf.addressable_shards:
            for sh in leaf.addressable_shards:
                key = _index_key(leaf_i, sh.index)
                if key not in blobs:          # replicas: first copy wins
                    blobs[key] = np.asarray(sh.data)
        else:
            blobs[_index_key(leaf_i, (slice(None),))] = np.asarray(leaf)
    meta = {"step": step}
    if cfg is not None:
        meta["config_hash"] = config_hash(cfg)
    # atomic write: a process killed mid-save (the exact fault this module
    # exists for) must not destroy the previous good checkpoint — write to a
    # tmp file and rename into place (os.replace is atomic on POSIX)
    final = f"{path}.shard{pid}.npz"
    tmp = f"{final}.tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, _meta=json.dumps(meta), **blobs)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, final)


def restore_sharded(path: str, like, shardings=None, cfg=None):
    """Rebuild the sweep state from every process's shard file.

    ``like``: pytree of arrays (or ShapeDtypeStructs) giving global
    shapes/dtypes. ``shardings``: matching pytree of ``jax.sharding.Sharding``
    (default: each leaf of ``like``'s sharding if it has one, else fully
    replicated on the default device).
    """
    import glob as _glob

    files = sorted(_glob.glob(f"{path}.shard*.npz"))
    if not files:
        raise FileNotFoundError(f"no shard files under {path}.shard*.npz")
    data: dict[str, np.ndarray] = {}
    meta = None
    for f in files:
        z = np.load(f, allow_pickle=False)
        if meta is None and "_meta" in z:
            meta = json.loads(str(z["_meta"]))
        for k in z.files:
            if k != "_meta" and k not in data:
                data[k] = z[k]
    if cfg is not None and meta is not None:
        if meta.get("config_hash") not in (None, config_hash(cfg)):
            raise ValueError("checkpoint was written with a different config")

    flat_like, treedef = jax.tree.flatten(like)
    if shardings is None:
        flat_sh = [getattr(l, "sharding", None) for l in flat_like]
    else:
        flat_sh = jax.tree.flatten(shardings)[0]

    def _leaf_reader(leaf_i, shape, dtype):
        # assemble the full leaf lazily per requested index
        def read(index):
            key = _index_key(leaf_i, tuple(index))
            if key in data:
                return data[key]
            # requested tile differs from the saved tiling: rebuild the full
            # array from the saved tiles, then slice. Track coverage — a
            # missing tile (host died before/while writing its shard file)
            # must raise, never be silently zero-filled as "recovered" state.
            full = np.zeros(shape, dtype)
            covered = np.zeros(shape, bool)
            prefix = f"leaf{leaf_i}|"
            for k, v in data.items():
                if not k.startswith(prefix):
                    continue
                sls = []
                for dim, part in enumerate(k[len(prefix):].split("|")):
                    s_, e_ = part.split("_")
                    sls.append(slice(
                        int(s_) if s_ else None, int(e_) if e_ else None
                    ))
                full[tuple(sls)] = v
                covered[tuple(sls)] = True
            if not covered[tuple(index)].all():
                raise ValueError(
                    f"checkpoint shard files do not cover leaf {leaf_i} "
                    f"index {tuple(index)}: a shard file is missing or was "
                    "written partially (restore refused — zero-filling would "
                    "fabricate state)"
                )
            return full[tuple(index)]

        return read

    out = []
    for leaf_i, (l, sh) in enumerate(zip(flat_like, flat_sh)):
        shape = tuple(l.shape)
        dtype = l.dtype
        if sh is None:
            full = _leaf_reader(leaf_i, shape, dtype)((slice(None),) * len(shape))
            out.append(jax.numpy.asarray(full, dtype))
        else:
            out.append(jax.make_array_from_callback(
                shape, sh, _leaf_reader(leaf_i, shape, dtype)
            ))
    return jax.tree.unflatten(treedef, out)
