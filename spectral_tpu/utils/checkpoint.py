"""Checkpoint / resume of solver state.

The reference has no checkpointing (SURVEY.md section 5.4); its only
resilience mechanism is the continuation loop approaching hard parameters
gradually (stokes.C:217-235).  Here each continuation step's solution pytree
can be persisted and the loop resumed mid-schedule — npz-based (no external
dependencies), with an orbax path available for multi-host runs.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def save_state(directory: str, step: int, x: Any, meta: dict | None = None) -> str:
    """Persist a solution pytree as step_<n>.npz + meta sidecar."""
    os.makedirs(directory, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(x)
    path = os.path.join(directory, f"step_{step:04d}.npz")
    np.savez(path, *[np.asarray(l) for l in leaves])
    sidecar = {"step": step, "treedef": str(treedef), "meta": meta or {}}
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(f[len("step_"):-len(".npz")]) for f in os.listdir(directory)
             if f.startswith("step_") and f.endswith(".npz")
             and f[len("step_"):-len(".npz")].isdigit()]
    return max(steps) if steps else None


def load_state(directory: str, step: int, like: Any) -> Any:
    """Load the pytree saved at ``step``; ``like`` provides the structure."""
    path = os.path.join(directory, f"step_{step:04d}.npz")
    data = np.load(path)
    leaves = [data[k] for k in data.files]
    _, treedef = jax.tree_util.tree_flatten(like)
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(treedef, [jnp.asarray(l) for l in leaves])


def load_meta(directory: str, step: int) -> dict:
    path = os.path.join(directory, f"step_{step:04d}.npz.json")
    with open(path) as f:
        return json.load(f).get("meta", {})


# -- optional orbax backend (multi-host friendly) ---------------------------

def save_state_orbax(directory: str, step: int, x: Any) -> str:
    """Orbax-backed save (sharded/multi-host capable); optional dependency."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"orbax_{step:04d}"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, x, force=True)
    return path


def load_state_orbax(directory: str, step: int, like: Any = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"orbax_{step:04d}"))
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path, item=like)
