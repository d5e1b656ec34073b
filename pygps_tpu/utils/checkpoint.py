"""Checkpoint / resume.

The reference has no checkpointing (model state is just hyp lists +
arrays, pickled by the user — SURVEY.md §5.4).  Here: versioned .npz
checkpoints of any pytree (hyperparameter functors, optimizer state,
NUTS/HMC chain states + PRNG keys, SVGP params), so a lost host resumes a
sampling run from the last draw batch (§5.3 elastic-recovery story).
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax.numpy as jnp
from jax import tree_util

_FORMAT_VERSION = 1


def save(path: str, pytree, meta: dict | None = None) -> None:
    """Save any pytree (functors included) to ``path`` (.npz)."""
    leaves, treedef = tree_util.tree_flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"version": _FORMAT_VERSION, "n_leaves": len(leaves),
                    **(meta or {})}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)          # atomic publish


def load(path: str, like):
    """Restore a checkpoint into the structure of ``like`` (same treedef).

    Returns (pytree, meta).  Structure is validated leaf-count-wise; dtype
    follows the stored arrays."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        leaves_like, treedef = tree_util.tree_flatten(like)
        n = meta["n_leaves"]
        if n != len(leaves_like):
            raise ValueError(
                f"checkpoint has {n} leaves; target structure has "
                f"{len(leaves_like)}")
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    return tree_util.tree_unflatten(treedef, leaves), meta


def save_model(path: str, model) -> None:
    """Checkpoint a GP model's prior functors + data reference shapes."""
    save(path, (model.meanfunc, model.covfunc, model.likfunc),
         meta={"kind": type(model).__name__,
               "n": 0 if model.x is None else int(model.x.shape[0])})


def load_model(path: str, model):
    """Restore prior functors into an existing, structurally-matching
    model."""
    (m, k, l), meta = load(path, (model.meanfunc, model.covfunc,
                                  model.likfunc))
    model.meanfunc, model.covfunc, model.likfunc = m, k, l
    model.posterior = None
    return model, meta
