"""Full training-state checkpointing (params + optimizer state + epoch).

The reference checkpoints only model weights and never exposes resume
(SURVEY.md §5; reference: m6anet/utils/training_utils.py:141-144).  Here a
checkpoint directory holds:

  model_states.npz   parameter pytree (flat keys, see utils/treeio.py)
  opt_state.npz      optimizer-state leaves in tree-flatten order
  meta.json          epoch + leaf count

Optimizer state is restored structurally: rebuild with ``optimizer.init`` on
the restored params, then substitute the stored leaves — robust to optax's
nested namedtuples without serialising their types.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from ..utils.treeio import load_tree, save_tree


def save_checkpoint(path: str, params, opt_state, epoch: int) -> None:
    os.makedirs(path, exist_ok=True)
    save_tree(os.path.join(path, "model_states.npz"), jax.device_get(params))
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(jax.device_get(opt_state))]
    np.savez(
        os.path.join(path, "opt_state.npz"),
        **{f"leaf_{i:04d}": leaf for i, leaf in enumerate(leaves)},
    )
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
        json.dump({"epoch": epoch, "n_leaves": len(leaves)}, f)


def restore_checkpoint(path: str, optimizer) -> Tuple[dict, object, int]:
    """Returns (params, opt_state, epoch)."""
    params = load_tree(os.path.join(path, "model_states.npz"))
    with open(os.path.join(path, "meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    opt_state = optimizer.init(params)
    treedef = jax.tree_util.tree_structure(opt_state)
    with np.load(os.path.join(path, "opt_state.npz")) as data:
        leaves = [data[f"leaf_{i:04d}"] for i in range(meta["n_leaves"])]
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, meta["epoch"]


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Most recent epoch directory under save_dir/model_states, if any."""
    root = os.path.join(save_dir, "model_states")
    if not os.path.isdir(root):
        return None
    epochs = [int(d) for d in os.listdir(root) if d.isdigit()]
    if not epochs:
        return None
    return os.path.join(root, str(max(epochs)))
