"""Training checkpoints: capture/restore full training state.

Replaces the reference's positional torch.save tuples
(/root/reference/scene/gaussian_model.py:114-180, train.py:190-203) with a
named npz of the flattened state pytree — robust to field evolution and
readable without the framework. Environment-light checkpoints follow the
same `<name>_chkpnt<iter>` convention so drivers can rediscover them.
"""
from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any, prefix: str, out: dict) -> None:
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + "".join(
            f".{p.name}" if hasattr(p, "name") else f"[{p.idx}]"
            for p in path)
        out[key] = np.asarray(leaf)


def save_checkpoint(path: str, iteration: int, **states: Any) -> None:
    """Save named state pytrees (params=..., aux=..., opt_state=...)."""
    out: dict[str, np.ndarray] = {"__iteration__": np.asarray(iteration)}
    for name, tree in states.items():
        _flatten(tree, name, out)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **out)


def load_checkpoint(path: str, **templates: Any):
    """Restore states into the given template pytrees.

    Returns (iteration, {name: restored_tree}). Leaves missing from the file
    keep the template's value (forward compatibility); extra file entries are
    ignored.
    """
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    iteration = int(data["__iteration__"])
    restored = {}
    for name, template in templates.items():
        flat: dict[str, np.ndarray] = {}
        _flatten(template, name, flat)
        leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
            template)
        new_leaves = []
        import jax.numpy as jnp
        for path_elems, leaf in leaves_with_paths:
            key = name + "".join(
                f".{p.name}" if hasattr(p, "name") else f"[{p.idx}]"
                for p in path_elems)
            if key in data and (
                    not hasattr(leaf, "shape")
                    or data[key].shape == leaf.shape):
                arr = data[key]
                if hasattr(leaf, "dtype"):
                    arr = arr.astype(leaf.dtype)
                new_leaves.append(jnp.asarray(arr))
            else:
                # Missing or shape-mismatched (e.g. a stage-1 checkpoint's
                # empty PBR leaves restored into a PBR-sized template,
                # gaussian_model.py:389-405 bootstrap) → keep the template.
                new_leaves.append(leaf)
        restored[name] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return iteration, restored


def find_checkpoint(model_path: str, prefix: str = "chkpnt") -> str | None:
    """Latest `<prefix><iter>.npz` under model_path (train.py:63-69 style)."""
    if not os.path.isdir(model_path):
        return None
    best, best_it = None, -1
    pat = re.compile(rf"^{re.escape(prefix)}(\d+)\.npz$")
    for fn in os.listdir(model_path):
        m = pat.match(fn)
        if m and int(m.group(1)) > best_it:
            best_it = int(m.group(1))
            best = os.path.join(model_path, fn)
    return best
