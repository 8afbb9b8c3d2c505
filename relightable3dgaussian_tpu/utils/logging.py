"""Training observability: scalar logging, image grids, snapshot dumps.

Replaces the reference's TensorBoard wiring (/root/reference/train.py:209-273
`training_report`, :276-317 `save_training_vis`, utils/system_utils.py:44-64):
  * MetricsLogger writes every scalar to metrics.jsonl (always) and to
    TensorBoard when torch.utils.tensorboard is importable;
  * save_training_vis renders a labeled grid of every image-like entry in a
    results dict to PNG;
  * debug_dump snapshots a pytree of inputs to npz — the analogue of the
    CUDA snapshot_fw.dump repro files
    (gaussian_renderer/r3dg_rasterization.py:102-110).
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: dict[str, Any],
                prefix: str = "") -> None:
        rec = {"step": step}
        for k, v in values.items():
            try:
                rec[prefix + k] = float(np.asarray(v))
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def image(self, step: int, tag: str, img_chw: np.ndarray) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, np.clip(np.asarray(img_chw), 0, 1), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def _to_display(img: np.ndarray) -> np.ndarray | None:
    """Normalize an array to [H, W, 3] float for grid display, or None."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3):
        img = np.moveaxis(img, 0, -1)
    if img.ndim == 2:
        img = img[..., None]
    if img.ndim != 3 or img.shape[-1] not in (1, 3):
        return None
    if img.shape[-1] == 1:
        lo, hi = float(img.min()), float(img.max())
        img = (img - lo) / (hi - lo + 1e-9)
        img = np.repeat(img, 3, -1)
    return np.clip(img.astype(np.float32), 0.0, 1.0)


def save_training_vis(path: str, results: dict[str, Any],
                      keys: list[str] | None = None,
                      cols: int = 4) -> list[str]:
    """Save a labeled grid of every image-like tensor in a results dict
    (reference save_training_vis, train.py:276-317). Returns the keys shown."""
    from ..scene.image_io import save_image_u8
    panels, names = [], []
    for k, v in results.items():
        if keys is not None and k not in keys:
            continue
        if not hasattr(v, "shape") or np.ndim(v) not in (2, 3):
            continue
        v = np.asarray(v)
        if "normal" in k and v.ndim == 3 and v.shape[0] == 3:
            v = v * 0.5 + 0.5  # [-1,1] → display range
        disp = _to_display(v)
        # Only image-like arrays (skip per-point [P, C] tensors).
        if disp is None or min(disp.shape[0], disp.shape[1]) < 8:
            continue
        panels.append(disp)
        names.append(k)
    if not panels:
        return []
    h = max(p.shape[0] for p in panels)
    w = max(p.shape[1] for p in panels)
    rows = -(-len(panels) // cols)
    grid = np.zeros((rows * h, cols * w, 3), np.float32)
    for i, p in enumerate(panels):
        r, c = divmod(i, cols)
        grid[r * h:r * h + p.shape[0], c * w:c * w + p.shape[1]] = p
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_image_u8(path, grid)
    return names


def debug_dump(path: str, **pytrees: Any) -> str:
    """Snapshot named pytrees to an npz for offline repro (the TPU analogue
    of the reference's snapshot_fw.dump on kernel failure)."""
    import jax
    out = {}
    for name, tree in pytrees.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for p, leaf in leaves:
            key = name + jax.tree_util.keystr(p)
            try:
                out[key] = np.asarray(leaf)
            except Exception:
                pass
    path = path if path.endswith(".npz") else path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **out)
    return path
