"""Checkpoint I/O.

Two tiers, mirroring the reference (SURVEY.md §5 Checkpoint/resume):
  * FULL training checkpoints (params + optimizer + step) via orbax, with
    latest-checkpoint discovery for auto-resume (ref utils.save_checkpoint
    / latest_checkpoint_path, s2_train.py:206-231)
  * DISTRIBUTION exports: fp16 weights + config + info in a single .npz
    (ref process_ckpt.savee:41 — fp16, enc_q dropped); reference-format
    .pth reading lives in utils/checkpoint_compat.py
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(state: Any, ckpt_dir: str, step: int, prefix: str = "state") -> str:
    ocp = _ocp()
    path = os.path.abspath(os.path.join(ckpt_dir, f"{prefix}_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def latest_checkpoint(ckpt_dir: str, prefix: str = "state") -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    best_step = -1
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(rf"{prefix}_(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def load_checkpoint(path: str, target: Any) -> Any:
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target)


# ---------------------------------------------------------------------------
# distribution export: fp16 weights + config + info (ref savee)
# ---------------------------------------------------------------------------


def export_weights(params: Any, path: str, *, config: dict | None = None, info: str = "", drop: tuple = ("enc_q",)) -> str:
    """Flatten a param pytree to an .npz with fp16 arrays. `drop` removes
    training-only submodules (the reference drops enc_q, savee:47)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in drop:
                    continue
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            arr = np.asarray(node)
            flat[prefix] = arr.astype(np.float16) if arr.dtype == np.float32 else arr

    walk(params, "")
    meta = json.dumps({"config": config or {}, "info": info})
    np.savez(path, __meta__=meta, **flat)
    return path


def load_weights(path: str, dtype=jnp.float32) -> tuple[dict, dict]:
    """-> (params pytree, meta dict)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    tree: dict = {}
    for key in data.files:
        if key == "__meta__":
            continue
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        node[parts[-1]] = jnp.asarray(arr.astype(np.float32) if arr.dtype == np.float16 else arr, dtype=dtype if arr.dtype in (np.float16, np.float32) else None)
    return tree, meta
