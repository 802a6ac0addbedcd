"""Device mesh + sharding rules (SURVEY.md §2.7 TPU mapping).

The reference's only distribution strategy is single-node DDP over NCCL
(s2_train.py:80-85, s1_train.py:123-125). Here the equivalents are
compiler-inserted collectives from shardings on a (data, model) mesh:

  * DP: batch arrays sharded on 'data'; gradient mean becomes an ICI psum
    inserted by XLA (replacing NCCL allreduce)
  * TP: large kernels sharded on 'model' (the reference has no TP; models
    are small, so this matters for serving at large batch and for the
    DiT-300M v3 path)
  * multi-host: jax.distributed + per-host data feeding (replacing the
    mp.spawn + env-var sharding of the reference webui)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis DP sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Parameter partitioning: megatron-style TP for wide kernels.
# ---------------------------------------------------------------------------

_TP_MIN_DIM = 512  # only shard kernels at least this wide


def param_pspec(path: tuple, value: Any) -> P:
    """Partition rule for a parameter leaf.

    Dense/conv kernels with a wide output dim shard that dim over 'model';
    embeddings shard the vocab dim; everything else is replicated. Keeping
    the rule shape-driven (not name-driven) makes it robust across models.
    """
    shape = getattr(value, "shape", ())
    if len(shape) >= 2 and shape[-1] >= _TP_MIN_DIM and shape[-1] % 2 == 0:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    if len(shape) == 2 and shape[0] >= 4096:  # large embedding tables
        return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply param_pspec over a param pytree, returning device-put params."""

    def _leaf(path, v):
        spec = param_pspec(path, v)
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_leaf, params)


def shard_batch(batch, mesh: Mesh):
    """Device-put a batch pytree with leading-axis data parallelism."""
    s = batch_sharding(mesh)

    def _leaf(v):
        if hasattr(v, "ndim") and v.ndim >= 1:
            return jax.device_put(v, s)
        return jax.device_put(v, replicated(mesh))

    return jax.tree_util.tree_map(_leaf, batch)
