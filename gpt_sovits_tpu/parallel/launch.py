"""Multi-host launch + data distribution.

TPU-native replacement for the reference's mp.spawn + env-var GPU sharding
(webui.py:1082-1096, s2_train.py:58-68): one python process per host,
`jax.distributed.initialize` for the DCN process group, per-host input
feeding with `make_array_from_process_local_data`, and compiler-inserted
ICI collectives from the mesh shardings (parallel/mesh.py).

Run on each host of a slice:
  python -m gpt_sovits_tpu.cli train-s2 ... (after launch.init())
TPU pods set the coordinator env automatically; elsewhere pass
coordinator_address/num_processes/process_id explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host process group (no-op single-process)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_shard(items: list, *, shuffle_seed: Optional[int] = None) -> list:
    """Deterministic per-host slice of a global work list (replaces the
    reference's lines[i_part::all_parts])."""
    if shuffle_seed is not None:
        order = np.random.default_rng(shuffle_seed).permutation(len(items))
        items = [items[i] for i in order]
    return items[jax.process_index() :: jax.process_count()]


def global_batch_from_local(local_batch: dict, mesh: Mesh) -> dict:
    """Assemble a globally-sharded batch from per-host local arrays.

    Each host feeds its own shard; the result is one jax.Array per leaf,
    sharded batch-dim over the mesh's 'data' axis (DP over DCN+ICI)."""
    sharding = NamedSharding(mesh, P("data"))

    def _leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(_leaf, local_batch)
