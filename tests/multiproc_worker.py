"""Worker for the multi-process distributed test (test_multiprocess.py).

Runs ONE S2 GAN train step on a (data=8, model=1) mesh, either as one of
N jax.distributed processes (each with 4 virtual CPU devices, gloo
collectives over localhost) or standalone with all 8 devices, and writes
process-0 metrics as JSON. The same global batch and seeds are used in
both topologies, so the losses must agree.

Usage: python multiproc_worker.py <out.json> single
       python multiproc_worker.py <out.json> multi <pid> <nproc> <port>
"""

import json
import os
import sys

out_path, mode = sys.argv[1], sys.argv[2]
n_local = 8 if mode == "single" else 4
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if mode == "multi":
    pid, nproc, port = int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_s2_train import CFG, MEL, TRAIN, _batch  # noqa: E402

from gpt_sovits_tpu.parallel import launch  # noqa: E402
from gpt_sovits_tpu.parallel.mesh import make_mesh, param_pspec  # noqa: E402
from gpt_sovits_tpu.train.s2_train import init_state, make_train_step  # noqa: E402


def put_replicated(tree, mesh):
    """Multi-process-safe replication: every process holds the full value."""

    def _leaf(path, v):
        s = NamedSharding(mesh, param_pspec(path, v))
        return jax.make_array_from_process_local_data(s, np.asarray(v))

    return jax.tree_util.tree_map_with_path(_leaf, tree)


def main():
    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh(8, 1)

    # same global batch everywhere (seeded), b=8 rows = one per device
    batch = _batch(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(
        lambda x: np.concatenate([np.asarray(x)] * 4, axis=0), batch
    )  # test batch is b=2 -> b=8

    with mesh:
        state, gen, disc = init_state(jax.random.PRNGKey(1), CFG, TRAIN, batch)
        state = state.replace(
            params_g=put_replicated(state.params_g, mesh),
            params_d=put_replicated(state.params_d, mesh),
        )
        if mode == "multi":
            # per-host shard of the global batch: this process's 4 rows
            local = {k: v[pid * 4 : (pid + 1) * 4] for k, v in batch.items()}
            gbatch = launch.global_batch_from_local(local, mesh)
        else:
            s = NamedSharding(mesh, P("data"))
            gbatch = {k: jax.device_put(jnp.asarray(v), s) for k, v in batch.items()}
        step = make_train_step(gen, disc, TRAIN, MEL)
        state, metrics = step(state, gbatch, jax.random.PRNGKey(2))
        metrics = {k: float(v) for k, v in metrics.items()}

    if mode == "single" or pid == 0:
        with open(out_path, "w") as f:
            json.dump(dict(metrics, process_count=jax.process_count()), f)


if __name__ == "__main__":
    main()
