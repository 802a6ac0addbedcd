"""Metrics/observability + multi-host data distribution tests."""

import json
import os

import jax
import numpy as np

from gpt_sovits_tpu.parallel.launch import global_batch_from_local, host_info, host_shard, init
from gpt_sovits_tpu.parallel.mesh import make_mesh
from gpt_sovits_tpu.utils.metrics import MetricsLogger, PhaseTimer, ThroughputMeter


def test_metrics_logger(tmp_path):
    ml = MetricsLogger(str(tmp_path), echo=False)
    ml.log(1, loss=1.5, acc=0.25)
    ml.log(2, loss=1.2, acc=0.5)
    ml.close()
    lines = [json.loads(l) for l in open(ml.path)]
    assert len(lines) == 2
    assert lines[1]["loss"] == 1.2 and lines[1]["step"] == 2


def test_phase_timer_and_throughput():
    pt = PhaseTimer()
    with pt.phase("a"):
        sum(range(1000))
    with pt.phase("b"):
        pass
    assert "a:" in pt.report() and "total:" in pt.report()

    tm = ThroughputMeter(n_chips=2)
    with tm.measure(audio_seconds=10.0):
        sum(range(10000))
    d = tm.as_dict()
    assert d["audio_seconds"] == 10.0
    assert d["rtf"] > 0 and d["audio_s_per_s_per_chip"] > 0


def test_launch_single_process_noop_and_sharding():
    init()  # no-op single process
    info = host_info()
    assert info["process_count"] == 1
    items = list(range(10))
    assert host_shard(items) == items  # single host gets everything
    assert sorted(host_shard(items, shuffle_seed=0)) == items

    mesh = make_mesh(4, 2)
    batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    gb = global_batch_from_local(batch, mesh)
    assert gb["x"].shape == (8, 3)
    # batch dim sharded over 'data' (4-way), replicated over 'model' —
    # the NamedSharding spans all 8 mesh devices with 4 distinct shards
    assert len(gb["x"].sharding.device_set) == 8
    shard_starts = sorted(s.index[0].start or 0 for s in gb["x"].addressable_shards)
    assert shard_starts == [0, 0, 2, 2, 4, 4, 6, 6]
    np.testing.assert_array_equal(np.asarray(gb["x"]), batch["x"])
