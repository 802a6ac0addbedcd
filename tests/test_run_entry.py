"""Library entry points (gpt_sovits_tpu/run.py): DP-mesh training over the
virtual 8-device CPU mesh, metrics logging, checkpoint export — the
single-controller replacement for the reference's mp.spawn+DDP trainers."""

import json
import os

import jax
import numpy as np
import pytest

from gpt_sovits_tpu.dsp.audio_io import save_wav
from gpt_sovits_tpu.prepare.extract import merge_semantic_shards, merge_text_shards, prepare_semantic, prepare_text
from gpt_sovits_tpu.run import latest_step_model, run_train_s1
from gpt_sovits_tpu.utils.config import S1Config

S1C = S1Config(
    vocab_size=18, phoneme_vocab_size=732, embedding_dim=24, hidden_dim=24,
    num_heads=4, ffn_dim=48, num_layers=2, eos_id=17, bert_dim=1024, max_len=2048,
)


@pytest.fixture()
def s1_exp(tmp_path):
    """Tiny S1 training artifacts (text + semantic TSVs), 8 utterances."""
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        name = f"u{i}.wav"
        save_wav(str(wav_dir / name), (rng.standard_normal(8000) * 0.1).astype(np.float32), 8000)
        lines.append(f"{wav_dir / name}|spk|en|utterance number {i} spoken here")
    manifest = tmp_path / "files.list"
    manifest.write_text("\n".join(lines))
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    prepare_text(str(manifest), exp)
    merge_text_shards(exp, 1)
    os.makedirs(os.path.join(exp, "4-cnhubert"))
    for i in range(8):  # SSL features normally from stage 1b (prepare_audio)
        np.save(os.path.join(exp, "4-cnhubert", f"u{i}.wav.npy"),
                rng.standard_normal((80, 8)).astype(np.float32))
    prepare_semantic(str(manifest), exp,
                     extract_latent_fn=lambda ssl: (np.arange(40) * 3 % 17).astype(np.int64))
    merge_semantic_shards(exp, 1)
    return exp


def test_run_train_s1_dp_mesh(s1_exp, tmp_path):
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh
    ckpt = str(tmp_path / "ckpt")
    run_train_s1(s1_exp, ckpt, batch_size=8, epochs=1, save_every=1,
                 model_cfg=S1C, data_parallel=True, log=lambda *a, **k: None)
    # reference-format + npz exports landed
    assert latest_step_model(ckpt, ".ckpt") and latest_step_model(ckpt, ".npz")
    # per-epoch metrics logged (TB-scalar equivalent, s2_train.py:475-524)
    mpath = os.path.join(ckpt, "logs", "metrics.jsonl")
    recs = [json.loads(l) for l in open(mpath)]
    assert recs and "loss" in recs[-1] and np.isfinite(recs[-1]["loss"])


def test_dp_mesh_requires_divisible_batch(s1_exp, tmp_path):
    with pytest.raises(ValueError, match="not divisible"):
        run_train_s1(s1_exp, str(tmp_path / "c2"), batch_size=3, epochs=1,
                     model_cfg=S1C, data_parallel=True, log=lambda *a, **k: None)


def test_bucket_sampler_equal_shards():
    """Multi-host DP: every shard sees the same number of batches (unequal
    counts would deadlock collectives on the tail step)."""
    from gpt_sovits_tpu.train.data import BucketSampler

    rng = np.random.default_rng(0)
    lengths = rng.integers(10, 500, size=41).tolist()
    shards = [BucketSampler(lengths, 4, seed=7, num_shards=3, shard_id=s).epoch_batches(2) for s in range(3)]
    assert len({len(s) for s in shards}) == 1
    seen = [tuple(b.tolist()) for s in shards for b in s]
    assert len(seen) == len(set(seen))  # disjoint


def test_dp_sampler_args_single_host():
    from gpt_sovits_tpu.run import _dp_mesh, _dp_sampler_args

    mesh = _dp_mesh(True, 8)
    args = _dp_sampler_args(mesh, 8)
    assert args == {"batch_size": 8}  # process_count == 1: no host sharding
