"""v3 CFM trainer tests: full fine-tune freezing + LoRA-only updates."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3
from gpt_sovits_tpu.train.s2_train_v3 import (
    V3TrainState,
    init_lora,
    init_state,
    make_lora_train_step,
    make_train_step,
    merge_lora,
)
from gpt_sovits_tpu.utils.config import S2Config, TrainConfig

from test_v3 import V3_TINY  # tiny v3 config

B, TS, TSPEC, TT, TMEL = 2, 24, 24, 6, 45


def _batch(key):
    ks = jax.random.split(key, 4)
    return {
        "ssl": jax.random.normal(ks[0], (B, TS, V3_TINY.ssl_dim)),
        "spec": jax.random.normal(ks[1], (B, TSPEC, V3_TINY.spec_channels)) * 0.3,
        "spec_lengths": jnp.asarray([TSPEC, TSPEC - 4]),
        "mel": jax.random.normal(ks[2], (B, TMEL, 20)) * 0.3,
        "mel_lengths": jnp.asarray([TMEL, TMEL - 6]),
        "text": jax.random.randint(ks[3], (B, TT), 0, 100),
        "text_lengths": jnp.asarray([TT, TT - 2]),
    }


def test_v3_train_step_freezes_front():
    model = SynthesizerTrnV3(V3_TINY)
    batch = _batch(jax.random.PRNGKey(0))
    state = init_state(jax.random.PRNGKey(1), model, TrainConfig(batch_size=B), batch)
    enc_p_before = np.asarray(jax.tree_util.tree_leaves(state.params["params"]["enc_p"])[0]).copy()
    vq_before = np.asarray(state.params["params"]["quantizer"]["embed"]).copy()
    dit_before = np.asarray(jax.tree_util.tree_leaves(state.params["params"]["cfm"])[0]).copy()

    step = make_train_step(model, TrainConfig(batch_size=B))
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["cfm_loss"]))
    np.testing.assert_array_equal(np.asarray(state.params["params"]["quantizer"]["embed"]), vq_before)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.params["params"]["enc_p"])[0]), enc_p_before
    )
    dit_after = np.asarray(jax.tree_util.tree_leaves(state.params["params"]["cfm"])[0])
    assert not np.allclose(dit_after, dit_before)


def test_lora_init_merge_and_step():
    model = SynthesizerTrnV3(V3_TINY)
    batch = _batch(jax.random.PRNGKey(3))
    state = init_state(jax.random.PRNGKey(4), model, TrainConfig(batch_size=B), batch)
    lora = init_lora(state.params, rank=2, key=jax.random.PRNGKey(5))
    # lora targets exist (to_q etc. inside DiT blocks)
    leaves = jax.tree_util.tree_leaves(lora)
    assert leaves, "no lora targets found"
    # zero-init delta: merged == base
    merged = merge_lora(state.params, lora)
    for a, b in zip(jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from gpt_sovits_tpu.train.s2_train_v3 import make_lora_optimizer

    cfg = TrainConfig(batch_size=B, learning_rate=1e-3)
    opt_step = make_lora_train_step(model, cfg)
    state = V3TrainState(state.step, state.params, make_lora_optimizer(cfg).init(lora), lora)
    base_before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, m = opt_step(state, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(m["cfm_loss"]))
    # base unchanged, lora changed
    np.testing.assert_array_equal(np.asarray(jax.tree_util.tree_leaves(state.params)[0]), base_before)
    b_leaves = [l for l in jax.tree_util.tree_leaves(state.lora)]
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in b_leaves)


def test_v3_dataset_collate_and_train_step(tmp_path):
    """V3Dataset (ref TextAudioSpeakerLoaderV3, data_utils.py:285): exp-dir
    artifacts -> (ssl, spec, normalized mel, text) batches that drive the CFM
    train step end-to-end."""
    import os

    from gpt_sovits_tpu.dsp.audio_io import save_wav
    from gpt_sovits_tpu.models.hubert import HubertConfig, HubertEncoder
    from gpt_sovits_tpu.prepare.extract import merge_text_shards, prepare_audio, prepare_text
    from gpt_sovits_tpu.train.data import BucketSampler, V3Dataset
    from gpt_sovits_tpu.utils.config import MelConfig, replace

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    exp_dir = str(tmp_path / "exp")
    os.makedirs(exp_dir)
    rng = np.random.default_rng(0)
    lines = []
    for i, txt in enumerate(["hello world sample", "testing the v3 loader"]):
        name = f"u{i}.wav"
        save_wav(str(wav_dir / name), (rng.standard_normal(8000 + i * 1600) * 0.1).astype(np.float32), 8000)
        lines.append(f"{wav_dir / name}|spk|en|{txt}")
    manifest = tmp_path / "files.list"
    manifest.write_text("\n".join(lines))

    hub_cfg = HubertConfig(conv_dim=16, conv_kernels=(10, 3, 2), conv_strides=(5, 2, 2),
                           hidden_size=48, num_layers=1, num_heads=4, intermediate_size=32,
                           pos_conv_kernel=8, pos_conv_groups=4)
    hub = HubertEncoder(hub_cfg)
    hub_params = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 800)))
    hub_fwd = jax.jit(hub.apply)
    prepare_text(str(manifest), exp_dir)
    merge_text_shards(exp_dir, 1)
    prepare_audio(str(manifest), exp_dir,
                  hubert_fn=lambda w: np.asarray(hub_fwd(hub_params, jnp.asarray(w[None])))[0])

    mel = MelConfig(sampling_rate=8000, n_fft=128, win_size=128, hop_size=64, num_mels=13)
    mel_v = MelConfig(sampling_rate=4000, n_fft=64, win_size=64, hop_size=32, num_mels=20)
    ds = V3Dataset(exp_dir, version="v3", mel_cfg=mel, mel_cfg_v=mel_v, min_frames=4)
    assert len(ds) == 2
    batch = ds.collate(list(BucketSampler(ds.lengths(), 2, seed=0, bucket_width=1000).epoch_batches(0)[0]))
    assert batch["mel"].shape[-1] == 20 and batch["spec"].shape[-1] == 65
    assert (batch["mel_lengths"] > 0).all() and np.isfinite(batch["mel"]).all()
    # mel is norm_spec'd into roughly [-1, 1]
    assert batch["mel"].min() >= -1.5 and batch["mel"].max() <= 1.5

    cfg = replace(V3_TINY, ssl_dim=48)
    model = SynthesizerTrnV3(cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = init_state(jax.random.PRNGKey(1), model, TrainConfig(batch_size=2), jb)
    step = make_train_step(model, TrainConfig(batch_size=2))
    state, m = step(state, jb, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["cfm_loss"]))
