"""One-click end-to-end: corpus -> prepare -> S2 GAN training -> S1 training
-> zero-shot synthesis with the trained weights.

Equivalent of the reference's test_demo.sh 9-step CLI pipeline, on tiny
models so it runs in CI.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.dsp.audio_io import save_wav
from gpt_sovits_tpu.infer.pipeline import TTSPipeline
from gpt_sovits_tpu.models.hubert import HubertConfig, HubertEncoder
from gpt_sovits_tpu.models.t2s import T2SDecoder
from gpt_sovits_tpu.prepare.extract import merge_semantic_shards, merge_text_shards, prepare_audio, prepare_semantic, prepare_text
from gpt_sovits_tpu.train.data import BucketSampler, S1Dataset, S2Dataset
from gpt_sovits_tpu.train.s1_train import init_state as s1_init, make_train_step as s1_step_fn
from gpt_sovits_tpu.train.s2_train import init_state as s2_init, make_train_step as s2_step_fn
from gpt_sovits_tpu.utils.config import InferenceConfig, MelConfig, S1Config, S2Config, TrainConfig

MEL = MelConfig(sampling_rate=8000, n_fft=128, win_size=128, hop_size=64, num_mels=13)

HUB = HubertConfig(
    conv_dim=16, conv_kernels=(10, 2), conv_strides=(8, 4),  # /32 like spec hop/2
    hidden_size=24, num_layers=1, num_heads=4, intermediate_size=32,
    pos_conv_kernel=8, pos_conv_groups=4,
)

S2C = S2Config(
    version="v2", spec_channels=65, segment_size=4, inter_channels=24,
    hidden_channels=24, filter_channels=32, n_heads=2, n_layers=4, kernel_size=3,
    upsample_rates=(8, 8), upsample_initial_channel=32, upsample_kernel_sizes=(16, 16),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    gin_channels=24, mrte_hidden=24, ssl_dim=24, n_codes=17,
)

S1C = S1Config(
    vocab_size=18, phoneme_vocab_size=732, embedding_dim=24, hidden_dim=24,
    num_heads=4, ffn_dim=48, num_layers=2, eos_id=17, bert_dim=1024, max_len=2048,
)


def test_full_pipeline(tmp_path):
    # --- 1. corpus ---
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    exp_dir = str(tmp_path / "exp")
    os.makedirs(exp_dir)
    rng = np.random.default_rng(0)
    lines = []
    texts = ["hello world sample", "testing the pipeline", "one more utterance here", "final sample for training"]
    for i, txt in enumerate(texts):
        name = f"u{i}.wav"
        save_wav(str(wav_dir / name), (rng.standard_normal(8000 + i * 1600) * 0.1).astype(np.float32), 8000)
        lines.append(f"{wav_dir / name}|spk|en|{txt}")
    manifest = tmp_path / "files.list"
    manifest.write_text("\n".join(lines))

    # --- 2. feature extraction with the real (random-weight) tiny models ---
    hub = HubertEncoder(HUB)
    hub_params = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 800)))
    hub_fwd = jax.jit(hub.apply)

    prepare_text(str(manifest), exp_dir)
    merge_text_shards(exp_dir, 1)
    prepare_audio(str(manifest), exp_dir, hubert_fn=lambda w: np.asarray(hub_fwd(hub_params, jnp.asarray(w[None])))[0])

    def latent_fn(ssl):
        # stride-2 "vq" stand-in with the right cardinality
        return (np.abs(ssl[::2, :4]).sum(-1) * 7).astype(np.int64) % S2C.n_codes

    prepare_semantic(str(manifest), exp_dir, extract_latent_fn=latent_fn)
    merge_semantic_shards(exp_dir, 1)

    # --- 3. S2 GAN training ---
    tc = TrainConfig(batch_size=2, segment_size=S2C.segment_size * MEL.hop_size)
    ds2 = S2Dataset(exp_dir, mel_cfg=MEL, min_frames=4, max_frames=1600)
    assert len(ds2) == 4
    sampler2 = BucketSampler(ds2.lengths(), 2, seed=1, bucket_width=1000)
    batches = sampler2.epoch_batches(0)
    batch = {k: jnp.asarray(v) for k, v in ds2.collate(batches[0]).items()}
    state2, gen, disc = s2_init(jax.random.PRNGKey(1), S2C, tc, batch)
    step2 = s2_step_fn(gen, disc, tc, MEL)
    for i, idxs in enumerate(batches[:2]):
        b = {k: jnp.asarray(v) for k, v in ds2.collate(idxs).items()}
        state2, m2 = step2(state2, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["loss_g"]))

    # --- 4. S1 training ---
    # tiny-model latent rate: 8 kHz wav / hop 64 = 125 latent frames per sec
    ds1 = S1Dataset(exp_dir, max_sec=54, frame_rate=125)
    assert len(ds1) >= 2
    sampler1 = BucketSampler(ds1.lengths(), 2, seed=2, bucket_width=1000)
    s1_model = T2SDecoder(S1C)
    state1 = s1_init(jax.random.PRNGKey(3), s1_model, TrainConfig(grad_accum=1, warmup_steps=2))
    step1 = s1_step_fn(s1_model, TrainConfig(grad_accum=1, warmup_steps=2))
    for idxs in sampler1.epoch_batches(0)[:2]:
        b = ds1.collate(idxs)
        # clip semantic ids into the tiny vocab
        b["semantic_ids"] = np.minimum(b["semantic_ids"], S1C.eos_id - 1)
        b["bert_features"] = b["bert_features"][:, :, : S1C.bert_dim]
        state1, m1 = step1(state1, {k: jnp.asarray(v) for k, v in b.items()}, jax.random.PRNGKey(4))
    assert np.isfinite(float(m1["loss"]))

    # --- 5. synthesis with the trained weights ---
    pipe = TTSPipeline(
        s1_model=s1_model, s1_params=state1.params,
        s2_model=gen, s2_params=state2.params_g,
        hubert_model=hub, hubert_params=hub_params,
        mel_cfg=MEL,
        infer_cfg=InferenceConfig(min_ref_sec=0.1, max_ref_sec=30.0, batch_size=2),
    )
    pipe.set_ref_audio((rng.standard_normal(8000) * 0.1).astype(np.float32), sr=8000)
    sr, audio = pipe.run("Quick check after training!", "en", seed=5, max_sec=2)
    assert sr == 8000 and audio.dtype == np.int16 and len(audio) > 0
