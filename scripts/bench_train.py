"""Training step time on one TPU chip at production sizes (random data).

Measures the three production trainers (BASELINE.md:24-25 'measured at
1 chip'; reference VRAM table docs/en/Changelog_EN.md:411-435):
  - S1 AR (24L d512) AdamW step: tokens/s/chip
  - S2 v2 GAN (D-then-G one jit): audio-seconds/s/chip
  - v3 CFM fine-tune (22L DiT): mel-frames/s/chip (+ LoRA variant)
Prints one JSON line; archived as benchmarks/BENCH_train_r03.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(step_fn, state, batch, rng, n=5):
    """Trace-based device timing: per-call block_until_ready under-reports
    through the attached-TPU tunnel (see scripts/_trace_time.py)."""
    from scripts._trace_time import device_time

    return device_time(lambda s_, b_, r_: step_fn(s_, b_, r_)[1], state, batch, rng, n=n)


def bench_s1():
    from gpt_sovits_tpu.models.t2s import T2SDecoder
    from gpt_sovits_tpu.train.s1_train import init_state, make_train_step
    from gpt_sovits_tpu.utils.config import S1Config, TrainConfig

    cfg = S1Config()
    # production shapes: ~120 phones + ~500 semantic tokens (20 s @ 25 Hz)
    b, tx, ty = 8, 128, 512
    train = TrainConfig(batch_size=b, grad_accum=1, warmup_steps=100)
    key = jax.random.PRNGKey(0)
    model = T2SDecoder(cfg)
    state = init_state(key, model, train)
    ks = jax.random.split(key, 3)
    batch = {
        "phoneme_ids": jax.random.randint(ks[0], (b, tx), 0, cfg.phoneme_vocab_size),
        "phoneme_lens": jnp.full((b,), tx, jnp.int32),
        "semantic_ids": jax.random.randint(ks[1], (b, ty), 0, cfg.vocab_size - 1),
        "semantic_lens": jnp.full((b,), ty, jnp.int32),
        "bert_features": jax.random.normal(ks[2], (b, tx, cfg.bert_dim)),
    }
    step = jax.jit(make_train_step(model, train))
    dt = timeit(step, state, batch, jax.random.PRNGKey(9))
    return {"step_s": round(dt, 4), "tokens_per_s": round(b * ty / dt), "batch": [b, tx, ty]}


def bench_s2_gan():
    from gpt_sovits_tpu.train.s2_train import init_state, make_train_step
    from gpt_sovits_tpu.utils.config import MEL_V2, TrainConfig, s2_config_for_version

    cfg = s2_config_for_version("v2")
    mel = MEL_V2
    b, tspec, tt = 6, 400, 120  # ~8 s utterances (hop 640 @ 32 kHz)
    train = TrainConfig(batch_size=b)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    batch = {
        "ssl": jax.random.normal(ks[0], (b, tspec * 2, cfg.ssl_dim)),
        "spec": jax.random.normal(ks[1], (b, tspec, cfg.spec_channels)) * 0.3 + 1.0,
        "spec_lengths": jnp.full((b,), tspec, jnp.int32),
        "wav": jax.random.normal(ks[2], (b, tspec * mel.hop_size, 1)) * 0.1,
        "text": jax.random.randint(ks[3], (b, tt), 0, cfg.phoneme_vocab_size),
        "text_lengths": jnp.full((b,), tt, jnp.int32),
    }
    state, gen, disc = init_state(jax.random.PRNGKey(1), cfg, train, batch)
    step = jax.jit(make_train_step(gen, disc, train, mel))
    dt = timeit(step, state, batch, jax.random.PRNGKey(9))
    audio_s = b * tspec * mel.hop_size / mel.sampling_rate
    return {"step_s": round(dt, 4), "audio_s_per_s": round(audio_s / dt, 2), "batch": [b, tspec]}


def bench_v3_cfm(lora_rank=None):
    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3
    from gpt_sovits_tpu.train.s2_train_v3 import (
        V3TrainState, init_lora, init_state, make_lora_optimizer, make_lora_train_step, make_train_step,
    )
    from gpt_sovits_tpu.utils.config import TrainConfig, s2_config_for_version

    cfg = s2_config_for_version("v3")
    b, tspec, tmel, tt = 4, 400, 750, 120  # ~8 s (spec 50/s, mel 93.75/s)
    train = TrainConfig(batch_size=b)
    key = jax.random.PRNGKey(0)
    model = SynthesizerTrnV3(cfg)
    ks = jax.random.split(key, 4)
    batch = {
        "ssl": jax.random.normal(ks[0], (b, tspec, cfg.ssl_dim)),
        "spec": jax.random.normal(ks[1], (b, tspec, cfg.spec_channels)) * 0.3,
        "spec_lengths": jnp.full((b,), tspec, jnp.int32),
        "mel": jax.random.normal(ks[2], (b, tmel, cfg.cfm_mel_channels)) * 0.3,
        "mel_lengths": jnp.full((b,), tmel, jnp.int32),
        "text": jax.random.randint(ks[3], (b, tt), 0, cfg.phoneme_vocab_size),
        "text_lengths": jnp.full((b,), tt, jnp.int32),
    }
    state = init_state(jax.random.PRNGKey(1), model, train, batch)
    if lora_rank:
        lora = init_lora(state.params, rank=lora_rank, key=jax.random.PRNGKey(2))
        state = V3TrainState(state.step, state.params, make_lora_optimizer(train).init(lora), lora)
        step = jax.jit(make_lora_train_step(model, train))
    else:
        step = jax.jit(make_train_step(model, train))
    dt = timeit(step, state, batch, jax.random.PRNGKey(9))
    return {"step_s": round(dt, 4), "mel_frames_per_s": round(b * tmel / dt), "batch": [b, tmel]}


def main():
    which = sys.argv[1:] or ["s1", "s2", "v3", "v3_lora"]
    out = {
        "metric": "train_step_time_1chip",
        "hardware": "TPU v5e (1 chip, attached via tunnel)",
        "note": "production model sizes, random data, trace-based device timing (scripts/_trace_time.py)",
    }
    if "s1" in which:
        out["s1_adamw"] = bench_s1()
        print("s1 done", out["s1_adamw"], flush=True)
    if "s2" in which:
        out["s2_gan_v2"] = bench_s2_gan()
        print("s2 done", out["s2_gan_v2"], flush=True)
    if "v3" in which:
        out["v3_cfm"] = bench_v3_cfm()
        print("v3 done", out["v3_cfm"], flush=True)
    if "v3_lora" in which:
        out["v3_cfm_lora16"] = bench_v3_cfm(lora_rank=16)
        print("v3 lora done", out["v3_cfm_lora16"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
