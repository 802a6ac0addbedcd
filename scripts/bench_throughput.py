"""Batched serving throughput: audio-seconds synthesized / s / chip.

The headline bench (bench.py) measures single-utterance latency (RTF).
Production serving batches independent utterances: the S1 AR decode runs
batched through the fused kernel (one weight stream serves all rows — the
weight-bound kernel amortizes), and each bucket synthesizes through one S2
decode. This script sweeps batch size x S1 weight dtype (bf16 / weight-only
int8) and prints one JSON line per config.

Run on the attached TPU: `python scripts/bench_throughput.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N_NEW_TOKENS = 500  # 20 s per utterance @ 25 Hz
PROMPT_TOKENS = 125
TEXT_LEN = 120
AUDIO_SECONDS = N_NEW_TOKENS / 25.0


def bench_config(b: int, weight_quant: str, kv_quant: str = "bf16") -> dict:
    import functools

    from gpt_sovits_tpu.models.t2s import T2SDecoder, generate
    from gpt_sovits_tpu.models.vits import SynthesizerTrn
    from gpt_sovits_tpu.ops.folded_conv import fold_generator_params, generator_apply
    from gpt_sovits_tpu.utils.config import S1Config, s2_config_for_version

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    s1 = T2SDecoder(S1Config(), dtype=dtype)
    s1_params = jax.jit(functools.partial(s1.init, method=T2SDecoder.init_all))(key)

    s2_cfg = s2_config_for_version("v2")
    s2 = SynthesizerTrn(s2_cfg)
    text = jnp.zeros((b, TEXT_LEN), jnp.int32)
    text_lengths = jnp.full((b,), TEXT_LEN, jnp.int32)
    refer_spec = jax.random.normal(key, (b, 250, s2_cfg.spec_channels)) * 0.3 + 1.0
    refer_lengths = jnp.full((b,), 250, jnp.int32)
    s2_params = jax.jit(functools.partial(s2.init, method=SynthesizerTrn.init_all))(
        {"params": key, "noise": key, "slice": key},
        jnp.zeros((b, 100, s2_cfg.ssl_dim)), refer_spec, refer_lengths, text, text_lengths,
    )

    phones = jnp.zeros((b, TEXT_LEN), jnp.int32)
    bert = jnp.zeros((b, TEXT_LEN, s1.cfg.bert_dim), dtype)
    prompt = jnp.zeros((b, PROMPT_TOKENS), jnp.int32)

    def s1_step(k):
        return generate(
            s1, s1_params, phones, text_lengths, bert, prompt,
            jnp.full((b,), PROMPT_TOKENS, jnp.int32), k,
            max_new_tokens=N_NEW_TOKENS, top_k=15, top_p=1.0,
            temperature=1.0, repetition_penalty=1.35,
            early_stop_num=N_NEW_TOKENS, use_fused_kernel=True,
            weight_quant=weight_quant, kv_cache_quant=kv_quant,
        )

    codes_lengths = jnp.full((b,), N_NEW_TOKENS, jnp.int32)
    folded_dec = fold_generator_params(s2_params["params"]["dec"], s2_cfg, dtype=dtype)

    @jax.jit
    def s2_step(codes):
        z, ge = s2.apply(
            s2_params, codes, codes_lengths, text, text_lengths,
            refer_spec, refer_lengths, method=SynthesizerTrn.decode_latent,
        )
        return generator_apply(folded_dec, z.astype(dtype), ge.astype(dtype)).astype(jnp.float32)

    wav = s2_step(s1_step(jax.random.PRNGKey(1)).tokens[:, :N_NEW_TOKENS])
    jax.block_until_ready(wav)

    n_iter = 6
    t0 = time.perf_counter()
    wavs = []
    for i in range(n_iter):
        out = s1_step(jax.random.PRNGKey(2 + i))
        wavs.append(s2_step(out.tokens[:, :N_NEW_TOKENS]))
    jax.block_until_ready(wavs)
    dt = (time.perf_counter() - t0) / n_iter

    return {
        "metric": "serving_throughput_v2_1chip",
        "batch": b,
        "s1_weights": weight_quant,
        "s1_kv": kv_quant,
        "audio_s_per_s": round(b * AUDIO_SECONDS / dt, 1),
        "batch_latency_s": round(dt, 4),
        "per_utt_rtf": round(dt / AUDIO_SECONDS, 5),
    }


def main():
    for b in (1, 4, 8):
        for q in ("bf16", "int8"):
            print(json.dumps(bench_config(b, q)), flush=True)
    # int8 KV cache on top of int8 weights: halves the KV sweep that
    # bounds the large-batch decode (benchmarks/TRIAGE_s1_r04.json)
    for b in (4, 8):
        print(json.dumps(bench_config(b, "int8", kv_quant="int8")), flush=True)


if __name__ == "__main__":
    main()
