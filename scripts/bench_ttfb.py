"""Streaming time-to-first-fragment (TTFB) on one TPU chip.

Mirrors pipeline.run_streaming's first yield: the first text segment's S1
AR decode (fused kernel, ~64 tokens = 2.6 s of audio) + one S2 decode of
that segment (folded HiFiGAN). Production sizes, random weights, per-
iteration blocking. Prints one JSON line; archived as
benchmarks/BENCH_ttfb_r03.json. Own serving claim (pipeline.py TTFB
metric); the reference has no streaming-latency number.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)).rsplit("/scripts", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

FIRST_SEG_TOKENS = 64  # ~2.6 s first fragment @ 25 Hz
FIRST_SEG_TEXT = 32  # phones in a short leading segment
PROMPT_TOKENS = 125


def build():
    from gpt_sovits_tpu.models.t2s import T2SDecoder, generate
    from gpt_sovits_tpu.models.vits import SynthesizerTrn
    from gpt_sovits_tpu.ops.folded_conv import fold_generator_params, generator_apply
    from gpt_sovits_tpu.utils.config import S1Config, s2_config_for_version

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    b = 1
    s1 = T2SDecoder(S1Config(), dtype=dtype)
    s1_params = jax.jit(functools.partial(s1.init, method=T2SDecoder.init_all))(key)
    s2_cfg = s2_config_for_version("v2")
    s2 = SynthesizerTrn(s2_cfg)
    text = jnp.zeros((b, FIRST_SEG_TEXT), jnp.int32)
    text_lengths = jnp.full((b,), FIRST_SEG_TEXT, jnp.int32)
    refer_spec = jax.random.normal(key, (b, 250, s2_cfg.spec_channels)) * 0.3 + 1.0
    refer_lengths = jnp.full((b,), 250, jnp.int32)
    s2_params = jax.jit(functools.partial(s2.init, method=SynthesizerTrn.init_all))(
        {"params": key, "noise": key, "slice": key},
        jnp.zeros((b, 100, s2_cfg.ssl_dim)), refer_spec, refer_lengths, text, text_lengths,
    )
    phones = jnp.zeros((b, FIRST_SEG_TEXT), jnp.int32)
    bert = jnp.zeros((b, FIRST_SEG_TEXT, s1.cfg.bert_dim), dtype)
    prompt = jnp.zeros((b, PROMPT_TOKENS), jnp.int32)
    folded_dec = fold_generator_params(s2_params["params"]["dec"], s2_cfg, dtype=dtype)

    def s1_first(k):
        return generate(
            s1, s1_params, phones, text_lengths, bert, prompt,
            jnp.full((b,), PROMPT_TOKENS, jnp.int32), k,
            max_new_tokens=FIRST_SEG_TOKENS, top_k=15, top_p=1.0,
            temperature=1.0, repetition_penalty=1.35,
            early_stop_num=FIRST_SEG_TOKENS, use_fused_kernel=True, weight_quant="int8",
            kv_cache_quant="int8",  # TPU serving default
        )

    codes_lengths = jnp.full((b,), FIRST_SEG_TOKENS, jnp.int32)

    @jax.jit
    def s2_step(codes):
        z, ge = s2.apply(
            s2_params, codes, codes_lengths, text, text_lengths,
            refer_spec, refer_lengths, method=SynthesizerTrn.decode_latent,
        )
        return generator_apply(folded_dec, z.astype(dtype), ge.astype(dtype)).astype(jnp.float32)

    def first_fragment(k):
        out = s1_first(k)
        return np.asarray(s2_step(out.tokens[:, :FIRST_SEG_TOKENS]))

    return first_fragment


def main():
    first_fragment = build()
    first_fragment(jax.random.PRNGKey(1))  # compile
    lat = []
    for i in range(10):
        t0 = time.perf_counter()
        frag = first_fragment(jax.random.PRNGKey(2 + i))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    audio_s = FIRST_SEG_TOKENS / 25.0
    print(json.dumps({
        "metric": "streaming_ttfb_1chip",
        "value": round(lat[len(lat) // 2], 4),
        "unit": "s_to_first_fragment",
        "p95_s": round(lat[-1], 4),
        "first_fragment_audio_s": audio_s,
        "hardware": "TPU v5e (1 chip, attached via tunnel)",
        "note": "first text segment: 64-token S1 fused int8 decode + folded HiFiGAN; device->host fetch of the fragment included (tunnel-inflated vs local PCIe)",
    }))


if __name__ == "__main__":
    main()
