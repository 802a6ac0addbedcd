"""v3/v4 zero-shot RTF on one TPU chip (production sizes, random weights).

Mirrors the serving pipeline's v3/v4 path end-to-end for a 20 s utterance:
S1 AR decode (500 tokens, fused kernel) -> decode_encp -> batched chunked
CFM (tile-aligned t_chunk 1024, t_ref 468 reference window, 32 Euler
steps, int8 Pallas matmuls) -> lane-folded vocoder (BigVGAN 24k for v3,
x480 Generator 48k for v4). Prints one JSON line like bench.py.

Timing: ONE host sync per utterance (matching the serving pipeline, which
also only syncs at the final waveform fetch) — per-phase blocking adds
~25-40 ms of tunnel round-trip PER PHASE on the attached-TPU setup and
over-reports RTF by ~0.006. Iterations use fresh inputs (identical-args
re-execution is unsound for timing here). Phase attribution comes from
jax.profiler device traces (scripts/_trace_time.py), not host clocks.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BASELINE_RTF = 0.028  # reference's published v2ProPlus number (no v3 number exists)

N_NEW_TOKENS = 500  # 20 s @ 25 Hz
PROMPT_TOKENS = 125
TEXT_LEN = 120
AUDIO_SECONDS = N_NEW_TOKENS / 25.0
T_REF, T_CHUNK = 468, 1024  # serving's tile-aligned chunk (loaders._serving_t_chunk)
SAMPLE_STEPS = 32
OVERLAP = 12


def build(version: str):
    """Device-resident v3/v4 synthesis closure: key -> (wav_dev_i16, meta)."""
    import dataclasses as _dc

    from gpt_sovits_tpu.models.dit import DiT, quantize_dit_params
    from gpt_sovits_tpu.models.t2s import T2SDecoder, generate
    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3, cfm_inference
    from gpt_sovits_tpu.infer.pipeline import _next_bs_bucket
    from gpt_sovits_tpu.utils.config import S1Config, s2_config_for_version

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    b = 1

    s1_cfg = S1Config()
    s1 = T2SDecoder(s1_cfg, dtype=dtype)
    s1_params = jax.jit(functools.partial(s1.init, method=T2SDecoder.init_all))(key)
    phones = jnp.zeros((b, TEXT_LEN), jnp.int32)
    text_lengths = jnp.full((b,), TEXT_LEN, jnp.int32)
    bert = jnp.zeros((b, TEXT_LEN, s1_cfg.bert_dim), dtype)
    prompt_sem = jnp.zeros((b, PROMPT_TOKENS), jnp.int32)

    def s1_step(k):
        return generate(
            s1, s1_params, phones, text_lengths, bert, prompt_sem,
            jnp.full((b,), PROMPT_TOKENS, jnp.int32), k,
            max_new_tokens=N_NEW_TOKENS, top_k=15, top_p=1.0, temperature=1.0,
            repetition_penalty=1.35, early_stop_num=N_NEW_TOKENS, use_fused_kernel=True,
            # TPU serving defaults (infer/pipeline.py): int8 weights + int8 KV
            weight_quant="int8", kv_cache_quant="int8",
        )

    v3_cfg = s2_config_for_version(version)
    v3 = SynthesizerTrnV3(v3_cfg)
    spec_t = 250
    refer_spec = jax.random.normal(key, (b, spec_t, v3_cfg.spec_channels)) * 0.3 + 1.0
    v3_params = jax.jit(functools.partial(v3.init, method=SynthesizerTrnV3.init_all))(
        {"params": key, "noise": key},
        jnp.zeros((b, 100, v3_cfg.ssl_dim)), refer_spec, jnp.asarray([spec_t]),
        jnp.zeros((b, 30, v3_cfg.cfm_mel_channels)), jnp.asarray([30]),
        jnp.zeros((b, TEXT_LEN), jnp.int32), text_lengths,
    )
    decode_encp = jax.jit(functools.partial(v3.apply, method=SynthesizerTrnV3.decode_encp))

    # serving default: int8 Pallas matmuls (pipeline.py GSVT_DIT_QUANT)
    dit = DiT(_dc.replace(v3.dit_config, quant="int8"))
    dit_bf16 = DiT(v3.dit_config)
    dit_params_bf16 = jax.tree.map(
        lambda p: p.astype(dtype), {"params": v3_params["params"]["cfm"]["estimator"]}
    )
    dit_params = quantize_dit_params(dit_params_bf16)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def cfm(params, mu, x_lens, prompt, k, n_steps=SAMPLE_STEPS):
        mel = cfm_inference(
            dit, params, mu.astype(dtype), x_lens, prompt.astype(dtype), k, n_steps=n_steps
        )
        return mel.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def cfm_bf16(params, mu, x_lens, prompt, k, n_steps=SAMPLE_STEPS):
        mel = cfm_inference(
            dit_bf16, params, mu.astype(dtype), x_lens, prompt.astype(dtype), k, n_steps=n_steps
        )
        return mel.astype(jnp.float32)

    def _to_i16(w):
        return (jnp.clip(w, -1.0, 1.0).astype(jnp.float32) * 32767.0).astype(jnp.int16)

    if version == "v4":
        import types as _types

        from gpt_sovits_tpu.ops.folded_conv import fold_generator_params, generator_apply
        from gpt_sovits_tpu.utils.loaders import load_vocoder

        gen, _ = load_vocoder(None, "v4")  # x480 Generator, 48 kHz (TTS.py:631-655)
        gen_params = jax.jit(gen.init)(key, jnp.zeros((b, 64, 100)))
        eff = _types.SimpleNamespace(
            upsample_rates=gen.upsample_rates or gen.cfg.upsample_rates,
            upsample_kernel_sizes=gen.upsample_kernel_sizes or gen.cfg.upsample_kernel_sizes,
            upsample_initial_channel=gen.cfg.upsample_initial_channel,
            resblock_kernel_sizes=gen.cfg.resblock_kernel_sizes,
            resblock_dilation_sizes=gen.cfg.resblock_dilation_sizes,
        )
        folded = fold_generator_params(gen_params["params"], eff, dtype=dtype)
        voc_static = {k2: v for k2, v in folded.items() if k2 != "arrays"}
        upsample = 480
        out_sr = 48000

        def voc_fwd(arrs, mel):
            return generator_apply({"arrays": arrs, **voc_static}, mel.astype(dtype), None)
    else:
        from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig
        from gpt_sovits_tpu.ops.folded_bigvgan import bigvgan_apply, fold_bigvgan_params

        bv_cfg = BigVGANConfig()
        bv = BigVGAN(bv_cfg)
        bv_params = jax.jit(bv.init)(key, jnp.zeros((b, 64, 100)))
        folded = fold_bigvgan_params(bv_params["params"], bv_cfg, dtype=dtype)
        voc_static = {k2: v for k2, v in folded.items() if k2 != "arrays"}
        upsample = 256
        out_sr = 24000

        def voc_fwd(arrs, mel):
            return bigvgan_apply({"arrays": arrs, **voc_static}, mel.astype(dtype))

    chunk_len = T_CHUNK - T_REF
    fea_dim = 512

    @functools.partial(jax.jit, static_argnames=("bs", "bs_pad"))
    def chunk_batch(fea_todo, bs, bs_pad):
        stride = chunk_len - OVERLAP
        f = jnp.pad(fea_todo[0], ((OVERLAP, 0), (0, 0)))
        need = (bs - 1) * stride + chunk_len
        f = jnp.pad(f, ((0, max(0, need - f.shape[0])), (0, 0)))
        chunks = jnp.stack([jax.lax.dynamic_slice_in_dim(f, i * stride, chunk_len, 0) for i in range(bs)])
        if bs_pad > bs:
            chunks = jnp.pad(chunks, ((0, bs_pad - bs), (0, 0), (0, 0)))
        fea_ref = jnp.zeros((bs_pad, T_REF, fea_dim), chunks.dtype)
        return jnp.concatenate([fea_ref, chunks], axis=1)

    @functools.partial(jax.jit, static_argnames=("bs", "bs_pad"))
    def voc2(arrs, mel_out, bs, bs_pad):
        # real chunks only -> one long mel; pad rows hold edge frames so the
        # compile cache stays bounded; the waveform is SLICED ON DEVICE to
        # the real chunks before the int16 fetch (pad rows never cross the
        # wire)
        mel_long = mel_out[:bs, T_REF:].reshape(1, bs * chunk_len, -1)
        if bs_pad > bs:
            mel_long = jnp.pad(mel_long, ((0, 0), (0, (bs_pad - bs) * chunk_len), (0, 0)), mode="edge")
        wav = voc_fwd(arrs, mel_long)
        return _to_i16(wav[:, : bs * chunk_len * upsample])

    from gpt_sovits_tpu.dsp.sola import sola_stitch

    def synth_device(k, n_steps=SAMPLE_STEPS):
        """Dispatch the whole utterance; returns the device int16 waveform +
        stitching metadata. No host sync inside."""
        out = s1_step(k)
        codes = out.tokens[:, :N_NEW_TOKENS]
        fea_todo, ge, mel_len = decode_encp(
            v3_params, codes, jnp.asarray([N_NEW_TOKENS]),
            phones, text_lengths, refer_spec, jnp.asarray([spec_t]),
        )
        total = fea_todo.shape[1]
        stride = chunk_len - OVERLAP
        bs = max(1, -(-(total + OVERLAP - chunk_len) // stride) + 1)
        bs_pad = _next_bs_bucket(bs)
        padding_len = (bs - 1) * stride + chunk_len - (total + OVERLAP)
        fea = chunk_batch(fea_todo, bs, bs_pad)
        mel2 = jnp.zeros((bs_pad, T_REF, v3_cfg.cfm_mel_channels))
        _, sub = jax.random.split(k)
        mel_out = cfm(dit_params, fea, jnp.full((bs_pad,), T_CHUNK, jnp.int32), mel2, sub, n_steps=n_steps)
        wav_dev = voc2(folded["arrays"], mel_out, bs, bs_pad)
        return wav_dev, (bs, padding_len)

    def finish_host(wav_dev, meta):
        bs, padding_len = meta
        wav = np.asarray(wav_dev)[0, :, 0].astype(np.float32) / 32767.0
        frag = chunk_len * upsample
        fragments = [wav[i * frag : (i + 1) * frag] for i in range(bs)]
        audio = sola_stitch(fragments, OVERLAP * upsample)
        return audio[OVERLAP * upsample : len(audio) - padding_len * upsample or None]

    return {
        "synth_device": synth_device,
        "finish_host": finish_host,
        "s1_step": s1_step,
        "decode_encp": lambda codes: decode_encp(
            v3_params, codes, jnp.asarray([N_NEW_TOKENS]),
            phones, text_lengths, refer_spec, jnp.asarray([spec_t]),
        ),
        "cfm": cfm,
        "cfm_bf16": cfm_bf16,
        "dit_params": dit_params,
        "dit_params_bf16": dit_params_bf16,
        "voc2": voc2,
        "chunk_batch": chunk_batch,
        "folded": folded,
        "mel_ch": v3_cfg.cfm_mel_channels,
        "out_sr": out_sr,
        "upsample": upsample,
        "chunk_len": chunk_len,
    }


def bench_serial(mdl, n_iter=6, n_steps=SAMPLE_STEPS):
    """Per-utterance latency: one sync per utterance."""
    synth, finish = mdl["synth_device"], mdl["finish_host"]
    audio = finish(*synth(jax.random.PRNGKey(1), n_steps))  # warmup/compile
    t0 = time.perf_counter()
    for i in range(n_iter):
        audio = finish(*synth(jax.random.PRNGKey(2 + i), n_steps))
    dt = (time.perf_counter() - t0) / n_iter
    return dt, audio


def bench_pipelined(mdl, n_iter=8, n_steps=SAMPLE_STEPS):
    """Steady-state throughput: utterance i+1's device work dispatched
    before utterance i's host fetch + SOLA, so transfer/host overlap
    compute (what a serving loop does)."""
    synth, finish = mdl["synth_device"], mdl["finish_host"]
    finish(*synth(jax.random.PRNGKey(1), n_steps))  # warmup
    t0 = time.perf_counter()
    prev = synth(jax.random.PRNGKey(100), n_steps)
    audio = None
    for i in range(n_iter - 1):
        cur = synth(jax.random.PRNGKey(101 + i), n_steps)
        audio = finish(*prev)
        prev = cur
    audio = finish(*prev)
    dt = (time.perf_counter() - t0) / n_iter
    return dt, audio


def main():
    version = os.environ.get("GSVT_BENCH_V3_VERSION", "v3")
    mdl = build(version)

    dt_serial, audio = bench_serial(mdl)
    audio_s = len(audio) / mdl["out_sr"]
    rtf_serial = dt_serial / audio_s
    assert np.isfinite(audio).all()

    dt_pipe, audio_p = bench_pipelined(mdl)
    rtf_pipe = dt_pipe / (len(audio_p) / mdl["out_sr"])

    dt8, audio8 = bench_serial(mdl, n_steps=8)
    rtf_steps8 = dt8 / (len(audio8) / mdl["out_sr"])

    # trace-based phase attribution (device time, no tunnel overhead)
    from _trace_time import device_time

    k0 = jax.random.PRNGKey(7)
    t_s1 = device_time(lambda k: mdl["s1_step"](k).tokens, k0)
    codes = mdl["s1_step"](k0).tokens[:, :N_NEW_TOKENS]
    t_encp = device_time(mdl["decode_encp"], codes)
    fea_todo, _, _ = mdl["decode_encp"](codes)
    total = fea_todo.shape[1]
    stride = mdl["chunk_len"] - OVERLAP
    bs = max(1, -(-(total + OVERLAP - mdl["chunk_len"]) // stride) + 1)
    from gpt_sovits_tpu.infer.pipeline import _next_bs_bucket

    bs_pad = _next_bs_bucket(bs)
    fea = mdl["chunk_batch"](fea_todo, bs, bs_pad)
    mel2 = jnp.zeros((bs_pad, T_REF, mdl["mel_ch"]))
    lens = jnp.full((bs_pad,), T_CHUNK, jnp.int32)
    t_cfm = device_time(lambda k: mdl["cfm"](mdl["dit_params"], fea, lens, mel2, k), k0)
    t_cfm_bf16 = device_time(lambda k: mdl["cfm_bf16"](mdl["dit_params_bf16"], fea, lens, mel2, k), k0)
    mel_out = mdl["cfm"](mdl["dit_params"], fea, lens, mel2, k0)
    t_voc = device_time(lambda m: mdl["voc2"](mdl["folded"]["arrays"], m, bs, bs_pad), mel_out)

    print(
        json.dumps(
            {
                "metric": f"zero_shot_rtf_{version}_1chip",
                "value": round(rtf_pipe, 5),
                "unit": "s_compute_per_s_audio",
                "vs_baseline": round(BASELINE_RTF / rtf_pipe, 3),
                "audio_s": round(audio_s, 2),
                "sample_steps": SAMPLE_STEPS,
                "serial_rtf": round(rtf_serial, 5),
                "rtf_steps8": round(rtf_steps8, 5),
                "phases_device_s": {
                    "s1": round(t_s1, 4),
                    "encp": round(t_encp, 4),
                    "cfm": round(t_cfm, 4),
                    "voc": round(t_voc, 4),
                },
                "cfm_bf16_s": round(t_cfm_bf16, 4),
                "cfm_int8_speedup": round(t_cfm_bf16 / t_cfm, 3),
                "timing_note": "one host sync per utterance (serving-faithful); phases are device-trace times",
            }
        )
    )


if __name__ == "__main__":
    main()
