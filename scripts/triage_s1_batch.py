"""Triage: (a) where the B=8 serving batch spends its time, (b) why int8
weight-streaming S1 decode loses at B=1 (VERDICT r3 #4/#5).

Device-trace timing per stage (s1 decode, s2 decode+vocoder) at B in
{1,4,8} x weight dtype in {bf16, int8}, plus a per-op breakdown of the
B=8 bf16 utterance. Prints JSON lines."""

import functools
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N_NEW, TP, TX = 500, 125, 120


def build(b):
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
    text = jnp.zeros((b, TX), jnp.int32)
    text_lengths = jnp.full((b,), TX, jnp.int32)
    refer_spec = jax.random.normal(key, (b, 250, s2_cfg.spec_channels)) * 0.3 + 1.0
    refer_lengths = jnp.full((b,), 250, jnp.int32)
    s2_params = jax.jit(functools.partial(s2.init, method=SynthesizerTrn.init_all))(
        {"params": key, "noise": key, "slice": key},
        jnp.zeros((b, 100, s2_cfg.ssl_dim)), refer_spec, refer_lengths, text, text_lengths,
    )
    phones = jnp.zeros((b, TX), jnp.int32)
    bert = jnp.zeros((b, TX, s1.cfg.bert_dim), dtype)
    prompt = jnp.zeros((b, TP), jnp.int32)
    codes_lengths = jnp.full((b,), N_NEW, jnp.int32)
    folded = fold_generator_params(s2_params["params"]["dec"], s2_cfg, dtype=dtype)
    dec_static = {k: v for k, v in folded.items() if k != "arrays"}

    def s1_step(k, wq, kvq="bf16"):
        return generate(
            s1, s1_params, phones, text_lengths, bert, prompt,
            jnp.full((b,), TP, jnp.int32), k,
            max_new_tokens=N_NEW, top_k=15, top_p=1.0, temperature=1.0,
            repetition_penalty=1.35, early_stop_num=N_NEW,
            use_fused_kernel=True, weight_quant=wq, kv_cache_quant=kvq,
        ).tokens

    @jax.jit
    def s2_step(params, arrs, codes):
        z, ge = s2.apply(
            params, codes, codes_lengths, text, text_lengths,
            refer_spec, refer_lengths, method=SynthesizerTrn.decode_latent,
        )
        dec = {"arrays": arrs, **dec_static}
        return generator_apply(dec, z.astype(dtype), ge.astype(dtype)).astype(jnp.float32)

    return s1_step, s2_step, s2_params, folded


def leaf_breakdown(fn, *args, top=12):
    jax.block_until_ready(fn(*args))
    d = tempfile.mkdtemp(prefix="trg_")
    with jax.profiler.trace(d):
        jax.block_until_ready(fn(*args))
    files = glob.glob(os.path.join(d, "**", "*.trace.json.gz"), recursive=True)
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            n = e.get("name", "")
            if n.startswith("jit_") or n.startswith("jit("):
                continue
            agg[n.split(".")[0]] += e.get("dur", 0)
    return sorted(agg.items(), key=lambda kv: -kv[1])[:top]


def main():
    from _trace_time import device_time

    for b in (1, 4, 8):
        s1_step, s2_step, s2_params, folded = build(b)
        row = {"batch": b}
        for wq, kvq in (("bf16", "bf16"), ("int8", "bf16"), ("int8", "int8")):
            tag = wq if kvq == "bf16" else f"{wq}_kv8"
            t = device_time(lambda k: s1_step(k, wq, kvq), jax.random.PRNGKey(1))
            row[f"s1_{tag}_s"] = round(t, 4)
            row[f"s1_{tag}_us_per_tok"] = round(t / N_NEW * 1e6, 1)
        codes = s1_step(jax.random.PRNGKey(1), "bf16")[:, :N_NEW]
        row["s2_s"] = round(device_time(lambda c: s2_step(s2_params, folded["arrays"], c), codes), 4)
        print(json.dumps(row), flush=True)

    # per-op breakdown of the B=8 decode loop (bf16 + int8)
    s1_step, *_ = build(8)
    for wq in ("bf16", "int8"):
        print(f"== B=8 {wq} s1 leaf ops ==", flush=True)
        for name, dur in leaf_breakdown(lambda k: s1_step(k, wq), jax.random.PRNGKey(2)):
            print(f"  {dur/1e3:9.2f} ms  {name[:80]}")


if __name__ == "__main__":
    main()
