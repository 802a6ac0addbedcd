"""Dump top device ops by summed trace time for the v3 serving vocoder
and one chunked CFM call. Usage: python scripts/trace_breakdown.py [voc|cfm] ..."""

import functools
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def top_ops(fn, *args, n=3, k=25):
    jax.block_until_ready(fn(*args))
    d = tempfile.mkdtemp(prefix="tb_")
    with jax.profiler.trace(d):
        for _ in range(n):
            jax.block_until_ready(fn(*args))
    files = glob.glob(os.path.join(d, "**", "*.trace.json.gz"), recursive=True)
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = {}
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            nm = e.get("name", "")
            if nm.startswith("jit_") or nm.startswith("jit("):
                total += e.get("dur", 0)
                continue
            # strip trailing .NN instance suffixes to aggregate op families
            base = nm.split(".")[0] if nm.rsplit(".", 1)[-1].isdigit() else nm
            agg[base] = agg.get(base, 0.0) + e.get("dur", 0)
    print(f"total device: {total/1e3/n:.1f} ms/call (leaf sum {sum(agg.values())/1e3/n:.1f})")
    for nm, us in sorted(agg.items(), key=lambda kv: -kv[1])[:k]:
        print(f"  {us/1e3/n:8.2f} ms  {nm}")


def run_voc(t_mel):
    from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from gpt_sovits_tpu.ops.folded_bigvgan import bigvgan_apply, fold_bigvgan_params

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    cfg = BigVGANConfig()
    bv = BigVGAN(cfg)
    bv_params = jax.jit(bv.init)(key, jnp.zeros((1, 64, 100)))
    folded = fold_bigvgan_params(bv_params["params"], cfg, dtype=dtype)
    static = {k: v for k, v in folded.items() if k != "arrays"}
    mel = jax.random.normal(key, (1, t_mel, 100), dtype)
    voc = jax.jit(lambda arrs, m: bigvgan_apply({"arrays": arrs, **static}, m))
    top_ops(voc, folded["arrays"], mel)


def run_cfm(bs, t_chunk, steps):
    import dataclasses as _dc

    from gpt_sovits_tpu.models.dit import DiT, quantize_dit_params
    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3, cfm_inference
    from gpt_sovits_tpu.utils.config import s2_config_for_version

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    v3_cfg = s2_config_for_version("v3")
    v3 = SynthesizerTrnV3(v3_cfg)
    dit = DiT(v3.dit_config)
    dp = dit.init(key, jnp.zeros((1, 64, 100), dtype), jnp.zeros((1, 64, 100), dtype),
                  jnp.zeros((1,), dtype), jnp.zeros((1,), dtype),
                  jnp.zeros((1, 64, 512), dtype))
    dp = jax.tree.map(lambda p: p.astype(dtype), dp)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def cfm(params, mu, x_lens, prompt, k, n_steps=steps):
        return cfm_inference(dit, params, mu, x_lens, prompt, k, n_steps=n_steps)

    mu = jax.random.normal(key, (bs, t_chunk, 512), dtype)
    prompt = jax.random.normal(key, (bs, 468, 100), dtype)
    top_ops(cfm, dp, mu, jnp.full((bs,), t_chunk, jnp.int32), prompt, key)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "voc"
    if which == "voc":
        run_voc(int(sys.argv[2]) if len(sys.argv) > 2 else 2780)
    else:
        run_cfm(int(sys.argv[2]) if len(sys.argv) > 2 else 5,
                int(sys.argv[3]) if len(sys.argv) > 3 else 1024,
                int(sys.argv[4]) if len(sys.argv) > 4 else 32)
