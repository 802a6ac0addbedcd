"""Trace one batched CFM call (serving shape) and print the top device ops
by total time, to find where non-matmul time goes."""

import functools
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

T_REF, T_CHUNK = 468, 1024
SAMPLE_STEPS = 32
BS = int(os.environ.get("CFM_BS", "2"))
QUANT = os.environ.get("CFM_QUANT", "int8")


def main():
    import dataclasses as dc

    from gpt_sovits_tpu.models.dit import DiT, quantize_dit_params
    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3, cfm_inference
    from gpt_sovits_tpu.utils.config import s2_config_for_version

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    v3_cfg = s2_config_for_version("v3")
    v3 = SynthesizerTrnV3(v3_cfg)
    params = jax.jit(functools.partial(v3.init, method=SynthesizerTrnV3.init_all))(
        {"params": key, "noise": key},
        jnp.zeros((1, 100, v3_cfg.ssl_dim)),
        jax.random.normal(key, (1, 250, v3_cfg.spec_channels)),
        jnp.asarray([250]),
        jnp.zeros((1, 30, v3_cfg.cfm_mel_channels)), jnp.asarray([30]),
        jnp.zeros((1, 120), jnp.int32), jnp.asarray([120]),
    )
    dit_params_bf16 = jax.tree.map(
        lambda p: p.astype(dtype), {"params": params["params"]["cfm"]["estimator"]}
    )
    if QUANT == "int8":
        dit = DiT(dc.replace(v3.dit_config, quant="int8"))
        dit_params = quantize_dit_params(dit_params_bf16)
    else:
        dit = DiT(v3.dit_config)
        dit_params = dit_params_bf16

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def cfm(p, mu, x_lens, prompt, k, n_steps=SAMPLE_STEPS):
        return cfm_inference(
            dit, p, mu.astype(dtype), x_lens, prompt.astype(dtype), k, n_steps=n_steps
        ).astype(jnp.float32)

    fea = jax.random.normal(key, (BS, T_CHUNK, 512), dtype)
    mel2 = jax.random.normal(key, (BS, T_REF, v3_cfg.cfm_mel_channels))
    lens = jnp.full((BS,), T_CHUNK, jnp.int32)

    jax.block_until_ready(cfm(dit_params, fea, lens, mel2, jax.random.PRNGKey(1)))
    d = tempfile.mkdtemp(prefix="cfmtrace_")
    with jax.profiler.trace(d):
        out = cfm(dit_params, fea, lens, mel2, jax.random.PRNGKey(2))
        jax.block_until_ready(out)

    files = glob.glob(os.path.join(d, "**", "*.trace.json.gz"), recursive=True)
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = defaultdict(float)
    total_parent = 0.0
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            n = e.get("name", "")
            if n.startswith("jit_") or n.startswith("jit("):
                total_parent += e["dur"]
                continue
            # merge fusion instances: strip trailing .N digits
            base = n.split(".")[0]
            agg[base] += e.get("dur", 0)
    print(f"bs={BS} quant={QUANT} total device: {total_parent/1e3:.1f} ms")
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    leaf_total = sum(agg.values())
    for name, dur in top:
        print(f"  {dur/1e3:9.2f} ms  {100*dur/leaf_total:5.1f}%  {name[:90]}")
    print(f"  leaf total {leaf_total/1e3:.1f} ms")


if __name__ == "__main__":
    main()
