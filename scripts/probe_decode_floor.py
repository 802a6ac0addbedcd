"""Probe the fused decode step's B=1 cost structure (VERDICT r4 #2).

The triage shows int8 B=1 at ~213 us/token while the int8 weight-DMA
roofline is ~94 us — and bf16 lands at the SAME per-layer time, i.e. the
kernel has a ~9 us/layer floor that is not weight bandwidth. This probe
decomposes it: weights dtype x live-KV length x layer count, plus an
attention-free variant, to attribute the floor to weight DMA, the KV
sweep, or fixed per-layer overhead."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from scripts._trace_time import device_time
from gpt_sovits_tpu.ops.pallas.decode_step import (
    fused_decode_step, stack_weights_from_params, quantize_kv_cache,
)

D, H, F, T_PAD = 512, 16, 2048, 1024
B = int(os.environ.get("PROBE_B", "1"))


def make_weights(L, quant):
    key = jax.random.PRNGKey(0)
    p = {"params": {}}
    for i in range(L):
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        p["params"][f"layer_{i}"] = {
            "wqkv": {"kernel": jax.random.normal(k1, (D, 3 * D)) * 0.02,
                     "bias": jnp.zeros((3 * D,))},
            "wo": {"kernel": jax.random.normal(k2, (D, D)) * 0.02,
                   "bias": jnp.zeros((D,))},
            "fc1": {"kernel": jax.random.normal(k3, (D, F)) * 0.02,
                    "bias": jnp.zeros((F,))},
            "fc2": {"kernel": jax.random.normal(k4, (F, D)) * 0.02,
                    "bias": jnp.zeros((D,))},
            "norm1": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "norm2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        }
    return stack_weights_from_params(p, L, quant)


def run(L, quant, n_valid, kv_quant=False, n=50):
    w = make_weights(L, quant)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, D), jnp.float32)
    kv = (jax.random.normal(key, (L, B, T_PAD, 2 * D)) * 0.1).astype(jnp.bfloat16)
    scales = None
    if kv_quant:
        kv, scales = quantize_kv_cache(kv)
    mask = (jnp.arange(T_PAD)[None, :] < n_valid).astype(jnp.float32).repeat(B, 0)
    widx = jnp.asarray(n_valid, jnp.int32)

    @jax.jit
    def step(x, kv, scales):
        if kv_quant:
            y, kv2, s2 = fused_decode_step(x, w, kv, mask, widx, kv_scales=scales)
            return y
        y, kv2 = fused_decode_step(x, w, kv, mask, widx)
        return y

    t = device_time(lambda x: step(x, kv, scales), x, n=n)
    return t


def main():
    rows = []
    for quant in ("bf16", "int8"):
        for L in (24, 6):
            for nv in (0, 256, 768):
                t = run(L, quant, nv)
                rows.append(dict(w=quant, kv="bf16", L=L, n_valid=nv, us=round(t * 1e6, 1),
                                 us_per_layer=round(t * 1e6 / L, 2)))
                print(rows[-1], flush=True)
    # int8 KV at full sweep
    for quant in ("bf16", "int8"):
        t = run(24, quant, 768, kv_quant=True)
        rows.append(dict(w=quant, kv="int8", L=24, n_valid=768, us=round(t * 1e6, 1),
                         us_per_layer=round(t * 1e6 / 24, 2)))
        print(rows[-1], flush=True)

    # derived attribution at L=24
    def find(w, nv, kv="bf16"):
        return next(r for r in rows if r["w"] == w and r["n_valid"] == nv and r["L"] == 24 and r["kv"] == kv)

    for w in ("bf16", "int8"):
        base = find(w, 0)["us"]
        full = find(w, 768)["us"]
        print(f"{w}: weights+overhead {base:.0f} us, kv sweep(768) {full - base:.0f} us")
    l24 = [r for r in rows if r["L"] == 24 and r["n_valid"] == 0 and r["kv"] == "bf16"]
    l6 = [r for r in rows if r["L"] == 6 and r["n_valid"] == 0 and r["kv"] == "bf16"]
    for a, b6 in zip(l24, l6):
        slope = (a["us"] - b6["us"]) / 18.0
        fixed = a["us"] - slope * 24
        print(f"{a['w']}: per-layer slope {slope:.2f} us, fixed overhead {fixed:.1f} us")


if __name__ == "__main__":
    main()
