"""Profile the v3 serving vocoder (folded BigVGAN) on the real TPU.

Reconciles the round-2 discrepancy: the folded module claimed ~60 ms f32
per 10 s of audio while the end-to-end phase split measured 0.763 s per
~15 s — this times the exact serving call (bf16, folded weights as jit
args) under each snake implementation:
  folded — new Pallas kernel in the lane-folded layout (no unfold)
  pallas — round-2 kernel on the unfolded layout (relayout + lane pad)
  xla    — unfolded XLA composition
Usage: python scripts/profile_voc.py [T_mel ...]
"""

import functools
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


def timeit(fn, *args, n=5):
    t_c0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n, compile_s


def main():
    from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from gpt_sovits_tpu.ops.folded_bigvgan import bigvgan_apply, fold_bigvgan_params

    t_mels = [int(a) for a in sys.argv[1:]] or [1398]
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    bv_cfg = BigVGANConfig()
    bv = BigVGAN(bv_cfg)
    bv_params = jax.jit(bv.init)(key, jnp.zeros((1, 64, 100)))
    folded = fold_bigvgan_params(bv_params["params"], bv_cfg, dtype=dtype)
    voc_static = {k: v for k, v in folded.items() if k != "arrays"}

    for t_mel in t_mels:
        mel = jax.random.normal(key, (1, t_mel, 100)) * 0.3
        audio_s = t_mel * 256 / 24000.0
        print(f"--- T_mel={t_mel} ({audio_s:.1f}s audio) ---", flush=True)
        outs = {}
        impls = tuple(os.environ.get("GSVT_PROFILE_IMPLS", "folded,pallas,xla").split(","))
        for impl in impls:
            os.environ["GSVT_SNAKE"] = impl  # read at trace time

            @jax.jit
            def voc(arrs, m, _impl=impl):
                return bigvgan_apply({"arrays": arrs, **voc_static}, m.astype(dtype)).astype(jnp.float32)

            try:
                dt, comp = timeit(voc, folded["arrays"], mel)
                outs[impl] = np.asarray(voc(folded["arrays"], mel))
                print(
                    f"  snake={impl:6s}: {dt*1e3:8.1f} ms  (RTF {dt/audio_s:.5f}, compile {comp:.0f}s)",
                    flush=True,
                )
            except Exception as e:
                print(f"  snake={impl:6s}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        if "folded" in outs and "xla" in outs:
            d = np.abs(outs["folded"] - outs["xla"]).max()
            print(f"  max|folded - xla| = {d:.5f}", flush=True)


if __name__ == "__main__":
    main()
