"""Profile the v3/v4 CFM-DiT path on the attached TPU at production sizes.

Measures (random weights, real shapes/dtypes):
  - one DiT forward (T=934, 22L/1024d) in f32 and bf16
  - full CFM Euler sampling (n_steps x DiT) per chunk
  - BigVGAN vocoder forward for one chunk of mel
  - implied RTF for the v3 path (chunked synthesis of 20 s)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from gpt_sovits_tpu.models.dit import DiT, DiTConfig
    from gpt_sovits_tpu.models.v3 import cfm_inference

    cfg = DiTConfig()
    t_chunk, t_ref = 934, 468
    b = 1
    key = jax.random.PRNGKey(0)

    dit = DiT(cfg)
    x = jax.random.normal(key, (b, t_chunk, cfg.mel_dim))
    cond = jnp.zeros_like(x)
    tt = jnp.zeros((b,))
    text = jax.random.normal(key, (b, t_chunk, cfg.text_dim))
    mask = jnp.ones((b, t_chunk), bool)
    params = dit.init(key, x, cond, tt, tt, text, mask)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"DiT params: {n_params/1e6:.1f} M")

    fwd = jax.jit(dit.apply)
    dt = timeit(fwd, params, x, cond, tt, tt, text, mask)
    print(f"DiT fwd f32  T={t_chunk}: {dt*1e3:.2f} ms")

    params_bf = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    dt_bf = timeit(
        fwd, params_bf, x.astype(jnp.bfloat16), cond.astype(jnp.bfloat16),
        tt.astype(jnp.bfloat16), tt.astype(jnp.bfloat16),
        text.astype(jnp.bfloat16), mask,
    )
    print(f"DiT fwd bf16 T={t_chunk}: {dt_bf*1e3:.2f} ms")

    # full CFM Euler chunk
    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def cfm(params, mu, x_lens, prompt, k, n_steps):
        return cfm_inference(dit, params, mu, x_lens, prompt, k, n_steps=n_steps)

    mu = jax.random.normal(key, (b, t_chunk, cfg.text_dim))
    prompt = jax.random.normal(key, (b, t_ref, cfg.mel_dim)) * 0.1
    x_lens = jnp.asarray([t_chunk])
    for steps in (8, 32):
        d = timeit(cfm, params, mu, x_lens, prompt, key, n_steps=steps, n=3)
        print(f"CFM f32  {steps} steps: {d*1e3:.1f} ms")
        d = timeit(
            cfm, params_bf, mu.astype(jnp.bfloat16), x_lens,
            prompt.astype(jnp.bfloat16), key, n_steps=steps, n=3,
        )
        print(f"CFM bf16 {steps} steps: {d*1e3:.1f} ms")

    # BigVGAN vocoder, one chunk of mel (T=934 -> 934*256 samples @24k = 9.96 s)
    from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig

    bcfg = BigVGANConfig()
    voc = BigVGAN(bcfg)
    mel = jax.random.normal(key, (b, t_chunk, 100))
    vparams = jax.jit(voc.init)(key, mel)
    vfwd = jax.jit(voc.apply)
    d = timeit(vfwd, vparams, mel, n=3)
    print(f"BigVGAN f32 T={t_chunk} ({t_chunk*256/24000:.1f} s audio): {d*1e3:.1f} ms")
    vparams_bf = jax.tree.map(lambda p: p.astype(jnp.bfloat16), vparams)
    d = timeit(vfwd, vparams_bf, mel.astype(jnp.bfloat16), n=3)
    print(f"BigVGAN bf16: {d*1e3:.1f} ms")


if __name__ == "__main__":
    main()
