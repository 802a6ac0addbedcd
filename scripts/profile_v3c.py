"""v3 profile, take 3. All executables warmed before timing; per-DiT-fwd
device time from the (32-step minus 8-step) CFM difference, which cancels
the tunnel's constant per-call overhead. Results fetched to host."""

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


def fetch_time(fn, *args, n=3, **kw):
    np.asarray(fn(*args, **kw))  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(n):
        out = np.asarray(fn(*args, **kw))
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
    params_bf = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    # tunnel roundtrip baseline
    tiny = jax.jit(lambda a: a + 1.0)
    rt = fetch_time(tiny, jnp.zeros((8,)), n=5)
    print(f"tunnel roundtrip baseline: {rt*1e3:.1f} ms")

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def cfm(params, mu, x_lens, prompt, k, n_steps):
        return cfm_inference(dit, params, mu, x_lens, prompt, k, n_steps=n_steps)

    mu = jax.random.normal(key, (b, t_chunk, cfg.text_dim))
    prompt = jax.random.normal(key, (b, t_ref, cfg.mel_dim)) * 0.1
    x_lens = jnp.asarray([t_chunk])
    for name, p, m, pr in (
        ("f32", params, mu, prompt),
        ("bf16", params_bf, mu.astype(jnp.bfloat16), prompt.astype(jnp.bfloat16)),
    ):
        t8 = fetch_time(cfm, p, m, x_lens, pr, key, n_steps=8)
        t32 = fetch_time(cfm, p, m, x_lens, pr, key, n_steps=32)
        per_fwd = (t32 - t8) / 24
        print(
            f"CFM {name}: 8 steps {t8*1e3:.1f} ms, 32 steps {t32*1e3:.1f} ms"
            f" -> {per_fwd*1e3:.2f} ms/DiT-fwd"
        )

    from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig

    bcfg = BigVGANConfig()
    voc = BigVGAN(bcfg)
    mel = jax.random.normal(key, (b, t_chunk, 100))
    vparams = jax.jit(voc.init)(key, mel)
    vfwd = jax.jit(voc.apply)
    d = fetch_time(vfwd, vparams, mel)
    print(f"BigVGAN f32 T={t_chunk} ({t_chunk*256/24000:.1f}s audio): {d*1e3:.1f} ms (incl roundtrip)")
    vparams_bf = jax.tree.map(lambda q: q.astype(jnp.bfloat16), vparams)
    d = fetch_time(vfwd, vparams_bf, mel.astype(jnp.bfloat16))
    print(f"BigVGAN bf16: {d*1e3:.1f} ms (incl roundtrip)")

    voc_pl = BigVGAN(bcfg, use_pallas=True)
    vfwd_pl = jax.jit(voc_pl.apply)
    try:
        d = fetch_time(vfwd_pl, vparams, mel)
        print(f"BigVGAN f32 + pallas snake_aa: {d*1e3:.1f} ms (incl roundtrip)")
    except Exception as e:  # kernel may not support all shapes
        print("pallas snake path failed:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
