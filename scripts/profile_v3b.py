"""v3 profile, take 2: chain iterations through data dependencies and
fetch results to the host so the tunnel cannot hide device time."""

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

    # chained DiT forwards: out mel feeds the next call's x
    @functools.partial(jax.jit, static_argnames=("n",))
    def dit_chain(params, x, cond, text, mask, n):
        def body(h, _):
            v, _te = dit.apply(params, h, cond, tt, tt, text, mask)
            return v, None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return h

    for name, p, xx, cc, te in (
        ("f32", params, x, cond, text),
        ("bf16", params_bf, x.astype(jnp.bfloat16), cond.astype(jnp.bfloat16), text.astype(jnp.bfloat16)),
    ):
        out = np.asarray(dit_chain(p, xx, cc, te, mask, n=4))  # warm
        t0 = time.perf_counter()
        out = np.asarray(dit_chain(p, xx, cc, te, mask, n=36))
        t1 = time.perf_counter()
        out = np.asarray(dit_chain(p, xx, cc, te, mask, n=4))
        t2 = time.perf_counter()
        per = ((t1 - t0) - (t2 - t1)) / 32
        print(f"DiT fwd {name} T={t_chunk}: {per*1e3:.2f} ms/fwd (36-4 chained diff)")

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def cfm(params, mu, x_lens, prompt, k, n_steps):
        return cfm_inference(dit, params, mu, x_lens, prompt, k, n_steps=n_steps)

    mu = jax.random.normal(key, (b, t_chunk, cfg.text_dim))
    prompt = jax.random.normal(key, (b, t_ref, cfg.mel_dim)) * 0.1
    x_lens = jnp.asarray([t_chunk])
    for steps in (8, 32):
        for name, p, m, pr in (
            ("f32", params, mu, prompt),
            ("bf16", params_bf, mu.astype(jnp.bfloat16), prompt.astype(jnp.bfloat16)),
        ):
            np.asarray(cfm(p, m, x_lens, pr, key, n_steps=steps))  # warm
            t0 = time.perf_counter()
            for i in range(3):
                out = np.asarray(cfm(p, m, x_lens, pr, jax.random.PRNGKey(i), n_steps=steps))
            d = (time.perf_counter() - t0) / 3
            print(f"CFM {name} {steps} steps: {d*1e3:.1f} ms (fetched)")

    from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig

    bcfg = BigVGANConfig()
    voc = BigVGAN(bcfg)
    mel = jax.random.normal(key, (b, t_chunk, 100))
    vparams = jax.jit(voc.init)(key, mel)
    vfwd = jax.jit(voc.apply)
    for name, p, m in (("f32", vparams, mel),):
        np.asarray(vfwd(p, m))
        t0 = time.perf_counter()
        for _ in range(3):
            out = np.asarray(vfwd(p, m))
        d = (time.perf_counter() - t0) / 3
        print(f"BigVGAN {name} T={t_chunk} ({t_chunk*256/24000:.1f}s audio): {d*1e3:.1f} ms (fetched)")
    vparams_bf = jax.tree.map(lambda q: q.astype(jnp.bfloat16), vparams)
    np.asarray(vfwd(vparams_bf, mel.astype(jnp.bfloat16)))
    t0 = time.perf_counter()
    for _ in range(3):
        out = np.asarray(vfwd(vparams_bf, mel.astype(jnp.bfloat16)))
    d = (time.perf_counter() - t0) / 3
    print(f"BigVGAN bf16: {d*1e3:.1f} ms (fetched)")


if __name__ == "__main__":
    main()
