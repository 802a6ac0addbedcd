"""CFM throughput probe: batch x flash-block-size, trace-timed.

Explains/validates the batched-path inefficiency: flash attention's grid
is (B, H, T/block) sequential steps, so per-step overhead scales with
batch at fixed block."""
import os, sys, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from scripts._trace_time import device_time

def main():
    from gpt_sovits_tpu.models.dit import DiT, DiTConfig
    from gpt_sovits_tpu.models.v3 import cfm_inference
    cfg = DiTConfig()
    key = jax.random.PRNGKey(0)
    t, t_ref = 934, 468
    dit = DiT(cfg)
    x0 = jnp.zeros((1, t, cfg.mel_dim), jnp.bfloat16)
    params = jax.eval_shape(dit.init, key, x0, x0, jnp.zeros((1,)), jnp.zeros((1,)),
                            jnp.zeros((1, t, cfg.text_dim), jnp.bfloat16), jnp.ones((1, t), bool))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), params)
    steps = 8  # enough steps to dwarf setup; scale x4 for 32
    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def cfm(p, mu, lens, prompt, k, n_steps=steps):
        return cfm_inference(dit, p, mu, lens, prompt, k, n_steps=n_steps).astype(jnp.float32)
    for blk in ("512", "1024"):
        os.environ["GPT_SOVITS_FLASH_BLOCK"] = blk
        for b in (1, 6):
            mu = jax.random.normal(key, (b, t, cfg.text_dim)).astype(jnp.bfloat16)
            prompt = (jax.random.normal(key, (b, t_ref, cfg.mel_dim)) * 0.1).astype(jnp.bfloat16)
            lens = jnp.full((b,), t, jnp.int32)
            f = jax.jit(functools.partial(cfm, n_steps=steps))
            # new env -> retrace: use a fresh wrapper to avoid jit cache hits
            g = jax.jit(lambda p, m, l, pr, k, _blk=blk: cfm_inference(
                dit, p, m, l, pr, k, n_steps=steps).astype(jnp.float32))
            dt = device_time(g, params, mu, lens, prompt, key, n=3)
            per_row_32 = dt / b * 4
            print(f"block={blk} b={b}: {dt*1e3:7.1f} ms/{steps}steps -> {per_row_32:.3f} s/row @32 steps", flush=True)

if __name__ == "__main__":
    main()
