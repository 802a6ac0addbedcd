"""Flash-attention block_b sweep at the serving CFM shape (trace-timed)."""
import os, sys, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from scripts._trace_time import device_time
from gpt_sovits_tpu.models.dit import DiT, DiTConfig
from gpt_sovits_tpu.models.v3 import cfm_inference

cfg = DiTConfig()
key = jax.random.PRNGKey(0)
b, t, t_ref, steps = 6, 934, 468, 8
dit = DiT(cfg)
x0 = jnp.zeros((1, t, cfg.mel_dim), jnp.bfloat16)
shapes = jax.eval_shape(dit.init, key, x0, x0, jnp.zeros((1,)), jnp.zeros((1,)),
                        jnp.zeros((1, t, cfg.text_dim), jnp.bfloat16), jnp.ones((1, t), bool))
params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
mu = jax.random.normal(key, (b, t, cfg.text_dim)).astype(jnp.bfloat16)
prompt = (jax.random.normal(key, (b, t_ref, cfg.mel_dim)) * 0.1).astype(jnp.bfloat16)
lens = jnp.full((b,), t, jnp.int32)
for bb in ("1", "2", "6"):
    os.environ["GPT_SOVITS_FLASH_BLOCK_B"] = bb
    g = jax.jit(lambda p, m, l, pr, k, _bb=bb: cfm_inference(dit, p, m, l, pr, k, n_steps=steps).astype(jnp.float32))
    try:
        dt = device_time(g, params, mu, lens, prompt, key, n=3)
        print(f"block_b={bb}: {dt*1e3:7.1f} ms/{steps}steps b{b} -> {dt/b*4:.3f} s/row @32", flush=True)
    except Exception as e:
        print(f"block_b={bb}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
