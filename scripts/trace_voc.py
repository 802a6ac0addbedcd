"""Trace one cached folded-vocoder call and print the per-op breakdown
(see scripts/probe_dit.py for the aggregation pattern; writes /tmp/jaxtrace)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from gpt_sovits_tpu.ops.folded_bigvgan import bigvgan_apply, fold_bigvgan_params
os.environ["GSVT_SNAKE"] = "folded"
dtype = jnp.bfloat16
key = jax.random.PRNGKey(0)
cfg = BigVGANConfig()
bv = BigVGAN(cfg)
p = jax.jit(bv.init)(key, jnp.zeros((1, 64, 100)))
folded = fold_bigvgan_params(p["params"], cfg, dtype=dtype)
static = {k: v for k, v in folded.items() if k != "arrays"}
voc = jax.jit(lambda a, m: bigvgan_apply({"arrays": a, **static}, m.astype(dtype)).astype(jnp.float32))
mel = jax.random.normal(key, (1, 1398, 100)) * 0.3
jax.block_until_ready(voc(folded["arrays"], mel))
t0 = time.perf_counter(); jax.block_until_ready(voc(folded["arrays"], mel)); print("warm run", time.perf_counter()-t0)
try:
    with jax.profiler.trace("/tmp/jaxtrace"):
        jax.block_until_ready(voc(folded["arrays"], mel))
    print("trace written")
except Exception as e:
    print("trace failed:", type(e).__name__, str(e)[:200])
