"""Real-TPU smoke: fused decode step at B=8/D=512 (post per-row-DMA rewrite)
vs the flax step, plus per-token timing at B in {1,4,8}, bf16 and int8."""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gpt_sovits_tpu.models.t2s import T2SDecoder, generate
from gpt_sovits_tpu.utils.config import S1Config

def run(bsz, quant, n_new=32):
    cfg = S1Config()
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    s1 = T2SDecoder(cfg, dtype=dtype)
    params = jax.jit(functools.partial(s1.init, method=T2SDecoder.init_all))(key)
    TL, PT = 120, 125
    phones = jnp.zeros((bsz, TL), jnp.int32)
    tl = jnp.full((bsz,), TL, jnp.int32)
    bert = jnp.zeros((bsz, TL, cfg.bert_dim), dtype)
    prompt = jnp.zeros((bsz, PT), jnp.int32)
    pl_ = jnp.full((bsz,), PT, jnp.int32)
    def step(k):
        return generate(s1, params, phones, tl, bert, prompt, pl_, k,
                        max_new_tokens=n_new, top_k=15, top_p=1.0, temperature=1.0,
                        repetition_penalty=1.35, early_stop_num=n_new,
                        use_fused_kernel=True, weight_quant=quant)
    out = step(key)  # compile
    jax.block_until_ready(out.tokens)
    t0 = time.perf_counter()
    out = step(jax.random.PRNGKey(1))
    jax.block_until_ready(out.tokens)
    dt = time.perf_counter() - t0
    tok = np.asarray(out.tokens)
    assert np.isfinite(tok.astype(np.float64)).all()
    print(f"B={bsz} quant={quant}: {dt*1e3/n_new:.3f} ms/token ({n_new} tokens) ok", flush=True)

if __name__ == "__main__":
    for quant in ("bf16", "int8"):
        for bsz in (1, 4, 8):
            try:
                run(bsz, quant)
            except Exception as e:
                print(f"B={bsz} quant={quant}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
