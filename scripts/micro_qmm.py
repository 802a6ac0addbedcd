"""Microbenchmark: bf16 XLA dot vs int8 XLA dot vs Pallas fused qdense
at DiT serving shapes. Chains 64 dependent matmuls inside one jit so the
tunnel's per-dispatch latency (~1.3 ms) amortizes away."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gpt_sovits_tpu.ops.pallas.qmatmul import qdense_int8

ITERS = 64


def timed(fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n / ITERS


def main():
    key = jax.random.PRNGKey(0)
    m, k = 2048, 1024  # DiT ff pair: 1024 -> 2048 -> 1024
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w1 = jax.random.normal(key, (k, 2 * k), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(1), (2 * k, k), jnp.bfloat16) * 0.02
    w1q = jnp.clip(jnp.round(w1.astype(jnp.float32) * 800), -127, 127).astype(jnp.int8)
    w2q = jnp.clip(jnp.round(w2.astype(jnp.float32) * 800), -127, 127).astype(jnp.int8)
    s1 = jnp.full((1, 2 * k), 1 / 800.0, jnp.float32)
    s2 = jnp.full((1, k), 1 / 800.0, jnp.float32)
    b1 = jnp.zeros((2 * k,), jnp.float32)
    b2 = jnp.zeros((k,), jnp.float32)
    flops_iter = 2 * m * k * 2 * k * 2  # two matmuls per iter

    @jax.jit
    def chain_bf16(x, w1, w2):
        def body(y, _):
            y = jnp.tanh(jnp.dot(jnp.dot(y, w1), w2))
            return y, None

        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    def _xla_q(a, wq, sw):
        sx = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-8)
        aq = jnp.clip(jnp.round(a.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(aq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sx * sw).astype(a.dtype)

    @jax.jit
    def chain_xla8(x, w1q, w2q):
        def body(y, _):
            y = jnp.tanh(_xla_q(_xla_q(y, w1q, s1), w2q, s2))
            return y, None

        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    @functools.partial(jax.jit, static_argnames=("block_m",))
    def chain_pallas(x, w1q, w2q, block_m=512):
        def body(y, _):
            h = qdense_int8(y, w1q, s1, b1, block_m=block_m)
            y = jnp.tanh(qdense_int8(h, w2q, s2, b2, block_m=block_m))
            return y, None

        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    t = timed(chain_bf16, x, w1, w2)
    print(f"bf16        : {t*1e6:8.1f} us/iter  {flops_iter/t/1e12:6.1f} TFLOP/s")
    t = timed(chain_xla8, x, w1q, w2q)
    print(f"xla w8a8    : {t*1e6:8.1f} us/iter  {flops_iter/t/1e12:6.1f} TFLOP/s")
    for bm in (256, 512, 1024, 2048):
        t = timed(functools.partial(chain_pallas, block_m=bm), x, w1q, w2q)
        print(f"pallas bm{bm:<5}: {t*1e6:8.1f} us/iter  {flops_iter/t/1e12:6.1f} TOP/s")

    ref = np.asarray(jnp.dot(jnp.dot(x, w1), w2), np.float32)
    got = np.asarray(
        qdense_int8(qdense_int8(x, w1q, s1, b1), w2q, s2, b2), np.float32
    )
    err = np.abs(ref - got).mean() / (np.abs(ref).mean() + 1e-9)
    print(f"pallas rel err vs bf16 (2-layer): {err:.4f}")


if __name__ == "__main__":
    main()
