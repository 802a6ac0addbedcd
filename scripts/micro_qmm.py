"""Microbenchmark: bf16 XLA dot vs int8 XLA dot vs Pallas fused qdense
at DiT serving shapes on the attached chip."""

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


def timeit(fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    shapes = [(2048, 1024, 1024), (2048, 1024, 2048), (2048, 2048, 1024), (4096, 1024, 1024)]
    for m, k, n in shapes:
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        w = jax.random.normal(key, (k, n), jnp.bfloat16)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 8), -127, 127).astype(jnp.int8)
        sw = jnp.full((1, n), 1 / 8.0, jnp.float32)
        bias = jnp.zeros((n,), jnp.float32)

        bf16 = jax.jit(lambda a, b: jnp.dot(a, b))
        t_bf16 = timeit(bf16, x, w)

        def xla_int8(a, bq):
            sx = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
            aq = jnp.clip(jnp.round(a.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(aq, bq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * sx * sw).astype(a.dtype)

        t_xla8 = timeit(jax.jit(xla_int8), x, wq)

        def pure_s8(aq, bq):
            return jax.lax.dot_general(aq, bq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

        aq0 = jnp.ones((m, k), jnp.int8)
        t_pure8 = timeit(jax.jit(pure_s8), aq0, wq)

        t_pallas = timeit(functools.partial(qdense_int8, block_m=512), x, wq, sw, bias)

        flops = 2 * m * k * n
        print(
            f"M{m} K{k} N{n}: bf16 {t_bf16*1e6:.0f}us ({flops/t_bf16/1e12:.1f}T) | "
            f"xla_w8a8 {t_xla8*1e6:.0f}us ({flops/t_xla8/1e12:.1f}T) | "
            f"pure_s8dot {t_pure8*1e6:.0f}us ({flops/t_pure8/1e12:.1f}T) | "
            f"pallas {t_pallas*1e6:.0f}us ({flops/t_pallas/1e12:.1f}T)"
        )
        # correctness
        ref = np.asarray(bf16(x, w), np.float32)
        got = np.asarray(qdense_int8(x, wq, sw, bias), np.float32)
        err = np.abs(ref - got).mean() / (np.abs(ref).mean() + 1e-9)
        print(f"  rel err vs bf16 full-precision: {err:.4f}")


if __name__ == "__main__":
    main()
