"""Conv lowering strategies for the folded vocoder, timed robustly
(100-deep queue + final block + host fetch: per-call block_until_ready
under-reports on the tunnel device)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from scripts._trace_time import device_time

def timeit(fn, *args, n=100):
    return device_time(fn, *args, n=5)

key = jax.random.PRNGKey(0)
CASES = [  # (Q, R, kq) from the folded plan's heaviest convs
    (22368, 384, 27),  # stage3 k=11 d=5 folded r=2
    (22368, 384, 11),  # stage3 k=11 d=1 / stage4 mid
    (5592, 768, 11),   # stage1 k=11 (r=1, plain dilated conv d=5)
    (22368, 384, 3),   # light folded
]
for Q, R, kq in CASES:
    x = (jax.random.normal(key, (1, Q, R)) * 0.3).astype(jnp.bfloat16)
    w = (jax.random.normal(key, (kq, R, R)) * 0.05).astype(jnp.bfloat16)
    pad = (kq - 1) // 2
    gflop = 2 * Q * R * kq * R / 1e9

    conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, kq - 1 - pad)], dimension_numbers=("NWC", "WIO", "NWC")))
    d1 = timeit(conv, x, w)

    def tapsum(x, w):
        xp = jnp.pad(x, ((0, 0), (pad, kq - 1 - pad), (0, 0)))[0]
        acc = jnp.dot(xp[0:Q], w[0], preferred_element_type=jnp.float32)
        for i in range(1, kq):
            acc = acc + jnp.dot(xp[i : i + Q], w[i], preferred_element_type=jnp.float32)
        return acc.astype(x.dtype)[None]
    taps = jax.jit(tapsum)
    d2 = timeit(taps, x, w)

    def tapsum_bf(x, w):  # bf16 accumulation (one fewer convert pass)
        xp = jnp.pad(x, ((0, 0), (pad, kq - 1 - pad), (0, 0)))[0]
        acc = jnp.dot(xp[0:Q], w[0])
        for i in range(1, kq):
            acc = acc + jnp.dot(xp[i : i + Q], w[i])
        return acc[None]
    taps_bf = jax.jit(tapsum_bf)
    d3 = timeit(taps_bf, x, w)

    print(f"Q={Q} R={R} kq={kq} ({gflop:.0f} GFLOP): conv {d1*1e3:.2f} ms ({gflop/d1/1e3:.0f} TF/s) | "
          f"tap-matmul f32acc {d2*1e3:.2f} ms ({gflop/d2/1e3:.0f} TF/s) | bf16acc {d3*1e3:.2f} ms ({gflop/d3/1e3:.0f} TF/s)",
          flush=True)
