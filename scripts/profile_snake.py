"""Per-stage timing of the folded AA-snake kernel + folded MRF convs on the
real TPU: attributes the vocoder's marginal cost (snake VPU work vs conv
MXU work) for a 1398-frame (14.9 s) utterance."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gpt_sovits_tpu.ops.pallas.snake_aa import snake_aa_folded

T_MEL = 1398
# (r, ch, T_unfolded multiplier after stage upsample): rates 4,4,2,2,2,2
STAGES = [
    (1, 768, 4), (1, 384, 16), (2, 192, 32), (4, 96, 64), (8, 48, 128), (16, 24, 256),
]

def timeit(fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n

key = jax.random.PRNGKey(0)
tot_snake = 0.0
for r, ch, mult in STAGES:
    T = T_MEL * mult
    Q = T // r
    R = r * ch
    x = (jax.random.normal(key, (1, Q, R)) * 0.3).astype(jnp.bfloat16)
    a = jnp.zeros((ch,)); b = jnp.zeros((ch,))
    f = jax.jit(functools.partial(snake_aa_folded, r=r, ch=ch, logscale=True))
    dt = timeit(f, x, a, b)
    n_snakes = 19 if (r, ch) != (16, 24) else 20  # 18 MRF + act_post on last
    tot_snake += dt * n_snakes
    print(f"stage r={r:2d} ch={ch:3d} Q={Q:6d} R={R}: {dt*1e3:7.3f} ms/snake x{n_snakes} = {dt*n_snakes*1e3:6.1f} ms", flush=True)
print(f"total snake: {tot_snake*1e3:.1f} ms (vocoder total was ~260 ms at this T)")

# one representative folded conv per stage (k=7, d=3 - middle case)
from gpt_sovits_tpu.ops.folded_conv import fold_conv_weight
for r, ch, mult in STAGES:
    T = T_MEL * mult
    Q = T // r
    R = r * ch
    rng = np.random.default_rng(0)
    w = rng.standard_normal((7, ch, ch)).astype(np.float32) * 0.05
    if r > 1:
        wf, pads = fold_conv_weight(w, 3, 9, r)
    else:
        wf, pads = w, (9, 9)
    wf = jnp.asarray(wf, jnp.bfloat16)
    x = (jax.random.normal(key, (1, Q, R)) * 0.3).astype(jnp.bfloat16)
    conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1,), [pads], rhs_dilation=(3 if r == 1 else 1,),
        dimension_numbers=("NWC", "WIO", "NWC")))
    dt = timeit(conv, x, wf)
    print(f"conv  r={r:2d} ch={ch:3d} kq={wf.shape[0]}: {dt*1e3:7.3f} ms/conv", flush=True)
