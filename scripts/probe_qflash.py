"""qflash numerics + speed on-chip vs the bf16 flash kernel and the f32
einsum reference, at the serving CFM shape."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from scripts._trace_time import device_time
from gpt_sovits_tpu.ops.pallas.qflash import flash_attn_int8

B, H, T, DH = int(os.environ.get("QF_B", "2")), 16, 1024, 64
SM = 1.0 / float(np.sqrt(DH))


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    # magnitudes like post-LN projections (unit-ish variance)
    q = jax.random.normal(ks[0], (B, H, T, DH), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, T, DH), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, T, DH), jnp.bfloat16)

    @jax.jit
    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * SM
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))

    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes, flash_attention

    @jax.jit
    def bf16_flash(q, k, v):
        bs = BlockSizes(block_q=1024, block_k_major=1024, block_k=1024, block_b=1)
        return flash_attention(q, k, v, sm_scale=SM, block_sizes=bs)

    qf = jax.jit(functools.partial(flash_attn_int8, sm_scale=SM))

    want_h = np.asarray(ref(q, k, v))  # (B, H, T, dh)
    want = want_h.transpose(0, 2, 1, 3).reshape(B, T, H * DH)  # merged
    got = np.asarray(qf(q, k, v), dtype=np.float32)  # (B, T, H*dh)
    gotb = np.asarray(bf16_flash(q, k, v), dtype=np.float32)
    d = np.abs(got - want)
    db = np.abs(gotb - want_h)
    print("int8 vs f32 einsum: maxabs", round(float(d.max()), 5), "mean", round(float(d.mean()), 6))
    print("bf16flash vs f32  : maxabs", round(float(db.max()), 5), "mean", round(float(db.mean()), 6))

    t_ref = device_time(ref, q, k, v)
    t_bf = device_time(bf16_flash, q, k, v)
    t_q = device_time(qf, q, k, v)
    flops = 4 * B * H * T * T * DH
    print(f"einsum f32 : {t_ref*1e3:8.3f} ms  {flops/t_ref/1e12:6.1f} T/s")
    print(f"bf16 flash : {t_bf*1e3:8.3f} ms  {flops/t_bf/1e12:6.1f} T/s")
    print(f"int8 qflash: {t_q*1e3:8.3f} ms  {flops/t_q/1e12:6.1f} T/s  ({t_bf/t_q:.2f}x vs bf16 flash)")

    # masked variant
    lens = jnp.asarray([T] * (B - 1) + [T - 317], jnp.int32)
    mask = jnp.arange(T)[None, :] < lens[:, None]
    qfm = jax.jit(functools.partial(flash_attn_int8, sm_scale=SM))
    got_m = np.asarray(qfm(q, k, v, mask), dtype=np.float32)
    t_qm = device_time(qfm, q, k, v, mask)
    print(f"int8 masked: {t_qm*1e3:8.3f} ms; finite={np.isfinite(got_m).all()}")


if __name__ == "__main__":
    main()
