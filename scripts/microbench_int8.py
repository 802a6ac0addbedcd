"""Raw matmul microbench: does int8 x int8 -> int32 dot_general hit the
doubled int8 MXU rate on v5e (vs bf16), and what does the QDense dynamic
activation-quant overhead cost?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from scripts._trace_time import device_time

def t(fn, *a, n=20):
    return device_time(fn, *a, n=5)

key = jax.random.PRNGKey(0)
M, K, N = 6 * 1024, 1024, 2048  # ff1-like at b6 T1024
flops = 2 * M * K * N
xb = jax.random.normal(key, (M, K)).astype(jnp.bfloat16)
wb = jax.random.normal(key, (K, N)).astype(jnp.bfloat16)
xi = jnp.clip(jnp.round(jax.random.normal(key, (M, K)) * 30), -127, 127).astype(jnp.int8)
wi = jnp.clip(jnp.round(jax.random.normal(key, (K, N)) * 30), -127, 127).astype(jnp.int8)

f_bf = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
f_i8 = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
d_bf = t(f_bf, xb, wb); d_i8 = t(f_i8, xi, wi)
print(f"bf16 matmul: {d_bf*1e6:.0f} us = {flops/d_bf/1e12:.1f} TFLOP/s")
print(f"int8 matmul: {d_i8*1e6:.0f} us = {flops/d_i8/1e12:.1f} TOP/s  (speedup {d_bf/d_i8:.2f}x)")

# QDense-like full path: dynamic act quant + int8 matmul + dequant
from gpt_sovits_tpu.models.dit import QDense
qd = QDense(N, quant=True)
wq = {"params": {"kernel": wi, "bias": jnp.zeros((N,), jnp.float32),
                 "kernel_scale": jnp.ones((1, N), jnp.float32)}}
f_qd = jax.jit(lambda x: qd.apply(wq, x))
d_qd = t(f_qd, xb)
wf = {"params": {"kernel": wb, "bias": jnp.zeros((N,), jnp.bfloat16)}}
qd_f = QDense(N, quant=False)
f_qf = jax.jit(lambda x: qd_f.apply(wf, x))
d_qf = t(f_qf, xb)
print(f"QDense float: {d_qf*1e6:.0f} us   QDense int8(+act quant): {d_qd*1e6:.0f} us  (speedup {d_qf/d_qd:.2f}x)")
