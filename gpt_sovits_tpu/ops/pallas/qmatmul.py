"""Fused int8 dynamic-quant matmul (Pallas, TPU).

Serving kernel for the six big DiT matmuls (to_q/k/v/out, ff1/ff2 —
reference hot loop GPT_SoVITS/module/models.py:1042-1084 driving
f5_tts/model/modules.py:550). The XLA formulation of W8A8 (quantize x →
s8×s8 dot → rescale) ran at ~1.0x bf16 on v5e (BENCH_v3_r03
cfm_int8_speedup): the activation quantize/rescale run as separate HBM
round-trips that eat the int8 MXU gain. Here the row-scale, quantize,
s8 dot and epilogue all live in one kernel: x streams through VMEM once,
and the MXU runs at its doubled int8 rate.

Layout: grid over M tiles only; the int8 weight (K, N) is one VMEM block
reused across grid steps (K·N ≤ 2 MB for every DiT shape), so each x
tile is quantized exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, w_ref, sw_ref, b_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) * (1.0 / 127.0)
    sx = jnp.maximum(sx, 1e-8)
    xq = jnp.clip(jnp.round(x * pl.reciprocal(sx, approx=False)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * sx * sw_ref[:]
    o_ref[:] = (y + b_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def qdense_int8(x, wq, sw, bias, *, block_m: int = 512):
    """y = dequant(quant(x) @ wq) + bias, one fused kernel.

    x: (..., K) float (bf16/f32); wq: (K, N) int8 (per-output-channel
    symmetric, from quantize_dit_params); sw: (1, N) or (N,) f32 weight
    scales; bias: (N,). Returns (..., N) in x.dtype. Per-token (row)
    dynamic activation scales — same math as the XLA path in
    models/dit.py QDense, fused.
    """
    orig_shape = x.shape
    k = x.shape[-1]
    n = wq.shape[1]
    m = 1
    for s in orig_shape[:-1]:
        m *= s
    x2 = x.reshape(m, k)
    bm = min(block_m, max(32, m))
    pad_m = -m % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    sw2 = sw.reshape(1, n).astype(jnp.float32)
    b2 = bias.reshape(1, n).astype(jnp.float32)
    out = pl.pallas_call(
        _qmm_kernel,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x2, wq, sw2, b2)
    if pad_m:
        out = out[:m]
    return out.reshape(*orig_shape[:-1], n)
