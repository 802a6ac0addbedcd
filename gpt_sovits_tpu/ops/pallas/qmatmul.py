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
    x = x_ref[0].astype(jnp.float32)
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) * (1.0 / 127.0)
    sx = jnp.maximum(sx, 1e-8)
    xq = jnp.clip(jnp.round(x * pl.reciprocal(sx, approx=False)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * sx * sw_ref[:]
    o_ref[0] = (y + b_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def qdense_int8(x, wq, sw, bias, *, block_m: int = 512):
    """y = dequant(quant(x) @ wq) + bias, one fused kernel.

    x: (B, T, K) or (T, K) float (bf16/f32); wq: (K, N) int8
    (per-output-channel symmetric, from quantize_dit_params); sw: (1, N)
    or (N,) f32 weight scales; bias: (N,). Returns (..., N) in x.dtype.
    Per-token (row) dynamic activation scales — same math as the XLA path
    in models/dit.py QDense, fused into one VMEM pass. The batch dim rides
    the grid directly (no host-side flatten: a reshape at the pallas_call
    boundary materializes as real device copies inside the CFM scan —
    measured +30 ms per call, scripts/profile_cfm.py)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    b, t, k = x.shape
    n = wq.shape[1]
    bm = min(block_m, max(16, t))
    pad_t = -t % bm
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    tp = t + pad_t
    sw2 = sw.reshape(1, n).astype(jnp.float32)
    b2 = bias.reshape(1, n).astype(jnp.float32)
    out = pl.pallas_call(
        _qmm_kernel,
        grid=(b, tp // bm),
        in_specs=[
            pl.BlockSpec((1, bm, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((k, n), lambda i, j: (0, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, n), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(x, wq, sw2, b2)
    if pad_t:
        out = out[:, :t]
    return out[0] if squeeze else out
