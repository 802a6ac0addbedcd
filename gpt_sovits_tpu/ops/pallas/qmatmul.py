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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_mod(x, sc, sh, eps=1e-6):
    """Affine-free LayerNorm + AdaLN modulation: ln(x) * (1+sc) + sh."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * (1.0 + sc) + sh


def _gelu_tanh(y):
    # nn.gelu(approximate=True)
    return 0.5 * y * (1.0 + jnp.tanh(0.7978845608028654 * (y + 0.044715 * y * y * y)))


def _make_qmm_kernel(ln_mod: bool, act: str | None, res_gate: bool, masked: bool):
    """quantize -> s8 dot -> rescale, with the DiT block's elementwise
    glue fused in instead of separate XLA HBM round-trips (round 5):
      ln_mod:   prologue LayerNorm(no affine, eps 1e-6) + AdaLN
                modulation (reference models.py:1042-1084 AdaLN-Zero)
      act:      "gelu" epilogue (ff1 -> gelu)
      res_gate: epilogue y = res + gate * y (gated residual add)
      masked:   pad-frame zeroing of y before the gated add (the
                attention out-projection's pad fence)"""

    def kernel(*refs):
        refs = list(refs)
        x_ref = refs.pop(0)
        w_ref = refs.pop(0)
        sw_ref = refs.pop(0)
        b_ref = refs.pop(0)
        sc_ref = refs.pop(0) if ln_mod else None
        sh_ref = refs.pop(0) if ln_mod else None
        res_ref = refs.pop(0) if res_gate else None
        gate_ref = refs.pop(0) if res_gate else None
        msk_ref = refs.pop(0) if masked else None
        o_ref = refs.pop(0)

        x = x_ref[0].astype(jnp.float32)
        if ln_mod:
            x = _ln_mod(x, sc_ref[0], sh_ref[0])
        sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) * (1.0 / 127.0)
        sx = jnp.maximum(sx, 1e-8)
        xq = jnp.clip(jnp.round(x * pl.reciprocal(sx, approx=False)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * sx * sw_ref[:] + b_ref[:]
        if act == "gelu":
            y = _gelu_tanh(y)
        if masked:
            y = jnp.where(msk_ref[0, 0][:, None] > 0, y, 0.0)
        if res_gate:
            y = res_ref[0].astype(jnp.float32) + gate_ref[0] * y
        o_ref[0] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_m", "act"))
def qdense_int8(x, wq, sw, bias, ln_mod=None, res_gate=None, mask=None, *, act=None, block_m: int = 512):
    """y = dequant(quant(x) @ wq) + bias, one fused kernel.

    x: (B, T, K) or (T, K) float (bf16/f32); wq: (K, N) int8
    (per-output-channel symmetric, from quantize_dit_params); sw: (1, N)
    or (N,) f32 weight scales; bias: (N,). Returns (..., N) in x.dtype.
    Per-token (row) dynamic activation scales — same math as the XLA path
    in models/dit.py QDense, fused into one VMEM pass. The batch dim rides
    the grid directly (no host-side flatten: a reshape at the pallas_call
    boundary materializes as real device copies inside the CFM scan —
    measured +30 ms per call, scripts/profile_cfm.py).

    Optional DiT-block glue, fused instead of separate XLA passes:
      ln_mod=(scale (B,K), shift (B,K)): LayerNorm(no affine) + AdaLN
        modulation prologue;  act="gelu": gelu epilogue;
      res_gate=(res (B,T,N), gate (B,N)): y = res + gate*y epilogue;
      mask (B,T): pad-frame zeroing of y before the gated add."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    b, t, k = x.shape
    n = wq.shape[1]
    bm = min(block_m, max(16, t))
    pad_t = -t % bm
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        if res_gate is not None:
            res_gate = (jnp.pad(res_gate[0], ((0, 0), (0, pad_t), (0, 0))), res_gate[1])
        if mask is not None:
            mask = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, pad_t)))
    tp = t + pad_t
    sw2 = sw.reshape(1, n).astype(jnp.float32)
    b2 = bias.reshape(1, n).astype(jnp.float32)
    in_specs = [
        pl.BlockSpec((1, bm, k), lambda i, j: (i, j, 0)),
        pl.BlockSpec((k, n), lambda i, j: (0, 0)),
        pl.BlockSpec((1, n), lambda i, j: (0, 0)),
        pl.BlockSpec((1, n), lambda i, j: (0, 0)),
    ]
    args = [x, wq, sw2, b2]
    if ln_mod is not None:
        sc, sh = ln_mod
        in_specs += [
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0)),
        ]
        args += [sc.reshape(b, 1, k).astype(jnp.float32), sh.reshape(b, 1, k).astype(jnp.float32)]
    if res_gate is not None:
        res, gate = res_gate
        in_specs += [
            pl.BlockSpec((1, bm, n), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0)),
        ]
        args += [res, gate.reshape(b, 1, n).astype(jnp.float32)]
    if mask is not None:
        # (B, 1, T) with a unit row dim (block second-minor dim must be
        # divisible by 8 or equal to the array dim)
        in_specs.append(pl.BlockSpec((1, 1, bm), lambda i, j: (i, 0, j)))
        args.append(mask.astype(jnp.float32).reshape(b, 1, t + pad_t))
    out = pl.pallas_call(
        _make_qmm_kernel(ln_mod is not None, act, res_gate is not None, mask is not None),
        grid=(b, tp // bm),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bm, n), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*args)
    if pad_t:
        out = out[:, :t]
    return out[0] if squeeze else out


def _qkv_rope_kernel(dim_head: int, ln_mod: bool = False, q_scale: float = 1.0):
    """q/k/v projections + rope + head-split layout in one pass; with
    ln_mod, the attn_norm LayerNorm + AdaLN modulation fuse in as a
    prologue (round 5 — two fewer (B, T, D) XLA passes per block).
    q_scale: static multiplier folded into q's dequant (the attention
    sm_scale — in-register, no extra operands: adding scaled scale/bias
    buffers instead tipped the 16M scoped-VMEM budget by exactly their
    8K)."""

    def kernel(*refs):
        refs = list(refs)
        x_ref = refs.pop(0)
        (wq_ref, wk_ref, wv_ref, sq_ref, sk_ref, sv_ref,
         bq_ref, bk_ref, bv_ref, cos_ref, sin_ref) = refs[:11]
        refs = refs[11:]
        sc_ref = refs.pop(0) if ln_mod else None
        sh_ref = refs.pop(0) if ln_mod else None
        q_out, k_out, v_out = refs
        x = x_ref[0].astype(jnp.float32)  # (bm, K)
        if ln_mod:
            x = _ln_mod(x, sc_ref[0], sh_ref[0])
        sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) * (1.0 / 127.0)
        sx = jnp.maximum(sx, 1e-8)
        xq = jnp.clip(jnp.round(x * pl.reciprocal(sx, approx=False)), -127, 127).astype(jnp.int8)

        def proj(w_ref, s_ref, b_ref):
            acc = jax.lax.dot_general(
                xq, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * sx * s_ref[:] + b_ref[:]

        q = proj(wq_ref, sq_ref, bq_ref)  # (bm, N) f32
        k = proj(wk_ref, sk_ref, bk_ref)
        v = proj(wv_ref, sv_ref, bv_ref)

        cos = cos_ref[0]  # (bm, dim_head)
        sin = sin_ref[0]

        def rope(t):
            # reference quirk: only the FIRST dim_head channels (head 0
            # after the split) rotate — x_transformers interleaved pairs
            # applied pre-split (models/dit.py rope_rotate). The pairwise
            # rotate_half ([-x1, x0] interleave) is expressed as lane rolls
            # + a parity mask: Mosaic has no lowering for the (bm, dh/2, 2)
            # reshape or scatter writes.
            x_rot = t[:, :dim_head]
            left = pltpu.roll(x_rot, shift=dim_head - 1, axis=1)  # x[..., i+1] (circular)
            right = pltpu.roll(x_rot, shift=1, axis=1)  # x[..., i-1]
            lane = jax.lax.broadcasted_iota(jnp.int32, x_rot.shape, 1)
            rot = jnp.where(lane % 2 == 0, -left, right)
            return jnp.concatenate([x_rot * cos + rot * sin, t[:, dim_head:]], axis=-1)

        q = rope(q)
        k = rope(k)
        bm, n = q.shape
        h = n // dim_head

        # head-split via static minor-dim slices (Mosaic has no lowering
        # for the transpose+reshape shape cast); q_scale applies on the
        # per-head slice (small per-iteration temps — a full (bm, N)
        # scaled copy tips the 16M scoped-VMEM stack budget)
        for hh in range(h):
            sl = slice(hh * dim_head, (hh + 1) * dim_head)
            qs = q[:, sl]
            if q_scale != 1.0:
                qs = qs * q_scale
            q_out[0, hh] = qs.astype(q_out.dtype)
            k_out[0, hh] = k[:, sl].astype(k_out.dtype)
            v_out[0, hh] = v[:, sl].astype(v_out.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("dim_head", "block_m", "q_scale"))
def qkv_rope_int8(x, wq, wk, wv, sq, sk, sv, bq, bk, bv, ln_mod=None, *, dim_head: int, block_m: int = 512, q_scale: float = 1.0):
    """Fused q/k/v int8 projections + rope + flash-ready head layout.

    x: (B, T, K); w*: (K, N) int8; s*: (1, N) f32; b*: (N,) f32.
    Returns (q, k, v) each (B, H, T, dim_head) in x.dtype — the layout the
    Pallas flash kernel wants, so the (B,T,H*dh)->(B,H,T,dh) transposes
    (measured ~20 ms of a 232 ms CFM call) never hit HBM. The activation
    block is quantized ONCE for all three projections, and the reference's
    head-0 rope (models/dit.py rope_rotate) applies in-register."""
    b, t, k = x.shape
    n = wq.shape[1]
    h = n // dim_head
    bm = min(block_m, max(16, t))
    pad_t = -t % bm
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    tp = t + pad_t

    # interleaved-pair rope tables for the padded length
    inv = 1.0 / (10000.0 ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head))
    pos = np.arange(tp)
    freqs = np.repeat(np.einsum("t,f->tf", pos, inv), 2, axis=-1)
    cos = jnp.asarray(np.cos(freqs), jnp.float32)
    sin = jnp.asarray(np.sin(freqs), jnp.float32)

    in_specs = [
            pl.BlockSpec((1, bm, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((k, n), lambda i, j: (0, 0)),
            pl.BlockSpec((k, n), lambda i, j: (0, 0)),
            pl.BlockSpec((k, n), lambda i, j: (0, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
            pl.BlockSpec((1, n), lambda i, j: (0, 0)),
            pl.BlockSpec((1, bm, dim_head), lambda i, j: (0, j, 0)),
            pl.BlockSpec((1, bm, dim_head), lambda i, j: (0, j, 0)),
    ]
    extra = []
    if ln_mod is not None:
        sc, sh = ln_mod
        in_specs += [
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0)),
        ]
        extra = [sc.reshape(b, 1, k).astype(jnp.float32), sh.reshape(b, 1, k).astype(jnp.float32)]
    outs = pl.pallas_call(
        _qkv_rope_kernel(dim_head, ln_mod is not None, float(q_scale)),
        grid=(b, tp // bm),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, h, bm, dim_head), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, h, bm, dim_head), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, h, bm, dim_head), lambda i, j: (i, 0, j, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, tp, dim_head), x.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
    )(
        x, wq, wk, wv,
        sq.reshape(1, n).astype(jnp.float32), sk.reshape(1, n).astype(jnp.float32),
        sv.reshape(1, n).astype(jnp.float32),
        bq.reshape(1, n).astype(jnp.float32), bk.reshape(1, n).astype(jnp.float32),
        bv.reshape(1, n).astype(jnp.float32),
        cos[None], sin[None],
        *extra,
    )
    q, k_, v = outs
    if pad_t:
        q, k_, v = q[:, :, :t], k_[:, :, :t], v[:, :, :t]
    return q, k_, v


def _make_heads_in_kernel(res_gate_mask: bool):
    """(1, H, bm, dh) head-split input -> quantize -> s8 dot.

    The head merge rides the contraction instead of a shape cast (which
    Mosaic can't lower): w arrives reshaped (H, dh, N) and the dot batches
    over H, summing partial products — y = sum_h x[h] @ w[h]. With
    res_gate_mask, the attention-output glue (pad-mask zeroing + gated
    residual x + gate*attn) fuses in as an epilogue (round 5)."""

    def kernel(*refs):
        refs = list(refs)
        x_ref, w_ref, sw_ref, b_ref = refs[:4]
        refs = refs[4:]
        res_ref = refs.pop(0) if res_gate_mask else None
        gate_ref = refs.pop(0) if res_gate_mask else None
        msk_ref = refs.pop(0) if res_gate_mask else None
        o_ref = refs.pop(0)
        xh = x_ref[0].astype(jnp.float32)  # (H, bm, dh)
        # activation scale per ROW of the merged (bm, H*dh) matrix = max
        # over heads of the per-head row max
        sx = jnp.max(jnp.abs(xh), axis=(0, 2), keepdims=True) * (1.0 / 127.0)  # (1, bm, 1)
        sx = jnp.maximum(sx, 1e-8)
        xq = jnp.clip(jnp.round(xh * pl.reciprocal(sx, approx=False)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w_ref[:],
            (((2,), (1,)), ((0,), (0,))),  # contract dh, batch H -> (H, bm, N)
            preferred_element_type=jnp.int32,
        )
        acc = jnp.sum(acc, axis=0)  # (bm, N)
        y = acc.astype(jnp.float32) * sx[0] * sw_ref[:] + b_ref[:]
        if res_gate_mask:
            y = jnp.where(msk_ref[0, 0][:, None] > 0, y, 0.0)
            y = res_ref[0].astype(jnp.float32) + gate_ref[0] * y
        o_ref[0] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_m",))
def qdense_out_int8(attn, wq, sw, bias, res_gate_mask=None, *, block_m: int = 512):
    """Attention-output projection taking the flash layout directly.

    attn: (B, H, T, dh) -> returns (B, T, N). The head-merge transpose
    happens in VMEM inside the kernel instead of as an HBM copy.
    res_gate_mask=(res (B,T,N), gate (B,N), mask (B,T)|None): fused
    epilogue y = res + gate * (mask ? proj : 0)."""
    b, h, t, dh = attn.shape
    k = h * dh
    n = wq.shape[1]
    bm = min(block_m, max(16, t))
    pad_t = -t % bm
    if pad_t:
        attn = jnp.pad(attn, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        if res_gate_mask is not None:
            res, gate, msk = res_gate_mask
            res = jnp.pad(res, ((0, 0), (0, pad_t), (0, 0)))
            msk = None if msk is None else jnp.pad(msk, ((0, 0), (0, pad_t)))
            res_gate_mask = (res, gate, msk)
    tp = t + pad_t
    in_specs = [
        pl.BlockSpec((1, h, bm, dh), lambda i, j: (i, 0, j, 0)),
        pl.BlockSpec((h, dh, n), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((1, n), lambda i, j: (0, 0)),
        pl.BlockSpec((1, n), lambda i, j: (0, 0)),
    ]
    args = [attn, wq.reshape(h, dh, n), sw.reshape(1, n).astype(jnp.float32), bias.reshape(1, n).astype(jnp.float32)]
    if res_gate_mask is not None:
        res, gate, msk = res_gate_mask
        if msk is None:
            msk = jnp.ones((b, tp), jnp.float32)
        in_specs += [
            pl.BlockSpec((1, bm, n), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0)),
            # (B, 1, T) with a unit row dim: TPU block shapes need the
            # second-minor dim divisible by 8 or equal to the array dim
            pl.BlockSpec((1, 1, bm), lambda i, j: (i, 0, j)),
        ]
        args += [res, gate.reshape(b, 1, n).astype(jnp.float32), msk.reshape(b, 1, tp).astype(jnp.float32)]
    out = pl.pallas_call(
        _make_heads_in_kernel(res_gate_mask is not None),
        grid=(b, tp // bm),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bm, n), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tp, n), attn.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
    )(*args)
    if pad_t:
        out = out[:, :t]
    return out
