"""DiT flow-matching estimator for the v3/v4 mel path, TPU-native.

Re-design of the reference DiT (GPT_SoVITS/f5_tts/model/backbones/dit.py:88,
f5_tts/model/modules.py): 22-layer AdaLN-Zero DiT, dim 1024, 16 heads,
head_dim 64, ff_mult 2, rotary embeddings (x_transformers interleaved-pair
convention), ConvNeXtV2 text conditioning blocks, separate time + dt
(bootstrap step size) embeddings.

All tensors feature-last (B, T, C).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DiTConfig:
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 100
    text_dim: int = 512
    conv_layers: int = 4
    freq_embed_dim: int = 256
    max_pos: int = 4096
    # "int8": serve the six big per-block matmuls (qkv/out/ff) with
    # weight+activation int8 on the int8 MXU (2x the bf16 rate on v5e).
    # Param trees must be transformed with quantize_dit_params first;
    # training/init always use "bf16" (the float path).
    quant: str = "bf16"


class QDense(nn.Module):
    """nn.Dense drop-in with an optional int8 serving path.

    Float path is exactly nn.Dense (same param tree, same init). When
    `quant` is on AND the kernel arrived int8 (via quantize_dit_params),
    computes y = (x_q @ w_q) · s_x·s_w + b with per-token dynamic
    activation scales and per-output-channel weight scales — both matmul
    operands int8, so the MXU runs at its doubled int8 rate. Activation
    rounding is the only approximation (weights round once offline).

    setup-style (in_features explicit) so the fused qkv+rope Pallas path
    can read kernel/bias/kernel_scale off the bound submodule without
    running this __call__."""

    features: int
    in_features: int
    quant: bool = False

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.quant:
            # exists only in quantized trees (quantize_dit_params adds it);
            # init/training always run quant=False so it is never created
            self.kernel_scale = self.param("kernel_scale", nn.initializers.ones, (1, self.features))

    def __call__(self, x):
        kernel = self.kernel
        bias = self.bias
        if self.quant and kernel.dtype == jnp.int8:
            sw = self.kernel_scale
            if jax.default_backend() == "tpu" and not os.environ.get("GPT_SOVITS_NO_QMM"):
                # fused Pallas kernel: quantize + s8 dot + rescale in one
                # VMEM pass (the XLA formulation below leaves the row-max
                # reduce + convert as separate HBM round trips — measured
                # 49 ms of a 254 ms CFM call, scripts/profile_cfm.py)
                from gpt_sovits_tpu.ops.pallas.qmatmul import qdense_int8

                return qdense_int8(x, kernel, sw, bias)
            sx = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
            sx = jnp.maximum(sx, 1e-8)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, kernel, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = y.astype(jnp.float32) * sx * sw.astype(jnp.float32)
            return (y + bias.astype(jnp.float32)).astype(x.dtype)
        return jnp.dot(x, kernel) + bias


_QUANT_DENSE_NAMES = ("to_q", "to_k", "to_v", "to_out", "ff1", "ff2")


def quantize_dit_params(params: dict) -> dict:
    """Per-output-channel symmetric int8 for the big DiT matmul kernels.

    Leaves every other param untouched; adds a `kernel_scale` sibling so
    DiT(cfg with quant="int8").apply runs the int8 MXU path."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if len(path) >= 2 and path[-1] == "kernel" and path[-2] in _QUANT_DENSE_NAMES:
            w = jnp.asarray(leaf, jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0, 1e-12)
            out[path] = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
            out[path[:-1] + ("kernel_scale",)] = s
        else:
            out[path] = leaf
    return unflatten_dict(out)


def sinus_position_embedding(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """(B,) -> (B, dim). Ref modules.py:149 (log-spaced, sin||cos)."""
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    arg = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


def precompute_freqs_cis(dim: int, end: int, theta: float = 10000.0) -> np.ndarray:
    """(end, dim) = [cos || sin] table. Ref modules.py:196."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    t = np.arange(end)
    f = np.outer(t, freqs)
    return np.concatenate([np.cos(f), np.sin(f)], axis=-1).astype(np.float32)


def rope_rotate(x: jnp.ndarray, t_len: int, dim_head: int) -> jnp.ndarray:
    """Rotary embedding exactly as the reference applies it.

    QUIRK (faithfully reproduced): the reference calls x_transformers'
    apply_rotary_pos_emb on the (B, T, H*Dh) projection BEFORE splitting
    heads (f5_tts/model/modules.py:419-424), and the freqs table is only
    dim_head wide — so only the FIRST dim_head channels (head 0 after the
    split) are rotated; the rest pass through unchanged. Pairs are
    interleaved ([f0,f0,f1,f1,...]) with rotate_half swapping adjacent
    pairs (x_transformers convention)."""
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim_head, 2).astype(np.float64) / dim_head))
    t = np.arange(t_len)
    freqs = np.einsum("t,f->tf", t, inv_freq)  # (T, Dh/2)
    freqs = np.repeat(freqs, 2, axis=-1)  # (T, Dh) interleaved
    cos = jnp.asarray(np.cos(freqs), dtype=x.dtype)
    sin = jnp.asarray(np.sin(freqs), dtype=x.dtype)
    b, tl, d = x.shape
    x_rot = x[..., :dim_head]
    x_pass = x[..., dim_head:]
    pairs = x_rot.reshape(b, tl, dim_head // 2, 2)
    rot = jnp.stack([-pairs[..., 1], pairs[..., 0]], axis=-1).reshape(b, tl, dim_head)
    out = x_rot * cos[None] + rot * sin[None]
    return jnp.concatenate([out, x_pass], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    freq_embed_dim: int = 256

    @nn.compact
    def __call__(self, t):
        h = sinus_position_embedding(t, self.freq_embed_dim)
        h = nn.Dense(self.dim, name="mlp1")(h)
        h = nn.silu(h)
        return nn.Dense(self.dim, name="mlp2")(h)


class GRN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, mask=None):
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.dim))
        sq = x * x
        if mask is not None:  # L2 over REAL time frames only (pad-exact)
            sq = jnp.where(mask[..., None], sq, 0.0)
        gx = jnp.sqrt(jnp.sum(sq, axis=1, keepdims=True))  # L2 over time
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class DepthwiseConv1d(nn.Module):
    """Depthwise 1D conv as k shifted multiply-adds (pure VPU work; XLA's
    depthwise-conv lowering is slow on TPU). Param tree matches
    nn.Conv(feature_group_count=dim): kernel (k, 1, dim), bias (dim,)."""

    dim: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        b, t, d = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (k, 1, d))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        xp = jnp.pad(x, ((0, 0), (k // 2, k - 1 - k // 2), (0, 0)))
        w = kernel[:, 0].astype(x.dtype)  # (k, d)
        y = None
        for m in range(k):
            ym = jax.lax.dynamic_slice_in_dim(xp, m, t, axis=1) * w[m]
            y = ym if y is None else y + ym
        return y + bias.astype(x.dtype)


class ConvNeXtV2Block(nn.Module):
    dim: int
    intermediate_dim: int

    @nn.compact
    def __call__(self, x, mask=None):
        # mask: (B, T) bool — pad frames re-zeroed after the block so the
        # depthwise conv's window at real-edge positions sees exactly the
        # zeros 'same' padding would supply, and GRN's time-axis norms are
        # untouched by pads; makes time padding numerically exact
        residual = x
        x = DepthwiseConv1d(self.dim, 7, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(self.intermediate_dim, name="grn")(x, mask=mask)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        x = residual + x
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        return x


class TextEmbedding(nn.Module):
    text_dim: int
    conv_layers: int = 4
    max_pos: int = 4096

    @nn.compact
    def __call__(self, text, drop_text: bool = False, mask=None):
        """text: (B, T, text_dim) conditioning features."""
        if drop_text:
            text = jnp.zeros_like(text)
        t = text.shape[1]
        pos = jnp.asarray(precompute_freqs_cis(self.text_dim, self.max_pos))[
            jnp.minimum(jnp.arange(t), self.max_pos - 1)
        ]
        text = text + pos[None]
        if mask is not None:  # keep pad frames zero (position emb is nonzero)
            text = jnp.where(mask[..., None], text, 0.0)
        for i in range(self.conv_layers):
            text = ConvNeXtV2Block(self.text_dim, self.text_dim * 2, name=f"block_{i}")(text, mask=mask)
        return text


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class GroupedConv1d(nn.Module):
    """Grouped 1D conv lowered as a per-tap batched matmul.

    XLA's grouped-conv lowering is pathologically slow on TPU (measured
    ~3 ms for k=31/g=16/d=1024/T=934 vs ~0.1 ms for this formulation —
    it dominated the whole DiT step). Groups ride a dot_general batch dim:
    y[b,g,t,co] = sum_m sum_ci w[m,ci,g,co] x[b,g,t+m-pad,ci]. Param tree
    (kernel (k, cin/g, cout), bias) is identical to nn.Conv's, so torch
    import and existing checkpoints are unaffected."""

    features: int
    kernel_size: int
    groups: int

    @nn.compact
    def __call__(self, x):
        k, g = self.kernel_size, self.groups
        b, t, d = x.shape
        cg, co_g = d // g, self.features // g
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (k, cg, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xg = x.reshape(b, t, g, cg).transpose(0, 2, 1, 3)  # (B, G, T, cg)
        xp = jnp.pad(xg, ((0, 0), (0, 0), (k // 2, k - 1 - k // 2), (0, 0)))
        wg = kernel.reshape(k, cg, g, co_g).astype(x.dtype)
        y = None
        for m in range(k):
            seg = jax.lax.dynamic_slice_in_dim(xp, m, t, axis=2)
            ym = jnp.einsum("bgtc,cgd->bgtd", seg, wg[m])
            y = ym if y is None else y + ym
        y = y.transpose(0, 2, 1, 3).reshape(b, t, self.features)
        return y + bias.astype(x.dtype)


class ConvPositionEmbedding(nn.Module):
    dim: int
    kernel_size: int = 31
    groups: int = 16

    @nn.compact
    def __call__(self, x, mask=None):
        k = self.kernel_size
        x = GroupedConv1d(self.dim, k, self.groups, name="conv1")(x)
        x = _mish(x)
        if mask is not None:  # conv2 must see 'same'-pad zeros at pads
            x = jnp.where(mask[..., None], x, 0.0)
        x = GroupedConv1d(self.dim, k, self.groups, name="conv2")(x)
        return _mish(x)


class InputEmbedding(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x, cond, text_embed, drop_audio_cond: bool = False, mask=None):
        if drop_audio_cond:
            cond = jnp.zeros_like(cond)
        h = nn.Dense(self.out_dim, name="proj")(jnp.concatenate([x, cond, text_embed], axis=-1))
        if mask is not None:  # zero pads so the grouped convs see 'same'-pad zeros
            h = jnp.where(mask[..., None], h, 0.0)
        out = ConvPositionEmbedding(self.out_dim, name="conv_pos_embed")(h, mask=mask) + h
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
        return out


class DiTBlock(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t_emb, mask):
        c = self.cfg
        inner = c.heads * c.dim_head
        mod = nn.Dense(6 * c.dim, name="ada_linear")(nn.silu(t_emb))  # (B, 6D)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

        b, tl, _ = x.shape
        q8 = c.quant == "int8"
        use_flash = (
            # TPU only: the imported kernel is pallas.ops.tpu — on GPU it
            # fails at lowering rather than falling back to the einsum path
            jax.default_backend() == "tpu"
            and tl % 512 == 0
            and not os.environ.get("GPT_SOVITS_NO_FLASH")
        )
        to_q = QDense(inner, c.dim, quant=q8, name="to_q")
        to_k = QDense(inner, c.dim, quant=q8, name="to_k")
        to_v = QDense(inner, c.dim, quant=q8, name="to_v")
        to_out = QDense(c.dim, inner, quant=q8, name="to_out")
        fused_qkv = (
            q8
            and use_flash
            and not os.environ.get("GPT_SOVITS_NO_QMM")
            and to_q.kernel.dtype == jnp.int8
        )
        use_qflash = (
            # one-shot-softmax attention with int8 P@V (qflash.py): the
            # generic bf16 flash kernel ran at ~29% MXU peak at
            # dim_head=64 and was 44% of the CFM chunk
            # (scripts/profile_cfm.py r5); qflash also emits the
            # heads-MERGED (B,T,D) layout so the out-projection runs as
            # a standard full-rate W8A8 qdense
            fused_qkv
            and tl <= 2048
            and not os.environ.get("GPT_SOVITS_NO_QFLASH")
        )
        if fused_qkv:
            # one Pallas pass: attn_norm LayerNorm + AdaLN modulation
            # prologue (round 5 — previously separate XLA passes), then
            # quantize-once 3x s8 projection + head-0 rope + flash
            # (B,H,T,dh) layout — the separate rope pass and the q/k/v
            # HBM transposes disappear (ops/pallas/qmatmul.py)
            from gpt_sovits_tpu.ops.pallas.qmatmul import qkv_rope_int8

            qf, kf, vf = qkv_rope_int8(
                x, to_q.kernel, to_k.kernel, to_v.kernel,
                to_q.kernel_scale, to_k.kernel_scale, to_v.kernel_scale,
                to_q.bias, to_k.bias, to_v.bias,
                ln_mod=(scale_msa, shift_msa), dim_head=c.dim_head,
            )
            qh = kh = vh = None
        else:
            # cast the norm back to the working dtype: flax LayerNorm
            # promotes to f32, which otherwise silently runs every
            # downstream matmul, flash call, and transpose copy in f32
            # (measured: the whole DiT mid-section was f32 under bf16
            # serving — half the MXU rate)
            norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="attn_norm")(x)
            norm = norm.astype(x.dtype) * (1 + scale_msa[:, None]) + shift_msa[:, None]
            q = to_q(norm)
            k = to_k(norm)
            v = to_v(norm)
            q = rope_rotate(q, tl, c.dim_head)
            k = rope_rotate(k, tl, c.dim_head)
            qh = q.reshape(b, tl, c.heads, c.dim_head)
            kh = k.reshape(b, tl, c.heads, c.dim_head)
            vh = v.reshape(b, tl, c.heads, c.dim_head)
        if use_flash:
            # Pallas flash attention: the einsum path materializes the
            # (B, H, T, T) score/prob tensors in HBM — at T~1k that HBM
            # round-trip, x22 layers x32 Euler steps, dominates the CFM's
            # runtime. The flash kernel keeps the softmax streaming in
            # VMEM; padding frames are fenced with segment ids.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention,
            )

            seg = None
            if mask is not None:
                ids = mask.astype(jnp.int32)  # real=1, pad=0: pads only see pads
                seg = SegmentIds(q=ids, kv=ids)
            # block size trades VMEM for grid-step count: the grid is
            # (B, H, T/block) sequential steps on the single TensorCore, so
            # per-step overhead scales with B·H·T/block (measured: b6 CFM
            # ran slower per row than b1 at block 512)
            blk = min(int(os.environ.get("GPT_SOVITS_FLASH_BLOCK", "1024")), tl)
            blk_b = min(int(os.environ.get("GPT_SOVITS_FLASH_BLOCK_B", "1")), b)
            bs = BlockSizes(block_q=blk, block_k_major=blk, block_k=blk, block_b=blk_b)
            if fused_qkv:
                q_in, k_in, v_in = qf, kf, vf
            else:
                q_in = qh.transpose(0, 2, 1, 3)
                k_in = kh.transpose(0, 2, 1, 3)
                v_in = vh.transpose(0, 2, 1, 3)
            if use_qflash:
                from gpt_sovits_tpu.ops.pallas.qflash import flash_attn_int8
                from gpt_sovits_tpu.ops.pallas.qmatmul import qdense_int8

                attn_m = flash_attn_int8(
                    q_in, k_in, v_in, mask,
                    sm_scale=1.0 / float(np.sqrt(c.dim_head)),
                )  # (B, T, inner), heads merged
                x = qdense_int8(
                    attn_m, to_out.kernel, to_out.kernel_scale, to_out.bias,
                    res_gate=(x, gate_msa), mask=mask,
                )
            elif fused_qkv:
                from gpt_sovits_tpu.ops.pallas.qmatmul import qdense_out_int8

                attn_h = flash_attention(
                    q_in, k_in, v_in,
                    segment_ids=seg, sm_scale=1.0 / float(np.sqrt(c.dim_head)), block_sizes=bs,
                )
                # out-projection consumes the flash layout directly (the
                # head-merge transpose happens in VMEM inside the kernel)
                # and the pad-mask zeroing + gated residual x + gate*attn
                # fuse in as the epilogue (round 5)
                x = qdense_out_int8(
                    attn_h, to_out.kernel, to_out.kernel_scale, to_out.bias,
                    res_gate_mask=(x, gate_msa, None if mask is None else mask.astype(jnp.float32)),
                )
            else:
                attn_h = flash_attention(
                    q_in, k_in, v_in,
                    segment_ids=seg, sm_scale=1.0 / float(np.sqrt(c.dim_head)), block_sizes=bs,
                )
                attn = to_out(attn_h.transpose(0, 2, 1, 3).reshape(b, tl, inner))
                if mask is not None:
                    attn = jnp.where(mask[..., None], attn, 0.0)
                x = x + gate_msa[:, None] * attn
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32) / np.sqrt(c.dim_head)
            if mask is not None:
                scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            attn = to_out(jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, tl, inner))
            if mask is not None:
                attn = jnp.where(mask[..., None], attn, 0.0)
            x = x + gate_msa[:, None] * attn

        ff1 = QDense(c.dim * c.ff_mult, c.dim, quant=q8, name="ff1")
        ff2 = QDense(c.dim, c.dim * c.ff_mult, quant=q8, name="ff2")
        if fused_qkv:
            # ff_norm LayerNorm + AdaLN modulation ride ff1's prologue,
            # gelu its epilogue; the gated residual rides ff2's epilogue
            from gpt_sovits_tpu.ops.pallas.qmatmul import qdense_int8

            h1 = qdense_int8(
                x, ff1.kernel, ff1.kernel_scale, ff1.bias,
                ln_mod=(scale_mlp, shift_mlp), act="gelu",
            )
            return qdense_int8(
                h1, ff2.kernel, ff2.kernel_scale, ff2.bias,
                res_gate=(x, gate_mlp),
            )
        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="ff_norm")(x)
        norm2 = norm2.astype(x.dtype) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        ff = ff1(norm2)
        ff = nn.gelu(ff, approximate=True)
        ff = ff2(ff)
        return x + gate_mlp[:, None] * ff


class DiT(nn.Module):
    cfg: DiTConfig = DiTConfig()

    @nn.compact
    def __call__(
        self,
        x,  # (B, T, mel_dim) noised audio
        cond,  # (B, T, mel_dim) masked prompt audio
        t,  # (B,) flow time
        dt_base,  # (B,) bootstrap step size
        text,  # (B, T, text_dim) conditioning features
        mask=None,  # (B, T) bool
        *,
        drop_audio_cond: bool = False,
        drop_text: bool = False,
        text_embed_cache: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        # timestep embeddings always evaluate from f32 t: the log-spaced
        # sinusoid (scale 1000) loses all high-frequency phase accuracy in
        # bf16/fp16; the (B, dim) result is then cast to the compute dtype
        t_emb = TimestepEmbedding(c.dim, c.freq_embed_dim, name="time_embed")(t.astype(jnp.float32))
        dt_emb = TimestepEmbedding(c.dim, c.freq_embed_dim, name="d_embed")(dt_base.astype(jnp.float32))
        t_emb = (t_emb + dt_emb).astype(x.dtype)

        if text_embed_cache is not None:
            text_embed = text_embed_cache
        else:
            text_embed = TextEmbedding(c.text_dim, c.conv_layers, c.max_pos, name="text_embed")(
                text, drop_text=drop_text, mask=mask
            )
        # the ConvNeXt text stack's LayerNorms emit f32; cast before the
        # input concat or the ENTIRE residual stream (and with it every
        # block matmul + flash call) silently promotes to f32 under bf16
        # serving — the norm-output casts in DiTBlock are no-ops if x is
        # already f32 here
        text_embed = text_embed.astype(x.dtype)
        h = InputEmbedding(c.dim, name="input_embed")(
            x, cond, text_embed, drop_audio_cond=drop_audio_cond, mask=mask
        ).astype(x.dtype)
        for i in range(c.depth):
            h = DiTBlock(c, name=f"block_{i}")(h, t_emb, mask)
        mod = nn.Dense(2 * c.dim, name="norm_out_linear")(nn.silu(t_emb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm_out")(h)
        h = h.astype(x.dtype) * (1 + scale[:, None]) + shift[:, None]
        out = nn.Dense(c.mel_dim, name="proj_out")(h)
        return out, text_embed
