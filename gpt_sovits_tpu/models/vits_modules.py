"""VITS building blocks, TPU-native.

Re-designs of the reference modules (GPT_SoVITS/module/modules.py,
attentions.py, mrte_model.py, core_vq.py) in JAX/flax with a feature-last
(B, T, C) layout so the channel axis lands on the TPU's 128-wide lane
dimension and convs/matmuls tile onto the MXU.

Covered blocks and their reference counterparts:
  * LayerNorm over channels          — modules.py:20  (LayerNorm)
  * WN gated dilated conv stack      — modules.py:132 (WN)
  * ResBlock1                        — modules.py:218
  * ResidualCouplingLayer/Block      — modules.py:399, models.py:253
  * Relative-position Encoder        — attentions.py:10 (window_size=4)
  * Cross-attention MHA              — attentions.py:169 (no window)
  * FFN (conv k, relu)               — attentions.py:337
  * MRTE                             — mrte_model.py:9
  * MelStyleEncoder (+ Mish, GLU)    — modules.py:672, :531, :539
  * Euclidean VQ codebook (EMA)      — core_vq.py:97, quantize.py:27

Masks are (B, T, 1) float (1=valid). All convs are 'SAME'-padded to match
the reference's explicit symmetric padding.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) -> (B, T, 1) float mask. Ref commons.sequence_mask."""
    return (jnp.arange(max_len)[None, :] < lengths[:, None]).astype(jnp.float32)[..., None]


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis; ref modules.py:20."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5)(x)


def _leaky_relu(x):
    return nn.leaky_relu(x, LRELU_SLOPE)


class Conv1d(nn.Module):
    """1D conv on (B, T, C) with torch-style symmetric padding."""

    features: int
    kernel: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) * self.dilation // 2
        return nn.Conv(
            self.features,
            (self.kernel,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            use_bias=self.use_bias,
        )(x)


class ConvTranspose1d(nn.Module):
    """Transposed conv matching torch ConvTranspose1d(k, s, padding=p):
    out_len = (T-1)*s - 2p + k. Implemented as input-dilated conv."""

    features: int
    kernel: int
    stride: int
    pad: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.normal(0.01),  # ref init_weights: N(0, 0.01)
            (self.kernel, x.shape[-1], self.features),
        )
        # torch convtranspose == conv(input dilated by s, flipped kernel,
        # padding k-1-p). Flip along the spatial axis.
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(w, 0).astype(x.dtype),
            window_strides=(1,),
            padding=[(self.kernel - 1 - self.pad, self.kernel - 1 - self.pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


# ---------------------------------------------------------------------------
# WaveNet-style gated stack (ref modules.py:132)
# ---------------------------------------------------------------------------


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None):
        """x: (B,T,H); g: (B,1,gin) or None."""
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = Conv1d(2 * h * self.n_layers, 1, name="cond_layer")(g)  # (B,1,2H*L)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = Conv1d(2 * h, self.kernel_size, dilation=dilation, name=f"in_{i}")(x)
            if g is not None:
                g_l = g_all[..., i * 2 * h : (i + 1) * 2 * h]
                x_in = x_in + g_l
            # fused_add_tanh_sigmoid_multiply (ref commons.py)
            acts = jnp.tanh(x_in[..., :h]) * jax.nn.sigmoid(x_in[..., h:])
            res_skip = Conv1d(2 * h if i < self.n_layers - 1 else h, 1, name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask


# ---------------------------------------------------------------------------
# HiFiGAN ResBlock1 (ref modules.py:218)
# ---------------------------------------------------------------------------


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x, x_mask=None):
        for j, d in enumerate(self.dilations):
            xt = _leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, name=f"c1_{j}")(xt)
            xt = _leaky_relu(xt)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=1, name=f"c2_{j}")(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


# ---------------------------------------------------------------------------
# Coupling flow (ref modules.py:399, models.py:253)
# ---------------------------------------------------------------------------


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate, self.n_layers,
               gin_channels=self.gin_channels, name="enc")(h, x_mask, g=g)
        # mean_only=True; post conv zero-initialized (ref :430-431)
        m = nn.Conv(half, (1,), kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros, name="post")(h)
        m = m * x_mask
        if not reverse:
            x1 = (m + x1) * x_mask  # logs == 0
            return jnp.concatenate([x0, x1], axis=-1), jnp.zeros(x.shape[0])
        else:
            x1 = (x1 - m) * x_mask
            return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.channels // 2
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size, self.dilation_rate,
                self.n_layers, gin_channels=self.gin_channels, name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]

        def flip(z):  # modules.Flip — reverse channel order
            return jnp.flip(z, axis=-1)

        if not reverse:
            for layer in layers:
                x, _ = layer(x, x_mask, g=g, reverse=False)
                x = flip(x)
        else:
            for layer in reversed(layers):
                x = flip(x)
                x = layer(x, x_mask, g=g, reverse=True)
        return x


# ---------------------------------------------------------------------------
# Relative-position transformer encoder (ref attentions.py:10/:169)
# ---------------------------------------------------------------------------


def _rel_to_abs(x):
    """(B,H,T,2T-1) relative-indexed -> (B,H,T,T) absolute-indexed.

    Pure pad+reshape skew (ref attentions.py:299-310) — no gathers, so XLA
    compiles it quickly and fuses it."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t + 1, 2 * t - 1)
    return x[:, :, :t, t - 1 :]


def _abs_to_rel(x):
    """(B,H,T,T) -> (B,H,T,2T-1) (ref attentions.py:312-324)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t * t + t * (t - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))
    x = x.reshape(b, h, t, 2 * t)
    return x[:, :, :, 1:]


def _expand_rel_emb(rel_emb, t, window_size):
    """(1, 2w+1, dk) -> (1, 2t-1, dk) zero-padded/sliced
    (ref _get_relative_embeddings, attentions.py:278-295)."""
    w = window_size
    pad_len = max(t - (w + 1), 0)
    start = max((w + 1) - t, 0)
    padded = jnp.pad(rel_emb, ((0, 0), (pad_len, pad_len), (0, 0)))
    return padded[:, start : start + 2 * t - 1]


class RelPosMultiHeadAttention(nn.Module):
    channels: int
    n_heads: int
    window_size: int = 4

    @nn.compact
    def __call__(self, x, attn_mask):
        """Self-attention with learned relative-position bias.

        x: (B,T,C); attn_mask: (B,T,T) float (1=attend)."""
        b, t, c = x.shape
        h = self.n_heads
        dk = c // h
        q = nn.Dense(c, name="conv_q")(x).reshape(b, t, h, dk)
        k = nn.Dense(c, name="conv_k")(x).reshape(b, t, h, dk)
        v = nn.Dense(c, name="conv_v")(x).reshape(b, t, h, dk)
        scale = 1.0 / np.sqrt(dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32)

        w = self.window_size
        rel_k = self.param("emb_rel_k", nn.initializers.normal(dk**-0.5), (1, 2 * w + 1, dk))
        rel_v = self.param("emb_rel_v", nn.initializers.normal(dk**-0.5), (1, 2 * w + 1, dk))
        rel_k_full = _expand_rel_emb(rel_k, t, w)  # (1, 2T-1, dk)
        rel_logits = jnp.einsum("bqhd,grd->bhqr", (q * scale).astype(jnp.float32), rel_k_full.astype(jnp.float32))
        scores = scores + _rel_to_abs(rel_logits)

        scores = jnp.where(attn_mask[:, None] > 0, scores, -1e4)  # ref uses -1e4
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        p_rel = _abs_to_rel(probs)  # (B,H,T,2T-1)
        rel_v_full = _expand_rel_emb(rel_v, t, w)
        out = out + jnp.einsum("bhqr,grd->bqhd", p_rel.astype(x.dtype), rel_v_full.astype(x.dtype))
        out = out.reshape(b, t, c)
        return nn.Dense(c, name="conv_o")(out)


class CrossMultiHeadAttention(nn.Module):
    """attentions.MultiHeadAttention without relative positions (cross-attn)."""

    channels: int
    out_channels: int
    n_heads: int

    @nn.compact
    def __call__(self, x, c, attn_mask=None):
        b, tq, ch = x.shape
        tk = c.shape[1]
        h = self.n_heads
        dk = ch // h
        q = nn.Dense(ch, name="conv_q")(x).reshape(b, tq, h, dk)
        k = nn.Dense(ch, name="conv_k")(c).reshape(b, tk, h, dk)
        v = nn.Dense(ch, name="conv_v")(c).reshape(b, tk, h, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q / np.sqrt(dk), k, preferred_element_type=jnp.float32)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None] > 0, scores, -1e4)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, tq, ch)
        return nn.Dense(self.out_channels, name="conv_o")(out)


class FFN(nn.Module):
    out_channels: int
    filter_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, x_mask):
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv1")(x * x_mask)
        x = nn.relu(x)
        x = Conv1d(self.out_channels, self.kernel_size, name="conv2")(x * x_mask)
        return x * x_mask


class RelPosEncoder(nn.Module):
    """attentions.Encoder: rel-pos self-attn + conv FFN, post-LN."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    window_size: int = 4

    @nn.compact
    def __call__(self, x, x_mask):
        # attn_mask: (B,T,T)
        attn_mask = x_mask[:, :, 0][:, None, :] * x_mask[:, :, 0][:, :, None]
        x = x * x_mask
        for i in range(self.n_layers):
            y = RelPosMultiHeadAttention(
                self.hidden_channels, self.n_heads, self.window_size, name=f"attn_{i}"
            )(x, attn_mask)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x + y)
            y = FFN(self.hidden_channels, self.filter_channels, self.kernel_size, name=f"ffn_{i}")(x, x_mask)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(x + y)
        return x * x_mask


# ---------------------------------------------------------------------------
# MRTE (ref mrte_model.py:9)
# ---------------------------------------------------------------------------


class MRTE(nn.Module):
    content_enc_channels: int = 192
    hidden_size: int = 512
    out_channels: int = 192
    n_heads: int = 4

    @nn.compact
    def __call__(self, ssl_enc, ssl_mask, text, text_mask, ge):
        """ssl_enc: (B,Ts,C); text: (B,Tt,C); ge: (B,1,hidden) or None."""
        attn_mask = text_mask[:, :, 0][:, None, :] * ssl_mask[:, :, 0][:, :, None]  # (B,Ts,Tt)
        ssl_h = Conv1d(self.hidden_size, 1, name="c_pre")(ssl_enc * ssl_mask)
        text_h = Conv1d(self.hidden_size, 1, name="text_pre")(text * text_mask)
        if ge is None:
            ge = 0.0
        x = (
            CrossMultiHeadAttention(self.hidden_size, self.hidden_size, self.n_heads, name="cross_attention")(
                ssl_h * ssl_mask, text_h * text_mask, attn_mask
            )
            + ssl_h
            + ge
        )
        return Conv1d(self.out_channels, 1, name="c_post")(x * ssl_mask)


# ---------------------------------------------------------------------------
# MelStyleEncoder (ref modules.py:672)
# ---------------------------------------------------------------------------


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class Conv1dGLU(nn.Module):
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        residual = x
        h = Conv1d(2 * self.out_channels, self.kernel_size, name="conv1")(x)
        x1, x2 = h[..., : self.out_channels], h[..., self.out_channels :]
        return residual + x1 * jax.nn.sigmoid(x2)


class StyleMHA(nn.Module):
    """modules.MultiHeadAttention — NOTE the reference scales scores by
    sqrt(d_model), not sqrt(d_k) (modules.py:611), and adds a residual."""

    n_head: int
    d_model: int

    @nn.compact
    def __call__(self, x, pad_mask=None):
        b, t, _ = x.shape
        dk = self.d_model // self.n_head
        residual = x
        q = nn.Dense(self.n_head * dk, name="w_qs")(x).reshape(b, t, self.n_head, dk)
        k = nn.Dense(self.n_head * dk, name="w_ks")(x).reshape(b, t, self.n_head, dk)
        v = nn.Dense(self.n_head * dk, name="w_vs")(x).reshape(b, t, self.n_head, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(self.d_model)
        if pad_mask is not None:  # pad_mask: (B,T) True where PAD
            scores = jnp.where(pad_mask[:, None, None, :], -jnp.inf, scores)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, -1)
        return nn.Dense(self.d_model, name="fc")(out) + residual


class MelStyleEncoder(nn.Module):
    """Reference-spectrogram -> style vector ge (B, 1, out_dim)."""

    in_dim: int
    hidden_dim: int = 128
    out_dim: int = 512
    kernel_size: int = 5
    n_head: int = 2

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (B,T,in_dim) spectrogram frames; mask: (B,T,1) 1=valid."""
        pad = None if mask is None else (mask[:, :, 0] == 0)
        x = nn.Dense(self.hidden_dim, name="spectral1")(x)
        x = mish(x)
        x = nn.Dense(self.hidden_dim, name="spectral2")(x)
        x = mish(x)
        x = Conv1dGLU(self.hidden_dim, self.kernel_size, name="temporal1")(x)
        x = Conv1dGLU(self.hidden_dim, self.kernel_size, name="temporal2")(x)
        if pad is not None:
            x = jnp.where(pad[..., None], 0.0, x)
        x = StyleMHA(self.n_head, self.hidden_dim, name="slf_attn")(x, pad)
        x = nn.Dense(self.out_dim, name="fc")(x)
        if pad is None:
            w = jnp.mean(x, axis=1, keepdims=True)
        else:
            valid = (~pad).astype(jnp.float32)[..., None]
            w = (x * valid).sum(axis=1, keepdims=True) / jnp.maximum(valid.sum(axis=1, keepdims=True), 1.0)
        return w  # (B,1,out_dim)


# ---------------------------------------------------------------------------
# Euclidean VQ (ref core_vq.py:97, quantize.py:27; n_q=1, bins=1024)
# ---------------------------------------------------------------------------


class VQCodebook(nn.Module):
    """EMA-kmeans Euclidean codebook. The codebook lives in the 'params'
    collection (frozen during S2 fine-tune, matching freeze_quantizer=True);
    EMA updates for from-scratch training are computed functionally by
    `vq_ema_update` in train/s2_train.py."""

    codebook_size: int = 1024
    dim: int = 768

    def setup(self):
        self.embed = self.param("embed", nn.initializers.uniform(1.0), (self.codebook_size, self.dim))

    def __call__(self, x):
        """x: (B,T,D) -> (quantized (B,T,D), codes (B,T) int32)."""
        codes = self.encode_with(x, self.embed)
        quantized = self.embed[codes]
        return quantized, codes

    @staticmethod
    def encode_with(x, embed):
        # nearest neighbor by (negated) euclidean distance; MXU-friendly
        dist = (
            (x * x).sum(-1, keepdims=True)
            - 2.0 * jnp.einsum("btd,kd->btk", x, embed, preferred_element_type=jnp.float32)
            + (embed * embed).sum(-1)[None, None, :]
        )
        return jnp.argmin(dist, axis=-1).astype(jnp.int32)

    def decode(self, codes):
        return self.embed[codes]
