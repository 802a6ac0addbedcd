"""BigVGAN-v2 vocoder (v3 path: 100-band mel @ 24 kHz -> wav, ×256).

Re-design of GPT_SoVITS/BigVGAN (bigvgan.py:226, activations.py:9,
alias_free_activation/torch/{filter,resample,act}.py) in JAX/flax,
feature-last. The anti-aliased activation (upsample ×2 -> snake/snakeβ ->
downsample ×2) — the reference's one CUDA kernel — has a fused Pallas TPU
implementation in ops/pallas/snake_aa.py; this module uses the XLA
composition by default and can swap in the kernel.

Config (configs/bigvgan_v2_24khz_100band_256x.json): rates (4,4,2,2,2,2),
kernels (8,8,4,4,4,4), initial 1536 ch, snakebeta with log-scale alpha,
no bias and no tanh at the final conv.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.models.vits_modules import Conv1d, ConvTranspose1d


@dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 100
    upsample_rates: Sequence[int] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    snake_logscale: bool = True
    use_tanh_at_final: bool = False
    use_bias_at_final: bool = False


# ---------------------------------------------------------------------------
# kaiser-windowed sinc filter (ref alias_free_activation/torch/filter.py:33)
# ---------------------------------------------------------------------------


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * np.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    s = np.sinc(2 * cutoff * time)
    filt = 2 * cutoff * window * s
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _depthwise_conv(x, filt, stride=1, pad_left=0, pad_right=0, pad_mode="edge"):
    """(B,T,C) depthwise conv with a shared scalar filter per channel."""
    c = x.shape[-1]
    if pad_left or pad_right:
        x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode=pad_mode)
    w = jnp.broadcast_to(jnp.asarray(filt, dtype=x.dtype)[:, None, None], (len(filt), 1, c))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(0, 0)],
        feature_group_count=c, dimension_numbers=("NHC", "HIO", "NHC"),
    )


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """Anti-aliased ×ratio upsample (ref resample.py:10-30)."""
    ks = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    stride = ratio
    pad = ks // ratio - 1
    pad_left = pad * stride + (ks - stride) // 2
    pad_right = pad * stride + (ks - stride + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks)
    c = x.shape[-1]
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    w = jnp.broadcast_to(jnp.asarray(filt[::-1].copy(), dtype=x.dtype)[:, None, None], (ks, 1, c))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(ks - 1, ks - 1)], lhs_dilation=(stride,),
        feature_group_count=c, dimension_numbers=("NHC", "HIO", "NHC"),
    )
    y = ratio * y
    return y[:, pad_left : y.shape[1] - pad_right]


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """Anti-aliased ÷ratio downsample (ref resample.py:33-46)."""
    ks = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    even = ks % 2 == 0
    pad_left = ks // 2 - int(even)
    pad_right = ks // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks)
    return _depthwise_conv(x, filt, stride=ratio, pad_left=pad_left, pad_right=pad_right)


def snake(x: jnp.ndarray, alpha: jnp.ndarray, logscale: bool) -> jnp.ndarray:
    """x + (1/a)·sin²(ax) (ref activations.py:50-60). alpha: (C,)."""
    a = jnp.exp(alpha) if logscale else alpha
    return x + (1.0 / (a + 1e-9)) * jnp.sin(x * a) ** 2


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool) -> jnp.ndarray:
    """x + (1/b)·sin²(ax) (ref activations.py:63-121)."""
    a = jnp.exp(alpha) if logscale else alpha
    b = jnp.exp(beta) if logscale else beta
    return x + (1.0 / (b + 1e-9)) * jnp.sin(x * a) ** 2


class AntiAliasedSnake(nn.Module):
    """Activation1d: up×2 -> snake(β) -> down×2 (ref torch/act.py).

    With use_pallas=True the fused TPU kernel (ops/pallas/snake_aa.py) runs
    instead of the three-op XLA composition."""

    channels: int
    logscale: bool = True
    use_beta: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = self.param("beta", init, (self.channels,)) if self.use_beta else alpha
        if self.use_pallas:
            from gpt_sovits_tpu.ops.pallas.snake_aa import snake_aa_fused

            return snake_aa_fused(x, alpha, beta, logscale=self.logscale)
        h = upsample1d(x, 2)
        h = snake_beta(h, alpha, beta, self.logscale) if self.use_beta else snake(h, alpha, self.logscale)
        return downsample1d(h, 2)


class AMPBlock1(nn.Module):
    cfg: BigVGANConfig
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilations):
            xt = AntiAliasedSnake(
                self.channels, self.cfg.snake_logscale, use_pallas=self.use_pallas, name=f"act1_{j}"
            )(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, name=f"c1_{j}")(xt)
            xt = AntiAliasedSnake(
                self.channels, self.cfg.snake_logscale, use_pallas=self.use_pallas, name=f"act2_{j}"
            )(xt)
            xt = Conv1d(self.channels, self.kernel_size, dilation=1, name=f"c2_{j}")(xt)
            x = xt + x
        return x


class BigVGAN(nn.Module):
    cfg: BigVGANConfig = BigVGANConfig()
    use_pallas: bool = False

    @nn.compact
    def __call__(self, mel):
        """(B, T, num_mels) -> (B, T*prod(rates), 1)."""
        c = self.cfg
        x = Conv1d(c.upsample_initial_channel, 7, name="conv_pre")(mel)
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1d(ch, k, u, (k - u) // 2, name=f"up_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)):
                r = AMPBlock1(c, ch, rk, tuple(rd), use_pallas=self.use_pallas, name=f"resblock_{i}_{j}")(x)
                xs = r if xs is None else xs + r
            x = xs / len(c.resblock_kernel_sizes)
        x = AntiAliasedSnake(ch, c.snake_logscale, use_pallas=self.use_pallas, name="activation_post")(x)
        x = Conv1d(1, 7, use_bias=c.use_bias_at_final, name="conv_post")(x)
        if c.use_tanh_at_final:
            x = jnp.tanh(x)
        else:
            x = jnp.clip(x, -1.0, 1.0)
        return x


# ---------------------------------------------------------------------------
# torch weight import (HF nvidia/bigvgan_v2_* or GPT-SoVITS vocoder ckpt)
# ---------------------------------------------------------------------------


def params_from_torch(state_dict: dict, cfg: BigVGANConfig = BigVGANConfig()) -> dict:
    from gpt_sovits_tpu.utils.checkpoint_compat import _SD

    sd = _SD(state_dict)
    p: dict = {"conv_pre": {"Conv_0": sd.conv("conv_pre")}}
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        p[f"up_{i}"] = sd.convtrans(f"ups.{i}.0")
        for j in range(n_k):
            rb: dict = {}
            pre = f"resblocks.{i * n_k + j}"
            for d in range(len(cfg.resblock_dilation_sizes[j])):
                rb[f"c1_{d}"] = {"Conv_0": sd.conv(f"{pre}.convs1.{d}")}
                rb[f"c2_{d}"] = {"Conv_0": sd.conv(f"{pre}.convs2.{d}")}
                # activations stored interleaved: [a1_0, a2_0, a1_1, a2_1, ...]
                rb[f"act1_{d}"] = {
                    "alpha": jnp.asarray(sd.get(f"{pre}.activations.{2 * d}.act.alpha")),
                    "beta": jnp.asarray(sd.get(f"{pre}.activations.{2 * d}.act.beta")),
                }
                rb[f"act2_{d}"] = {
                    "alpha": jnp.asarray(sd.get(f"{pre}.activations.{2 * d + 1}.act.alpha")),
                    "beta": jnp.asarray(sd.get(f"{pre}.activations.{2 * d + 1}.act.beta")),
                }
            p[f"resblock_{i}_{j}"] = rb
    p["activation_post"] = {
        "alpha": jnp.asarray(sd.get("activation_post.act.alpha")),
        "beta": jnp.asarray(sd.get("activation_post.act.beta")),
    }
    p["conv_post"] = {"Conv_0": sd.conv("conv_post")}
    return {"params": p}
