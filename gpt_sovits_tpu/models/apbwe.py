"""AP-BWE audio super-resolution (24 kHz -> 48 kHz bandwidth extension).

Re-design of tools/AP_BWE_main/models/model.py (APNet_BWE_Model) +
tools/audio_sr.py in JAX/flax: dual amplitude/phase ConvNeXt streams over a
center=True STFT, with an overlap-add iSTFT. Applied after the v3 BigVGAN
vocoder when super-resolution is requested (TTS.py:1407-1417).

Defaults follow the published AP-BWE 24k->48k recipe (n_fft 1024, hop 240,
8 ConvNeXt layers, 512 channels).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.dsp.mel import hann_window


@dataclass(frozen=True)
class APBWEConfig:
    n_fft: int = 1024
    hop_size: int = 240
    win_size: int = 1024
    channels: int = 512
    layers: int = 8
    hr_sampling_rate: int = 48000


# ---------------------------------------------------------------------------
# center=True STFT / iSTFT (ref datasets1/dataset.py amp_pha_stft/istft)
# ---------------------------------------------------------------------------


def amp_pha_stft(audio: jnp.ndarray, n_fft: int, hop: int, win: int):
    """(B, L) -> (log_amp, phase), each (B, bins, T). center=True reflect."""
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[:, idx] * jnp.asarray(hann_window(win))
    z = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    log_amp = jnp.log(jnp.abs(z) + 1e-4)
    pha = jnp.angle(z)
    return jnp.swapaxes(log_amp, 1, 2), jnp.swapaxes(pha, 1, 2)


def amp_pha_istft(log_amp: jnp.ndarray, pha: jnp.ndarray, n_fft: int, hop: int, win: int):
    """(B, bins, T) -> (B, L) overlap-add iSTFT with window normalization,
    matching torch.istft(center=True)."""
    amp = jnp.exp(log_amp)
    z = amp * jnp.exp(1j * pha)  # (B, bins, T)
    z = jnp.swapaxes(z, 1, 2)  # (B, T, bins)
    frames = jnp.fft.irfft(z, n=n_fft, axis=-1)  # (B, T, n_fft)
    w = jnp.asarray(hann_window(win))
    frames = frames * w
    b, t, _ = frames.shape
    out_len = n_fft + hop * (t - 1)
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]  # (T, n_fft)
    sig = jnp.zeros((b, out_len))
    sig = sig.at[:, idx.reshape(-1)].add(frames.reshape(b, -1))
    wsum = jnp.zeros((out_len,))
    wsum = wsum.at[idx.reshape(-1)].add(jnp.tile(w * w, (t,)))
    sig = sig / jnp.maximum(wsum, 1e-11)
    pad = n_fft // 2
    return sig[:, pad : out_len - pad]


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float

    @nn.compact
    def __call__(self, x):
        """(B, T, C)."""
        residual = x
        x = nn.Conv(self.dim, (7,), padding=[(3, 3)], feature_group_count=self.dim, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(self.dim * 3, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,))
        return residual + gamma * x


class APNetBWE(nn.Module):
    cfg: APBWEConfig = APBWEConfig()

    @nn.compact
    def __call__(self, mag_nb, pha_nb):
        """mag/pha: (B, bins, T) -> (mag_wb, pha_wb) same shapes."""
        c = self.cfg
        scale = 1.0 / c.layers
        mag = jnp.swapaxes(mag_nb, 1, 2)  # (B, T, bins)
        pha = jnp.swapaxes(pha_nb, 1, 2)
        x_mag = nn.Conv(c.channels, (7,), padding=[(3, 3)], name="conv_pre_mag")(mag)
        x_pha = nn.Conv(c.channels, (7,), padding=[(3, 3)], name="conv_pre_pha")(pha)
        x_mag = nn.LayerNorm(epsilon=1e-6, name="norm_pre_mag")(x_mag)
        x_pha = nn.LayerNorm(epsilon=1e-6, name="norm_pre_pha")(x_pha)
        for i in range(c.layers):
            x_mag = x_mag + x_pha
            x_pha = x_pha + x_mag
            x_mag = ConvNeXtBlock(c.channels, scale, name=f"convnext_mag_{i}")(x_mag)
            x_pha = ConvNeXtBlock(c.channels, scale, name=f"convnext_pha_{i}")(x_pha)
        x_mag = nn.LayerNorm(epsilon=1e-6, name="norm_post_mag")(x_mag)
        mag_wb = mag + nn.Dense(mag.shape[-1], name="linear_post_mag")(x_mag)
        x_pha = nn.LayerNorm(epsilon=1e-6, name="norm_post_pha")(x_pha)
        pha_r = nn.Dense(pha.shape[-1], name="linear_post_pha_r")(x_pha)
        pha_i = nn.Dense(pha.shape[-1], name="linear_post_pha_i")(x_pha)
        pha_wb = jnp.arctan2(pha_i, pha_r)
        return jnp.swapaxes(mag_wb, 1, 2), jnp.swapaxes(pha_wb, 1, 2)


def super_resolve(model: APNetBWE, params, audio: jnp.ndarray, orig_sr: int):
    """(B, L) @ orig_sr -> (B, L*2) @ hr_sampling_rate (tools/audio_sr.py:40)."""
    from gpt_sovits_tpu.dsp.audio_io import resample

    c = model.cfg
    up = np.stack([resample(np.asarray(a), orig_sr, c.hr_sampling_rate) for a in audio])
    mag, pha = amp_pha_stft(jnp.asarray(up), c.n_fft, c.hop_size, c.win_size)
    mag_wb, pha_wb = model.apply(params, mag, pha)
    return amp_pha_istft(mag_wb, pha_wb, c.n_fft, c.hop_size, c.win_size), c.hr_sampling_rate


def params_from_torch(state_dict: dict, cfg: APBWEConfig = APBWEConfig()) -> dict:
    from gpt_sovits_tpu.utils.checkpoint_compat import _SD

    sd = _SD(state_dict)
    p = {
        "conv_pre_mag": sd.conv("conv_pre_mag"),
        "conv_pre_pha": sd.conv("conv_pre_pha"),
        "norm_pre_mag": sd.ln("norm_pre_mag", "weight", "bias"),
        "norm_pre_pha": sd.ln("norm_pre_pha", "weight", "bias"),
        "norm_post_mag": sd.ln("norm_post_mag", "weight", "bias"),
        "norm_post_pha": sd.ln("norm_post_pha", "weight", "bias"),
        "linear_post_mag": sd.dense("linear_post_mag"),
        "linear_post_pha_r": sd.dense("linear_post_pha_r"),
        "linear_post_pha_i": sd.dense("linear_post_pha_i"),
    }
    for stream in ("mag", "pha"):
        for i in range(cfg.layers):
            pre = f"convnext_{stream}.{i}"
            p[f"convnext_{stream}_{i}"] = {
                "dwconv": sd.conv(f"{pre}.dwconv"),
                "norm": sd.ln(f"{pre}.norm", "weight", "bias"),
                "pwconv1": sd.dense(f"{pre}.pwconv1"),
                "pwconv2": sd.dense(f"{pre}.pwconv2"),
                "gamma": jnp.asarray(np.asarray(state_dict[f"{pre}.gamma"])).reshape(-1),
            }
    return {"params": p}
