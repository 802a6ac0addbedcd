"""GAN discriminators + losses for S2 training.

Re-design of MultiPeriodDiscriminator (GPT_SoVITS/module/models.py:481-618)
and module/losses.py in JAX/flax, feature-last layout. v2Pro adds periods
17 and 23 (models.py:596-599).

Waveforms are (B, T, 1).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gpt_sovits_tpu.models.vits_modules import _leaky_relu


class DiscriminatorS(nn.Module):
    @nn.compact
    def __call__(self, x):
        fmap = []
        specs = [  # (features, kernel, stride, groups)
            (16, 15, 1, 1),
            (64, 41, 4, 4),
            (256, 41, 4, 16),
            (1024, 41, 4, 64),
            (1024, 41, 4, 256),
            (1024, 5, 1, 1),
        ]
        for i, (f, k, s, g) in enumerate(specs):
            x = nn.Conv(f, (k,), strides=(s,), padding=[(k // 2, k // 2)], feature_group_count=g, name=f"conv_{i}")(x)
            x = _leaky_relu(x)
            fmap.append(x)
        x = nn.Conv(1, (3,), padding=[(1, 1)], name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        # (B, T, 1) -> (B, T//p, p, 1) 2D view
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, c)
        fmap = []
        pad = (self.kernel_size - 1) // 2
        for i, f in enumerate([32, 128, 512, 1024]):
            x = nn.Conv(
                f, (self.kernel_size, 1), strides=(self.stride, 1), padding=[(pad, pad), (0, 0)], name=f"conv_{i}"
            )(x)
            x = _leaky_relu(x)
            fmap.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding=[(pad, pad), (0, 0)], name="conv_4")(x)
        x = _leaky_relu(x)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


def _mrd_magnitude(x: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    """|STFT| the way the vendored MRD computes it (BigVGAN/
    discriminators.py:215-232): reflect-pad (n_fft-hop)/2, center=False,
    rectangular window of win_length. Expressed as a frame matmul against
    real-DFT bases so XLA tiles it onto the MXU. x: (B, T, 1) -> (B, F, TT).
    """
    import numpy as np

    b = x.shape[0]
    y = x[..., 0]
    pad = (n_fft - hop) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = y[:, idx]  # (B, TT, n_fft)
    # rectangular window of win_length, centered in the n_fft frame
    if win < n_fft:
        lo = (n_fft - win) // 2
        mask = np.zeros((n_fft,), np.float32)
        mask[lo : lo + win] = 1.0
        frames = frames * jnp.asarray(mask)
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(-np.sin(ang), jnp.float32)
    re = frames @ cos
    im = frames @ sin
    mag = jnp.sqrt(re * re + im * im + 1e-9)
    return jnp.swapaxes(mag, 1, 2)  # (B, F, TT)


class DiscriminatorR(nn.Module):
    """One resolution of the multi-resolution (STFT) discriminator
    (BigVGAN/discriminators.py:140-236). channels=32, (3,9) kernels with
    three stride-(1,2) stages over the time axis, NHWC."""

    resolution: Sequence[int]  # (n_fft, hop, win)

    @nn.compact
    def __call__(self, x):
        n_fft, hop, win = self.resolution
        m = _mrd_magnitude(x, n_fft, hop, win)  # (B, F, TT)
        h = m[..., None]  # NHWC: (B, F, TT, 1)
        fmap = []
        specs = [  # (kernel, stride)
            ((3, 9), (1, 1)),
            ((3, 9), (1, 2)),
            ((3, 9), (1, 2)),
            ((3, 9), (1, 2)),
            ((3, 3), (1, 1)),
        ]
        for i, (k, s) in enumerate(specs):
            h = nn.Conv(
                32, k, strides=s,
                padding=[((k[0] - 1) // 2, (k[0] - 1) // 2), ((k[1] - 1) // 2, (k[1] - 1) // 2)],
                name=f"conv_{i}",
            )(h)
            h = jax.nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    """Three DiscriminatorR resolutions (BigVGAN/discriminators.py:239-271,
    default cfg.resolutions)."""

    resolutions: Sequence[Sequence[int]] = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for res in self.resolutions:
            d = DiscriminatorR(res, name=f"disc_r{res[0]}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)  # v2Pro: + (17, 23)

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        discs = [DiscriminatorS(name="disc_s")] + [DiscriminatorP(p, name=f"disc_p{p}") for p in self.periods]
        for d in discs:
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Losses (ref module/losses.py)
# ---------------------------------------------------------------------------


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """L1 feature matching ×2 (losses.py:6)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(rl) - gl))
    return loss * 2.0


def discriminator_loss(disc_real, disc_gen):
    """LSGAN D loss (losses.py:17)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss = loss + r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN G adversarial loss (losses.py:33)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask) -> jnp.ndarray:
    """KL(q||p) between posterior and flow-mapped prior (losses.py:45).

    All args (B, T, C); z_mask (B, T, 1)."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)
