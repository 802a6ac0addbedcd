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
