"""BigVGAN vocoder GAN training.

Counterpart of the vendored BigVGAN trainer (BigVGAN/train.py:75-84): the
generator trains against the multi-period discriminator AND the
multi-resolution STFT discriminator (DiscriminatorR x3, BigVGAN/
discriminators.py:140-271) with adversarial + feature-matching +
multi-scale mel losses (lambda_melloss=15). The reference's optional
CQT-based family needs a constant-Q stack and is not part of the default
recipe. One jitted two-optimizer step, like s2_train.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from gpt_sovits_tpu.dsp.mel import mel_spectrogram
from gpt_sovits_tpu.models.bigvgan import BigVGAN
import flax.linen as nn

from gpt_sovits_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from gpt_sovits_tpu.utils.config import MelConfig, TrainConfig


class BigVGANDiscriminators(nn.Module):
    """MPD + MRD under one param tree, outputs concatenated the way the
    vendored trainer sums loss_f + loss_s terms (BigVGAN/train.py:75-84)."""

    periods: tuple = (2, 3, 5, 7, 11)
    resolutions: tuple = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))

    @nn.compact
    def __call__(self, y, y_hat):
        r1, g1, fr1, fg1 = MultiPeriodDiscriminator(self.periods, name="mpd")(y, y_hat)
        r2, g2, fr2, fg2 = MultiResolutionDiscriminator(self.resolutions, name="mrd")(y, y_hat)
        return r1 + r2, g1 + g2, fr1 + fr2, fg1 + fg2


@flax.struct.dataclass
class BigVGANTrainState:
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any


def multiscale_mel_loss(y: jnp.ndarray, y_hat: jnp.ndarray, base: MelConfig, *, n_scales: int = 3) -> jnp.ndarray:
    """L1 over mel spectrograms at several STFT resolutions
    (BigVGAN use_multiscale_melloss)."""
    loss = 0.0
    for s in range(n_scales):
        factor = 2**s
        cfg = MelConfig(
            sampling_rate=base.sampling_rate,
            n_fft=max(base.n_fft // factor, 64),
            win_size=max(base.win_size // factor, 64),
            hop_size=max(base.hop_size // factor, 16),
            num_mels=base.num_mels,
            fmin=base.fmin,
            fmax=base.fmax,
        )
        loss = loss + jnp.mean(jnp.abs(mel_spectrogram(y, cfg) - mel_spectrogram(y_hat, cfg)))
    return loss / n_scales


def init_state(key, gen: BigVGAN, disc: MultiPeriodDiscriminator, cfg: TrainConfig, mel: MelConfig, seg_frames: int):
    k1, k2 = jax.random.split(key)
    params_g = gen.init(k1, jnp.zeros((1, seg_frames, gen.cfg.num_mels)))
    wav_len = seg_frames * mel.hop_size
    params_d = disc.init(k2, jnp.zeros((1, wav_len, 1)), jnp.zeros((1, wav_len, 1)))
    opt = optax.adamw(cfg.learning_rate, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)
    return BigVGANTrainState(jnp.zeros((), jnp.int32), params_g, params_d, opt.init(params_g["params"]), opt.init(params_d["params"]))


def make_train_step(gen: BigVGAN, disc: MultiPeriodDiscriminator, cfg: TrainConfig, mel: MelConfig, *, lambda_mel: float = 15.0):
    opt = optax.adamw(cfg.learning_rate, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)

    def train_step(state: BigVGANTrainState, batch: dict, rng):
        """batch: {mel (B,T,M), wav (B,T*hop,1)}."""

        def g_forward(p):
            return gen.apply(p, batch["mel"])

        fake = jax.lax.stop_gradient(g_forward(state.params_g))

        def d_loss_fn(pd):
            r, g, _, _ = disc.apply(pd, batch["wav"], fake)
            loss, _, _ = discriminator_loss(r, g)
            return loss

        loss_d, grads_d = jax.value_and_grad(d_loss_fn)(state.params_d)
        upd_d, opt_d = opt.update(grads_d["params"], state.opt_d, state.params_d["params"])
        params_d = {"params": optax.apply_updates(state.params_d["params"], upd_d)}

        def g_loss_fn(pg):
            y_hat = g_forward(pg)
            r, g, fr, fg = disc.apply(params_d, batch["wav"], y_hat)
            adv, _ = generator_loss(g)
            fm = feature_loss(fr, fg)
            melL = multiscale_mel_loss(batch["wav"][..., 0], y_hat[..., 0], mel) * lambda_mel
            return adv + fm + melL, {"loss_adv": adv, "loss_fm": fm, "loss_mel": melL}

        (loss_g, metrics), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_g)
        upd_g, opt_g = opt.update(grads_g["params"], state.opt_g, state.params_g["params"])
        params_g = {"params": optax.apply_updates(state.params_g["params"], upd_g)}
        return (
            BigVGANTrainState(state.step + 1, params_g, params_d, opt_g, opt_d),
            dict(metrics, loss_g=loss_g, loss_d=loss_d),
        )

    return jax.jit(train_step, donate_argnums=(0,))
