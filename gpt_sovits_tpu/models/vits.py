"""S2 "SoVITS" synthesizer (v1/v2/v2Pro/v2ProPlus), TPU-native.

Re-design of `SynthesizerTrn` (GPT_SoVITS/module/models.py:796) and its
submodules in JAX/flax, feature-last layout:

  * TextEncoder (models.py:154): ssl branch (conv1x1 + rel-pos encoder),
    text branch (embed + rel-pos encoder), MRTE cross-attention fusion,
    encoder2, proj -> (m_p, logs_p)
  * PosteriorEncoder (models.py:298): spec -> WN -> (z, m_q, logs_q)
  * ResidualCouplingBlock flow (models.py:253)
  * Generator: MRF HiFiGAN (models.py:407) — ×640 upsample to 32 kHz
  * MelStyleEncoder timbre vector `ge` from the reference spectrogram
    (first 704 bins for v2 — models.py:905)
  * v2Pro: 20480-d SV embedding fused into ge (models.py:895-911)
  * RVQ (n_q=1, 1024 bins) over stride-2-projected SSL features

Inference entry `decode` mirrors models.py:961: semantic codes + reference
spec (+sv) -> waveform. Speed control via linear interpolation of the
encoder output (models.py:227-230).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.models.vits_modules import (
    MRTE,
    Conv1d,
    ConvTranspose1d,
    MelStyleEncoder,
    RelPosEncoder,
    ResBlock1,
    ResidualCouplingBlock,
    VQCodebook,
    WN,
    _leaky_relu,
    sequence_mask,
)
from gpt_sovits_tpu.utils.config import S2Config


class TextEncoder(nn.Module):
    """models.py:154. Takes decoded+interpolated SSL features and phoneme
    ids; returns fused latent stats (m_p, logs_p)."""

    cfg: S2Config

    @nn.compact
    def __call__(self, quantized, y_mask, text, text_mask, ge, speed: float = 1.0):
        c = self.cfg
        y = Conv1d(c.hidden_channels, 1, name="ssl_proj")(quantized * y_mask) * y_mask
        y = RelPosEncoder(
            c.hidden_channels, c.filter_channels, c.n_heads, c.n_layers // 2, c.kernel_size, name="encoder_ssl"
        )(y, y_mask)
        t = nn.Embed(c.phoneme_vocab_size, c.hidden_channels, name="text_embedding")(text)
        t = RelPosEncoder(
            c.hidden_channels, c.filter_channels, c.n_heads, c.n_layers, c.kernel_size, name="encoder_text"
        )(t * text_mask, text_mask)
        y = MRTE(c.hidden_channels, c.mrte_hidden, c.hidden_channels, name="mrte")(y, y_mask, t, text_mask, ge)
        y = RelPosEncoder(
            c.hidden_channels, c.filter_channels, c.n_heads, c.n_layers // 2, c.kernel_size, name="encoder2"
        )(y, y_mask)
        if speed != 1.0:
            new_t = int(y.shape[1] / speed) + 1
            y = jax.image.resize(y, (y.shape[0], new_t, y.shape[2]), method="linear")
            y_mask = (jax.image.resize(y_mask, (y_mask.shape[0], new_t, 1), method="nearest") > 0).astype(y.dtype)
        stats = Conv1d(2 * c.inter_channels, 1, name="proj")(y) * y_mask
        m, logs = stats[..., : c.inter_channels], stats[..., c.inter_channels :]
        return y, m, logs, y_mask


class PosteriorEncoder(nn.Module):
    """models.py:298: linear spec -> WN(16 layers) -> (z, m_q, logs_q)."""

    cfg: S2Config

    @nn.compact
    def __call__(self, x, x_mask, g=None, *, rng=None):
        c = self.cfg
        h = Conv1d(c.hidden_channels, 1, name="pre")(x) * x_mask
        h = WN(c.hidden_channels, 5, 1, 16, gin_channels=c.gin_channels, name="enc")(h, x_mask, g=g)
        stats = Conv1d(2 * c.inter_channels, 1, name="proj")(h) * x_mask
        m, logs = stats[..., : c.inter_channels], stats[..., c.inter_channels :]
        noise = jax.random.normal(rng, m.shape) if rng is not None else 0.0
        z = (m + noise * jnp.exp(logs)) * x_mask
        return z, m, logs


class Generator(nn.Module):
    """MRF HiFiGAN (models.py:407). upsample ×prod(rates); tanh output."""

    cfg: S2Config
    initial_channel: Optional[int] = None
    upsample_rates: Optional[Sequence[int]] = None
    upsample_kernel_sizes: Optional[Sequence[int]] = None
    use_post_bias: bool = False  # v4 standalone vocoder uses is_bias=True

    @nn.compact
    def __call__(self, x, g=None):
        c = self.cfg
        rates = self.upsample_rates or c.upsample_rates
        kernels = self.upsample_kernel_sizes or c.upsample_kernel_sizes
        uic = c.upsample_initial_channel
        x = Conv1d(uic, 7, name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(uic, 1, name="cond")(g)
        for i, (u, k) in enumerate(zip(rates, kernels)):
            ch = uic // (2 ** (i + 1))
            x = _leaky_relu(x)
            x = ConvTranspose1d(ch, k, u, (k - u) // 2, name=f"up_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)):
                r = ResBlock1(ch, rk, tuple(rd), name=f"resblock_{i}_{j}")(x)
                xs = r if xs is None else xs + r
            x = xs / len(c.resblock_kernel_sizes)
        # NB: the reference's final activation is F.leaky_relu with torch's
        # default slope 0.01, unlike the 0.1 used elsewhere (models.py:466)
        x = nn.leaky_relu(x, 0.01)
        x = Conv1d(1, 7, use_bias=self.use_post_bias, name="conv_post")(x)
        return jnp.tanh(x)


class SynthesizerTrn(nn.Module):
    """The full S2 model (models.py:796)."""

    cfg: S2Config

    def setup(self):
        c = self.cfg
        self.enc_p = TextEncoder(c, name="enc_p")
        self.dec = Generator(c, name="dec")
        self.enc_q = PosteriorEncoder(c, name="enc_q")
        self.flow = ResidualCouplingBlock(
            c.inter_channels, c.hidden_channels, 5, 1, 4, gin_channels=c.gin_channels, name="flow"
        )
        ref_dim = c.spec_channels if c.version == "v1" else min(704, c.spec_channels)
        self.ref_enc = MelStyleEncoder(ref_dim, out_dim=c.gin_channels, name="ref_enc")
        # stride-2 SSL projection: 50 Hz 768-d -> 25 Hz 768-d (models.py:888)
        self.ssl_proj = nn.Conv(c.ssl_dim, (2,), strides=(2,), padding="VALID", name="ssl_proj")
        self.quantizer = VQCodebook(c.n_codes, c.ssl_dim, name="quantizer")
        if c.is_pro:
            self.sv_emb = nn.Dense(c.gin_channels, name="sv_emb")
            self.ge_to512 = nn.Dense(c.mrte_hidden, name="ge_to512")
            self.prelu_alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (c.gin_channels,))

    # -- timbre ---------------------------------------------------------------

    def compute_ge(self, refer_spec, refer_mask, sv_emb=None):
        """refer_spec: (B,T,spec_channels) -> ge (B,1,gin)."""
        c = self.cfg
        ref = refer_spec if c.version == "v1" else refer_spec[..., : min(704, c.spec_channels)]
        ge = self.ref_enc(ref * refer_mask, refer_mask)
        if c.is_pro and sv_emb is not None:
            ge = ge + self.sv_emb(sv_emb)[:, None, :]
            ge = jnp.where(ge >= 0, ge, ge * self.prelu_alpha)
        return ge

    def compute_ge_masked(self, refer_spec, refer_lengths, sv_emb=None):
        """compute_ge with the mask built from lengths; entry point for
        precomputing ge per reference (multi-reference tone fusion averages
        these — models.py:977-984, aux_ref_audio_paths TTS.py:1098-1109;
        each reference is encoded at its own length, like the reference)."""
        refer_mask = sequence_mask(refer_lengths, refer_spec.shape[1])
        return self.compute_ge(refer_spec, refer_mask, sv_emb)

    # -- semantic codes -------------------------------------------------------

    def extract_latent(self, ssl):
        """(B,T,768) 50 Hz SSL -> (B,T//2) codes (models.py:1007)."""
        x = self.ssl_proj(ssl)
        _, codes = self.quantizer(x)
        return codes

    def decode_codes(self, codes):
        """codes (B,Tc) -> interpolated quantized features (B,2*Tc,768)."""
        q = self.quantizer.decode(codes)
        if self.cfg.semantic_frame_rate == "25hz":
            q = jnp.repeat(q, 2, axis=1)  # nearest-neighbor ×2 (models.py:990)
        return q

    # -- inference ------------------------------------------------------------

    def decode(
        self,
        codes,  # (B, Tc) int32 semantic tokens
        codes_lengths,  # (B,)
        text,  # (B, Tt) phoneme ids
        text_lengths,  # (B,)
        refer_spec,  # (B, Tr, spec_channels)
        refer_lengths,  # (B,)
        *,
        noise_rng=None,
        noise_scale: float = 0.5,
        speed: float = 1.0,
        sv_emb=None,
        ge=None,
    ):
        """models.py:961 `decode`: codes + reference -> waveform (B, T_wav, 1).

        Pass a precomputed `ge` (e.g. a multi-reference mean) to skip the
        reference encoder; refer_spec/refer_lengths may then be None."""
        c = self.cfg
        if ge is None:
            ge = self.compute_ge_masked(refer_spec, refer_lengths, sv_emb)
        ge_for_enc = self.ge_to512(ge) if c.is_pro else ge

        quantized = self.decode_codes(codes)
        y_mask = sequence_mask(codes_lengths * 2, quantized.shape[1])
        text_mask = sequence_mask(text_lengths, text.shape[1])
        _, m_p, logs_p, y_mask = self.enc_p(quantized, y_mask, text, text_mask, ge_for_enc, speed=speed)
        noise = jax.random.normal(noise_rng, m_p.shape) if noise_rng is not None else 0.0
        z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, y_mask, g=ge, reverse=True)
        return self.dec(z * y_mask, g=ge)

    def decode_latent(
        self,
        codes,
        codes_lengths,
        text,
        text_lengths,
        refer_spec,
        refer_lengths,
        *,
        noise_rng=None,
        noise_scale: float = 0.5,
        speed: float = 1.0,
        sv_emb=None,
        ge=None,
    ):
        """`decode` minus the vocoder: -> (z * y_mask, ge). Serving runs the
        generator separately through the lane-folded fast path
        (ops/folded_conv.py). `ge` as in `decode`."""
        c = self.cfg
        if ge is None:
            ge = self.compute_ge_masked(refer_spec, refer_lengths, sv_emb)
        ge_for_enc = self.ge_to512(ge) if c.is_pro else ge
        quantized = self.decode_codes(codes)
        y_mask = sequence_mask(codes_lengths * 2, quantized.shape[1])
        text_mask = sequence_mask(text_lengths, text.shape[1])
        _, m_p, logs_p, y_mask = self.enc_p(quantized, y_mask, text, text_mask, ge_for_enc, speed=speed)
        noise = jax.random.normal(noise_rng, m_p.shape) if noise_rng is not None else 0.0
        z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, y_mask, g=ge, reverse=True)
        return z * y_mask, ge

    # -- training forward -----------------------------------------------------

    def __call__(
        self,
        ssl,  # (B, Ts, 768) 50 Hz SSL features
        spec,  # (B, T, spec_channels) linear spectrogram
        spec_lengths,  # (B,)
        text,  # (B, Tt)
        text_lengths,  # (B,)
        *,
        rngs_noise,
        rng_slice,
        sv_emb=None,
    ):
        """models.py:901 forward. Returns the pieces the GAN step needs."""
        c = self.cfg
        y_mask = sequence_mask(spec_lengths, spec.shape[1])
        ge = self.compute_ge(spec, y_mask, sv_emb)
        ge_for_enc = self.ge_to512(ge) if c.is_pro else ge

        x = self.ssl_proj(ssl)
        quantized, codes = self.quantizer(x)
        # straight-through + commit loss (core_vq.py VectorQuantization)
        commit_loss = jnp.mean((quantized - jax.lax.stop_gradient(x)) ** 2)
        quantized = x + jax.lax.stop_gradient(quantized - x)
        quantized = jax.lax.stop_gradient(quantized) if c.freeze_quantizer else quantized
        if c.semantic_frame_rate == "25hz":
            quantized = jnp.repeat(quantized, 2, axis=1)
        # align time with spec frames
        tdiff = spec.shape[1] - quantized.shape[1]
        if tdiff > 0:
            quantized = jnp.pad(quantized, ((0, 0), (0, tdiff), (0, 0)))
        elif tdiff < 0:
            quantized = quantized[:, : spec.shape[1]]

        _, m_p, logs_p, y_mask = self.enc_p(quantized, y_mask, text, text_mask=sequence_mask(text_lengths, text.shape[1]), ge=ge_for_enc)
        z, m_q, logs_q = self.enc_q(spec, y_mask, g=jax.lax.stop_gradient(ge), rng=rngs_noise)
        z_p = self.flow(z, y_mask, g=ge)

        # rand_slice_segments (commons.py): random segment per sequence
        seg = c.segment_size
        max_starts = jnp.maximum(spec_lengths - seg, 0)
        starts = (jax.random.uniform(rng_slice, (z.shape[0],)) * (max_starts + 1)).astype(jnp.int32)
        z_slice = jax.vmap(lambda zb, s: jax.lax.dynamic_slice(zb, (s, 0), (seg, zb.shape[1])))(z, starts)
        o = self.dec(z_slice, g=ge)
        return {
            "wav_hat": o,
            "commit_loss": commit_loss,
            "ids_slice": starts,
            "y_mask": y_mask,
            "z": z,
            "z_p": z_p,
            "m_p": m_p,
            "logs_p": logs_p,
            "m_q": m_q,
            "logs_q": logs_q,
            "quantized": quantized,
        }

    def init_all(self, ssl, spec, spec_lengths, text, text_lengths, sv_emb=None):
        """Touch every code path so .init() builds the complete param tree."""
        out = self(
            ssl, spec, spec_lengths, text, text_lengths,
            rngs_noise=self.make_rng("noise"), rng_slice=self.make_rng("slice"), sv_emb=sv_emb,
        )
        codes = self.extract_latent(ssl)
        _ = self.decode(
            codes, jnp.full((codes.shape[0],), codes.shape[1]), text, text_lengths,
            spec, spec_lengths, sv_emb=sv_emb,
        )
        return out
