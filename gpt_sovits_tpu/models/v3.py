"""v3/v4 synthesizer: semantic codes -> CFM flow-matching mel.

Re-design of `SynthesizerTrnV3` + `CFM` (GPT_SoVITS/module/models.py:1128,
:1013). Shares TextEncoder / MelStyleEncoder / VQ with the v2 stack; adds:

  * bridge: 1x1 conv + leaky_relu(0.01) to 512 ch (models.py:1203)
  * nearest interpolation ×1.875 (v3, 24 kHz mel hop 256) or ×2 (v4,
    32 kHz mel hop 320) (models.py:1206 / decode_encp:1259)
  * wns1: WN Encoder (k=5, 8 layers, ge-conditioned) (models.py:1204)
  * CFM: conditional flow matching on normalized mel with random
    prompt-prefix masking and the 30% two-step bootstrap consistency trick
    (models.py:1089-1112); Euler inference with conditioner caching
    (models.py:1027-1084) expressed as one lax.scan

The mel decode (vocoder) lives in models/bigvgan.py (v3) and the shared
Generator (v4, ×480 to 48 kHz).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.models.dit import DiT, DiTConfig
from gpt_sovits_tpu.models.vits import TextEncoder
from gpt_sovits_tpu.models.vits_modules import Conv1d, MelStyleEncoder, VQCodebook, WN, sequence_mask
from gpt_sovits_tpu.utils.config import S2Config


def interpolate_nearest(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """(B,T,C) nearest-neighbor time interpolation by a float factor,
    matching F.interpolate(..., scale_factor=s, mode='nearest')."""
    t = x.shape[1]
    out_t = int(t * scale)
    idx = np.floor(np.arange(out_t) / scale).astype(np.int32)
    return x[:, idx]


class WNEncoder(nn.Module):
    """models.py:340 `Encoder`: 1x1 pre -> WN -> 1x1 proj (no flow split)."""

    hidden: int
    out: int
    kernel_size: int = 5
    n_layers: int = 8
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None):
        h = Conv1d(self.hidden, 1, name="pre")(x) * x_mask
        h = WN(self.hidden, self.kernel_size, 1, self.n_layers, gin_channels=self.gin_channels, name="enc")(
            h, x_mask, g=g
        )
        return Conv1d(self.out, 1, name="proj")(h) * x_mask


class SynthesizerTrnV3(nn.Module):
    cfg: S2Config  # version in ("v3", "v4")

    @property
    def interp_factor(self) -> float:
        return 1.875 if self.cfg.version == "v3" else 2.0

    @property
    def dit_config(self) -> DiTConfig:
        c = self.cfg
        return DiTConfig(
            dim=c.cfm_dit_dim, depth=c.cfm_dit_depth, heads=c.cfm_dit_heads,
            ff_mult=2, mel_dim=c.cfm_mel_channels, text_dim=512, conv_layers=4,
        )

    def setup(self):
        c = self.cfg
        self.enc_p = TextEncoder(c, name="enc_p")
        self.ref_enc = MelStyleEncoder(min(704, c.spec_channels), out_dim=c.gin_channels, name="ref_enc")
        self.ssl_proj = nn.Conv(c.ssl_dim, (2,), strides=(2,), padding="VALID", name="ssl_proj")
        self.quantizer = VQCodebook(c.n_codes, c.ssl_dim, name="quantizer")
        self.bridge = Conv1d(512, 1, name="bridge")
        self.wns1 = WNEncoder(512, 512, 5, 8, gin_channels=c.gin_channels, name="wns1")
        self.cfm = CFM(self.dit_config, name="cfm")

    def compute_ge(self, refer_spec, refer_mask):
        ref = refer_spec[..., : min(704, self.cfg.spec_channels)]
        return self.ref_enc(ref * refer_mask, refer_mask)

    def extract_latent(self, ssl):
        x = self.ssl_proj(ssl)
        _, codes = self.quantizer(x)
        return codes

    def decode_encp(
        self,
        codes,  # (B, Tc)
        codes_lengths,
        text,
        text_lengths,
        refer_spec,
        refer_lengths,
        *,
        speed: float = 1.0,
        ge=None,
    ):
        """models.py:1245: codes + reference -> DiT conditioning `fea`, ge."""
        c = self.cfg
        if ge is None:
            refer_mask = sequence_mask(refer_lengths, refer_spec.shape[1])
            ge = self.compute_ge(refer_spec, refer_mask)
        quantized = self.quantizer.decode(codes)
        quantized = jnp.repeat(quantized, 2, axis=1)  # 25 Hz -> 50 Hz
        y_mask = sequence_mask(codes_lengths * 2, quantized.shape[1])
        text_mask = sequence_mask(text_lengths, text.shape[1])
        x, _, _, _ = self.enc_p(quantized, y_mask, text, text_mask, ge, speed=speed)
        fea = nn.leaky_relu(self.bridge(x), 0.01)
        fea = interpolate_nearest(fea, self.interp_factor)
        if speed != 1.0:
            mel_len = (codes_lengths * (3.875 if c.version == "v3" else 4) / speed).astype(jnp.int32) + 1
        else:
            mel_len = (codes_lengths * (3.875 if c.version == "v3" else 4)).astype(jnp.int32)
        # the reference slices fea[:, :, :sizee] where torch clips to the
        # actual (unpadded) length (models.py:1254-1266: sizee uses 3.875 but
        # the x1.875 interp yields floor(codes*3.75) frames); clamp to the
        # true content length so downstream bookkeeping matches
        content_len = jnp.floor(codes_lengths * 2 * self.interp_factor).astype(jnp.int32)
        mel_len = jnp.minimum(jnp.minimum(mel_len, content_len), fea.shape[1])
        mel_mask = sequence_mask(mel_len, fea.shape[1])
        fea = self.wns1(fea, mel_mask, g=ge)
        return fea, ge, mel_len

    def __call__(
        self,
        ssl,  # (B, Ts, 768)
        spec,  # (B, T, spec_channels) for timbre ge
        spec_lengths,
        mel,  # (B, Tm, 100) normalized target mel
        mel_lengths,
        text,
        text_lengths,
        *,
        rng,
    ):
        """Training forward -> CFM loss (models.py:1219-1242)."""
        c = self.cfg
        y_mask = sequence_mask(spec_lengths, spec.shape[1])
        ge = self.compute_ge(spec, y_mask)
        x = self.ssl_proj(ssl)
        quantized, _ = self.quantizer(x)
        quantized = jax.lax.stop_gradient(jnp.repeat(quantized, 2, axis=1))
        qt_mask = sequence_mask(jnp.minimum(spec_lengths, quantized.shape[1]), quantized.shape[1])
        text_mask = sequence_mask(text_lengths, text.shape[1])
        xh, _, _, _ = self.enc_p(quantized, qt_mask, text, text_mask, ge)
        fea = nn.leaky_relu(self.bridge(xh), 0.01)
        fea = interpolate_nearest(fea, self.interp_factor)
        mel_mask = sequence_mask(mel_lengths, fea.shape[1])
        fea = self.wns1(fea, mel_mask, g=ge)

        minn = min(mel.shape[1], fea.shape[1])
        mel = mel[:, :minn]
        fea = fea[:, :minn]
        k1, k2 = jax.random.split(rng)
        prompt_max = (mel_lengths * 2) // 3
        prompt_len = (jax.random.uniform(k1, (mel.shape[0],)) * prompt_max).astype(jnp.int32)
        return self.cfm.loss(mel, jnp.minimum(mel_lengths, minn), prompt_len, fea, k2)

    def init_all(self, ssl, spec, spec_lengths, mel, mel_lengths, text, text_lengths):
        loss = self(
            ssl, spec, spec_lengths, mel, mel_lengths, text, text_lengths, rng=self.make_rng("noise")
        )
        codes = self.extract_latent(ssl)
        _ = self.decode_encp(
            codes, jnp.full((codes.shape[0],), codes.shape[1]), text, text_lengths, spec, spec_lengths
        )
        return loss


class SynthesizerTrnV3b(nn.Module):
    """Hybrid GAN + CFM synthesizer (models.py:1276 `SynthesizerTrnV3b`).

    The v1/v2 VITS stack (posterior encoder, flow, HiFiGAN decoder) trains
    jointly with the v3 CFM mel path; an extra `linear_mel` 1x1 head adds a
    direct mel MSE on the wns1 features (models.py:1390-1399). Experimental
    in the reference (no product flow uses it); included for training
    parity completeness.
    """

    cfg: S2Config

    @property
    def dit_config(self) -> DiTConfig:
        c = self.cfg
        return DiTConfig(
            dim=c.cfm_dit_dim, depth=c.cfm_dit_depth, heads=c.cfm_dit_heads,
            ff_mult=2, mel_dim=c.cfm_mel_channels, text_dim=512, conv_layers=4,
        )

    def setup(self):
        from gpt_sovits_tpu.models.vits import Generator, PosteriorEncoder
        from gpt_sovits_tpu.models.vits_modules import ResidualCouplingBlock

        c = self.cfg
        self.enc_p = TextEncoder(c, name="enc_p")
        self.ref_enc = MelStyleEncoder(min(704, c.spec_channels), out_dim=c.gin_channels, name="ref_enc")
        self.dec = Generator(c, name="dec")
        self.enc_q = PosteriorEncoder(c, name="enc_q")
        self.flow = ResidualCouplingBlock(
            c.inter_channels, c.hidden_channels, 5, 1, 4, gin_channels=c.gin_channels, name="flow"
        )
        self.ssl_proj = nn.Conv(c.ssl_dim, (2,), strides=(2,), padding="VALID", name="ssl_proj")
        self.quantizer = VQCodebook(c.n_codes, c.ssl_dim, name="quantizer")
        self.bridge = Conv1d(512, 1, name="bridge")
        self.wns1 = WNEncoder(512, 512, 5, 8, gin_channels=c.gin_channels, name="wns1")
        self.linear_mel = Conv1d(c.cfm_mel_channels, 1, name="linear_mel")
        self.cfm = CFM(self.dit_config, name="cfm")

    def compute_ge(self, refer_spec, refer_mask):
        ref = refer_spec[..., : min(704, self.cfg.spec_channels)]
        return self.ref_enc(ref * refer_mask, refer_mask)

    def extract_latent(self, ssl):
        x = self.ssl_proj(ssl)
        _, codes = self.quantizer(x)
        return codes

    def _fea(self, x, mel_mask, ge):
        fea = nn.leaky_relu(self.bridge(x), 0.01)
        fea = interpolate_nearest(fea, 1.875)
        return self.wns1(fea, mel_mask, g=ge)

    def decode_encp(self, codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths, *, ge=None):
        """models.py:1411: wns1 mask runs at codes*2.5*1.5 (not 3.875)."""
        if ge is None:
            refer_mask = sequence_mask(refer_lengths, refer_spec.shape[1])
            ge = self.compute_ge(refer_spec, refer_mask)
        quantized = jnp.repeat(self.quantizer.decode(codes), 2, axis=1)
        y_mask = sequence_mask(codes_lengths * 2, quantized.shape[1])
        text_mask = sequence_mask(text_lengths, text.shape[1])
        x, _, _, _ = self.enc_p(quantized, y_mask, text, text_mask, ge)
        fea = nn.leaky_relu(self.bridge(x), 0.01)
        fea = interpolate_nearest(fea, 1.875)
        mel_len = (codes_lengths.astype(jnp.float32) * 2.5 * 1.5).astype(jnp.int32)
        fea = self.wns1(fea, sequence_mask(mel_len, fea.shape[1]), g=ge)
        return fea, ge, mel_len

    def __call__(
        self,
        ssl,  # (B, Ts, 768)
        spec,  # (B, T, spec_channels)
        spec_lengths,
        mel,  # (B, Tm, 100) normalized target mel
        mel_lengths,
        text,
        text_lengths,
        *,
        rngs_noise,
        rng_slice,
        rng_cfm,
    ):
        """models.py:1370 forward: GAN pieces + cfm_loss + mel MSE."""
        c = self.cfg
        y_mask = sequence_mask(spec_lengths, spec.shape[1])
        ge = self.compute_ge(spec, y_mask)

        x = self.ssl_proj(ssl)
        quantized, _ = self.quantizer(x)
        commit_loss = jnp.mean((quantized - jax.lax.stop_gradient(x)) ** 2)
        quantized = x + jax.lax.stop_gradient(quantized - x)
        if c.freeze_quantizer:
            quantized = jax.lax.stop_gradient(quantized)
        quantized = jnp.repeat(quantized, 2, axis=1)
        tdiff = spec.shape[1] - quantized.shape[1]
        if tdiff > 0:
            quantized = jnp.pad(quantized, ((0, 0), (0, tdiff), (0, 0)))
        elif tdiff < 0:
            quantized = quantized[:, : spec.shape[1]]
        text_mask = sequence_mask(text_lengths, text.shape[1])
        xh, m_p, logs_p, y_mask = self.enc_p(quantized, y_mask, text, text_mask, ge)

        z, m_q, logs_q = self.enc_q(spec, y_mask, g=ge, rng=rngs_noise)
        z_p = self.flow(z, y_mask, g=ge)
        seg = c.segment_size
        max_starts = jnp.maximum(spec_lengths - seg, 0)
        starts = (jax.random.uniform(rng_slice, (z.shape[0],)) * (max_starts + 1)).astype(jnp.int32)
        z_slice = jax.vmap(lambda zb, s: jax.lax.dynamic_slice(zb, (s, 0), (seg, zb.shape[1])))(z, starts)
        o = self.dec(z_slice, g=ge)

        mel_mask = sequence_mask(mel_lengths, int(quantized.shape[1] * 1.875))
        fea = self._fea(xh, mel_mask, ge)
        learned_mel = self.linear_mel(fea)
        minn = min(mel.shape[1], fea.shape[1])
        k1, k2 = jax.random.split(rng_cfm)
        prompt_max = (mel_lengths * 2) // 3
        prompt_len = (jax.random.uniform(k1, (mel.shape[0],)) * prompt_max).astype(jnp.int32)
        cfm_loss = self.cfm.loss(mel[:, :minn], jnp.minimum(mel_lengths, minn), prompt_len, fea[:, :minn], k2)
        mel_mse = jnp.mean((learned_mel[:, :minn] - mel[:, :minn]) ** 2)

        return {
            "wav_hat": o,
            "commit_loss": commit_loss,
            "cfm_loss": cfm_loss,
            "mel_mse": mel_mse,
            "ids_slice": starts,
            "y_mask": y_mask,
            "z": z,
            "z_p": z_p,
            "m_p": m_p,
            "logs_p": logs_p,
            "m_q": m_q,
            "logs_q": logs_q,
        }

    def init_all(self, ssl, spec, spec_lengths, mel, mel_lengths, text, text_lengths):
        out = self(
            ssl, spec, spec_lengths, mel, mel_lengths, text, text_lengths,
            rngs_noise=self.make_rng("noise"), rng_slice=self.make_rng("noise"), rng_cfm=self.make_rng("noise"),
        )
        codes = self.extract_latent(ssl)
        _ = self.decode_encp(
            codes, jnp.full((codes.shape[0],), codes.shape[1]), text, text_lengths, spec, spec_lengths
        )
        return out


class CFM(nn.Module):
    """Conditional flow matching wrapper over the DiT estimator."""

    dit_cfg: DiTConfig
    sigma_min: float = 1e-6

    def setup(self):
        self.estimator = DiT(self.dit_cfg, name="estimator")

    def loss(self, x1, x_lens, prompt_lens, mu, rng):
        """MSE flow-matching loss with prompt masking + 30% bootstrap
        consistency (models.py:1089-1123). x1: (B,T,mel); mu: (B,T,512)."""
        b, t, _ = x1.shape
        k_t, k_noise, k_boot, k_base = jax.random.split(rng, 4)
        tt = jax.random.uniform(k_t, (b,), dtype=x1.dtype)
        x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
        vt = x1 - x0
        xt = x0 + tt[:, None, None] * vt
        ar = jnp.arange(t)[None, :, None]
        prompt_region = ar < prompt_lens[:, None, None]
        prompt = jnp.where(prompt_region, x1, 0.0)
        xt = jnp.where(prompt_region, 0.0, xt)
        mask = jnp.arange(t)[None, :] < x_lens[:, None]

        use_boot = jax.random.uniform(k_boot, ()) < 0.3
        base = jax.random.randint(k_base, (b,), 2, 8)
        d = 1.0 / (2.0**base).astype(x1.dtype)
        d_input = jnp.where(d < 1e-2, 0.0, d)

        def bootstrap(mdl, _):
            v1, _ = mdl.estimator(xt, prompt, tt, d_input, mu, mask)
            v1 = jax.lax.stop_gradient(v1)
            x_mid = xt + d[:, None, None] * v1
            v2, _ = mdl.estimator(x_mid, prompt, tt + d, d_input, mu, mask)
            v2 = jax.lax.stop_gradient(v2)
            return (v1 + v2) / 2.0, 2.0 * d

        def plain(mdl, _):
            # touch the estimator so both cond branches have identical
            # variable structure (flax nn.cond requirement)
            _ = mdl.estimator(xt, prompt, tt, d_input, mu, mask)
            return vt, jnp.zeros_like(tt)

        target_vt, dt = nn.cond(use_boot, bootstrap, plain, self, None)
        v_pred, _ = self.estimator(xt, prompt, tt, dt, mu, mask)
        # per-sequence MSE over [prompt_len, x_len) then batch mean
        region = (~prompt_region[..., 0]) & mask  # (B, T)
        sq = ((v_pred - target_vt) ** 2).mean(axis=-1)  # (B, T)
        per_seq = (sq * region).sum(axis=1) / jnp.maximum(region.sum(axis=1), 1)
        return per_seq.mean()


def cfm_inference(
    dit: DiT,
    dit_params,
    mu,  # (B, T, 512) conditioning features
    x_lens,
    prompt,  # (B, Tp, mel) normalized reference mel
    rng,
    *,
    n_steps: int = 32,
    temperature: float = 1.0,
    cfg_rate: float = 0.0,
    pad_t_to: int | None = None,  # None: 512 on accelerators, off on CPU
):
    """Euler sampler (models.py:1027-1084) as one lax.scan over a pure
    dit.apply, with the text conditioner computed once (the reference's
    conditioner cache, Changelog +10%). Free function so the scan composes
    with jit without flax lifted transforms."""
    b, t = mu.shape[0], mu.shape[1]
    mel_dim = dit.cfg.mel_dim
    prompt_len = prompt.shape[1]
    # noise always drawn in f32 then cast: the bit-stream-to-normal mapping
    # is dtype-dependent in jax, and the serving dtype (bf16 when half)
    # must not change the sampled trajectory, only its rounding
    x = (jax.random.normal(rng, (b, t, mel_dim)) * temperature).astype(mu.dtype)
    # pad (not .at[].set: that lowers to stablehlo.scatter, which
    # serializes on TPU)
    prompt_x = jnp.pad(prompt.astype(mu.dtype), ((0, 0), (0, t - prompt_len), (0, 0)))
    t_real = t
    # TPU: pad T to a 512 multiple — real frames are numerically unchanged
    # (pad frames are masked in attention and equal 'same'-conv zero
    # padding elsewhere), the MXU tiles cleanly, and the DiT's attention
    # can take the Pallas flash path (block size 512). The reference's
    # T_chunk=934 is an awkward tile size otherwise.
    if pad_t_to is None:
        pad_t_to = 512 if jax.default_backend() != "cpu" else 0
    if pad_t_to and t % pad_t_to:
        t_pad = -t % pad_t_to
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))
        prompt_x = jnp.pad(prompt_x, ((0, 0), (0, t_pad), (0, 0)))
        mu = jnp.pad(mu, ((0, 0), (0, t_pad), (0, 0)))
        t = t + t_pad
    region = jnp.arange(t)[None, :, None] < prompt_len
    x = jnp.where(region, 0.0, x)
    mask = jnp.arange(t)[None, :] < x_lens[:, None]
    d = 1.0 / n_steps
    d_vec = jnp.full((b,), d, mu.dtype)

    # step 0 also produces the cached text embedding
    v0, text_embed = dit.apply(dit_params, x, prompt_x, jnp.zeros((b,), mu.dtype), d_vec, mu, mask)
    neg_text_embed = None
    if cfg_rate > 1e-5:
        n0, neg_text_embed = dit.apply(
            dit_params, x, prompt_x, jnp.zeros((b,), mu.dtype), d_vec, mu, mask,
            drop_audio_cond=True, drop_text=True,
        )
        v0 = v0 + (v0 - n0) * cfg_rate
    x = jnp.where(region, 0.0, x + d * v0)

    def step(carry, i):
        x = carry
        t_vec = jnp.full((b,), i * d, mu.dtype)
        v, _ = dit.apply(dit_params, x, prompt_x, t_vec, d_vec, mu, mask, text_embed_cache=text_embed)
        if neg_text_embed is not None:
            n, _ = dit.apply(
                dit_params, x, prompt_x, t_vec, d_vec, mu, mask,
                drop_audio_cond=True, text_embed_cache=neg_text_embed,
            )
            v = v + (v - n) * cfg_rate
        x = jnp.where(region, 0.0, x + d * v)
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(1, n_steps))
    return x[:, :t_real]
