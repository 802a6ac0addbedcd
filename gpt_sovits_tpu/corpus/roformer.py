"""BS-RoFormer / Mel-Band RoFormer vocal separation, TPU-native.

Re-design of the reference UVR5 RoFormer family
(tools/uvr5/bs_roformer/bs_roformer.py:330 `BSRoformer`,
tools/uvr5/bs_roformer/mel_band_roformer.py `MelBandRoformer`,
loader/demixer tools/uvr5/bsroformer.py:16 `Roformer_Loader`):
axial transformers alternating over time and frequency-band axes on a
band-split complex STFT, predicting complex ratio masks per stem.

TPU mapping: the whole chunk forward is one jitted function — centered
STFT/iSTFT as matmul-DFT (dsp/stft.py), band split/merge as static slices,
the time/freq axial attention as batched dense attention (B·F, T) /
(B·T, F) which XLA tiles onto the MXU.  The chunked demix loop runs fixed
chunk shapes so one compilation serves the whole track (fade-window
overlap-add identical to the reference's demix_track).

Weights: `params_from_torch` maps the public .ckpt state_dicts
(model_bs_roformer_ep_*.ckpt etc.) onto this tree; configs come from the
model YAML or the two embedded defaults (tools/uvr5/bsroformer.py:23-95).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.dsp.mel import mel_filterbank
from gpt_sovits_tpu.dsp.stft import istft_center, stft_center

# Band layout of the public BS-RoFormer checkpoints (bsroformer.py:39).
DEFAULT_FREQS_PER_BANDS = (
    (2,) * 24 + (4,) * 12 + (12,) * 8 + (24,) * 8 + (48,) * 8 + (128, 129)
)


@dataclass(frozen=True)
class RoformerConfig:
    kind: str = "bs"  # "bs" | "mel"
    dim: int = 512
    depth: int = 12
    stereo: bool = True
    num_stems: int = 1
    time_transformer_depth: int = 1
    freq_transformer_depth: int = 1
    linear_transformer_depth: int = 0
    freqs_per_bands: Sequence[int] = DEFAULT_FREQS_PER_BANDS  # bs only
    num_bands: int = 60  # mel only
    dim_head: int = 64
    heads: int = 8
    stft_n_fft: int = 2048
    stft_hop_length: int = 441
    stft_win_length: int = 2048
    sample_rate: int = 44100
    mask_estimator_depth: int = 2
    mlp_expansion_factor: int = 4
    skip_connection: bool = False

    @property
    def audio_channels(self) -> int:
        return 2 if self.stereo else 1

    @property
    def n_freqs(self) -> int:
        return self.stft_n_fft // 2 + 1

    def band_freq_counts(self) -> tuple[int, ...]:
        """Number of STFT bins per band (before channel/complex folding)."""
        if self.kind == "bs":
            counts = tuple(int(f) for f in self.freqs_per_bands)
            if sum(counts) != self.n_freqs:
                raise ValueError(f"freqs_per_bands sums to {sum(counts)}, need {self.n_freqs}")
            return counts
        fpb = _mel_freqs_per_band(self)
        return tuple(int(c) for c in fpb.sum(axis=1))

    def band_dims(self) -> tuple[int, ...]:
        return tuple(2 * f * self.audio_channels for f in self.band_freq_counts())

    @staticmethod
    def from_dict(model_cfg: dict) -> "RoformerConfig":
        kind = "bs" if "freqs_per_bands" in model_cfg else "mel"
        keys = {f.name for f in RoformerConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
        kw = {k: v for k, v in model_cfg.items() if k in keys}
        if "freqs_per_bands" in kw:
            kw["freqs_per_bands"] = tuple(kw["freqs_per_bands"])
        return RoformerConfig(kind=kind, **kw)


def _mel_freqs_per_band(cfg: RoformerConfig) -> np.ndarray:
    """(num_bands, n_freqs) bool membership, mel_band_roformer.py:358-374."""
    fb = mel_filterbank(cfg.sample_rate, cfg.stft_n_fft, cfg.num_bands, 0.0, None).astype(np.float64)
    fb[0, 0] = 1.0
    fb[-1, -1] = 1.0
    mask = fb > 0
    if not mask.any(axis=0).all():
        raise ValueError("mel filterbank leaves uncovered frequencies")
    return mask


def _mel_indices(cfg: RoformerConfig) -> tuple[np.ndarray, np.ndarray]:
    """(freq_indices folded with channels, bands-per-folded-freq denominator)."""
    mask = _mel_freqs_per_band(cfg)
    n_freqs = mask.shape[1]
    idx = np.concatenate([np.nonzero(row)[0] for row in mask])  # band-major
    s = cfg.audio_channels
    if cfg.stereo:
        idx = (idx[:, None] * 2 + np.arange(2)[None, :]).reshape(-1)
    denom = np.repeat(mask.sum(axis=0), s).astype(np.float32)  # (f s)
    return idx.astype(np.int32), denom


class RMSNorm(nn.Module):
    """bs_roformer.py:46 — F.normalize(x) * sqrt(dim) * gamma (eps 1e-12)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x / norm * (self.dim**0.5) * gamma


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack((-x2, x1), axis=-1).reshape(*x.shape[:-2], -1)


def apply_rotary(x: jnp.ndarray, inv_freq: np.ndarray) -> jnp.ndarray:
    """rotary_embedding_torch.rotate_queries_or_keys: interleaved pairs,
    positions 0..N-1 along axis -2."""
    n = x.shape[-2]
    freqs = np.arange(n)[:, None] * inv_freq[None, :]
    freqs = np.repeat(freqs, 2, axis=-1).astype(np.float32)
    cos, sin = jnp.asarray(np.cos(freqs)), jnp.asarray(np.sin(freqs))
    return x * cos + _rotate_half_interleaved(x) * sin


class Attention(nn.Module):
    """Gated softmax attention (bs_roformer.py:76)."""

    dim: int
    heads: int
    dim_head: int
    rotary: bool = True

    @nn.compact
    def __call__(self, x):
        h, dh = self.heads, self.dim_head
        y = RMSNorm(self.dim, name="norm")(x)
        qkv = nn.Dense(3 * h * dh, use_bias=False, name="to_qkv")(y)
        b, n = qkv.shape[0], qkv.shape[1]
        q, k, v = [
            t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        ]
        if self.rotary:
            inv_freq = 1.0 / (10000.0 ** (np.arange(0, dh, 2) / dh))
            q = apply_rotary(q, inv_freq)
            k = apply_rotary(k, inv_freq)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * (dh**-0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        gates = nn.Dense(h, name="to_gates")(y)  # (b, n, h)
        out = out * jax.nn.sigmoid(gates).transpose(0, 2, 1)[..., None]
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        x = RMSNorm(self.dim, name="norm")(x)
        x = nn.Dense(self.dim * self.mult, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class Transformer(nn.Module):
    """norm_output=False in the bs variant (final_norm applied once at the
    end, bs_roformer.py:383/401); True (per-block RMSNorm) in the mel
    variant, which has no final_norm."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    norm_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = Attention(self.dim, self.heads, self.dim_head, name=f"attn_{i}")(x) + x
            x = FeedForward(self.dim, name=f"ff_{i}")(x) + x
        if self.norm_output:
            x = RMSNorm(self.dim, name="norm")(x)
        return x


class BandSplit(nn.Module):
    dim: int
    dim_inputs: Sequence[int]

    @nn.compact
    def __call__(self, x):
        """(B, T, sum dims) -> (B, T, n_bands, dim)."""
        outs, ofs = [], 0
        for i, d in enumerate(self.dim_inputs):
            seg = x[..., ofs : ofs + d]
            seg = RMSNorm(d, name=f"norm_{i}")(seg)
            outs.append(nn.Dense(self.dim, name=f"proj_{i}")(seg))
            ofs += d
        return jnp.stack(outs, axis=-2)


class MaskEstimator(nn.Module):
    """Per-band MLP + GLU. `n_hidden` differs between the two reference
    variants: bs_roformer.py:216 uses depth-1 hidden layers, the mel-band
    file's MLP uses depth (one extra Linear)."""

    dim: int
    dim_inputs: Sequence[int]
    n_hidden: int
    expansion: int

    @nn.compact
    def __call__(self, x):
        """(B, T, n_bands, dim) -> (B, T, sum dims)."""
        hidden = self.dim * self.expansion
        outs = []
        for i, d in enumerate(self.dim_inputs):
            h = x[..., i, :]
            for j in range(self.n_hidden):
                h = jnp.tanh(nn.Dense(hidden, name=f"band{i}_fc{j}")(h))
            h = nn.Dense(d * 2, name=f"band{i}_fc{self.n_hidden}")(h)
            a, b = jnp.split(h, 2, axis=-1)
            outs.append(a * jax.nn.sigmoid(b))  # GLU
        return jnp.concatenate(outs, axis=-1)


class Roformer(nn.Module):
    """One full separation forward on a fixed-length chunk.

    Input (B, S, L) waveform -> (B, num_stems, S, L) estimated stems.
    """

    cfg: RoformerConfig

    @nn.compact
    def __call__(self, raw_audio: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.linear_transformer_depth:
            raise NotImplementedError("linear transformer stages are unused by the product checkpoints")
        B, S, L = raw_audio.shape
        assert S == cfg.audio_channels, (S, cfg.audio_channels)
        dims = cfg.band_dims()

        z = stft_center(raw_audio.reshape(B * S, L), cfg.stft_n_fft, cfg.stft_hop_length, cfg.stft_win_length)
        F_, T = z.shape[-2], z.shape[-1]
        z = z.reshape(B, S, F_, T)
        # fold channels into frequency, f-major: (B, (f s), T)
        z = z.transpose(0, 2, 1, 3).reshape(B, F_ * S, T)

        if cfg.kind == "mel":
            idx, denom = _mel_indices(cfg)
            zx = z[:, idx]  # (B, n_sel, T) complex, band-major
        else:
            zx = z
        # (B, T, (f s c)) feature layout
        x = jnp.stack([jnp.real(zx), jnp.imag(zx)], axis=-1)  # (B, F', T, 2)
        x = x.transpose(0, 2, 1, 3).reshape(B, T, -1)

        x = BandSplit(cfg.dim, dims, name="band_split")(x)

        store = []
        for i in range(cfg.depth):
            if cfg.skip_connection:
                for prev in store:
                    x = x + prev
            nb = x.shape[-2]
            no = cfg.kind == "mel"
            # time attention over (B·F, T)
            xt = x.transpose(0, 2, 1, 3).reshape(B * nb, T, cfg.dim)
            xt = Transformer(cfg.dim, cfg.time_transformer_depth, cfg.heads, cfg.dim_head, no, name=f"time_{i}")(xt)
            x = xt.reshape(B, nb, T, cfg.dim).transpose(0, 2, 1, 3)
            # freq attention over (B·T, F)
            xf = x.reshape(B * T, nb, cfg.dim)
            xf = Transformer(cfg.dim, cfg.freq_transformer_depth, cfg.heads, cfg.dim_head, no, name=f"freq_{i}")(xf)
            x = xf.reshape(B, T, nb, cfg.dim)
            if cfg.skip_connection:
                store.append(x)

        if cfg.kind == "bs":
            x = RMSNorm(cfg.dim, name="final_norm")(x)

        n_hidden = cfg.mask_estimator_depth - (1 if cfg.kind == "bs" else 0)
        masks = []
        for n in range(cfg.num_stems):
            m = MaskEstimator(cfg.dim, dims, n_hidden, cfg.mlp_expansion_factor, name=f"mask_{n}")(x)
            m = m.reshape(B, T, -1, 2)  # (B, T, F', 2)
            masks.append((m[..., 0] + 1j * m[..., 1]).transpose(0, 2, 1))  # (B, F', T)
        mask = jnp.stack(masks, axis=1).astype(jnp.complex64)  # (B, N, F', T)

        if cfg.kind == "mel":
            summed = jnp.zeros((B, cfg.num_stems, F_ * S, T), jnp.complex64)
            summed = summed.at[:, :, idx, :].add(mask)
            mask = summed / jnp.maximum(jnp.asarray(denom), 1e-8)[None, None, :, None]

        out = z[:, None, :, :] * mask  # (B, N, (f s), T)
        out = out.reshape(B, cfg.num_stems, F_, S, T).transpose(0, 1, 3, 2, 4)
        out = out.reshape(B * cfg.num_stems * S, F_, T)
        wav = istft_center(out, cfg.stft_n_fft, cfg.stft_hop_length, cfg.stft_win_length, length=L)
        return wav.reshape(B, cfg.num_stems, S, L)


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------


def params_from_torch(state_dict: dict, cfg: RoformerConfig) -> dict:
    """Map a reference BSRoformer/MelBandRoformer state_dict to this tree."""

    def g(name):
        v = state_dict[name]
        return jnp.asarray(np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32))

    def dense(prefix, bias=True):
        p = {"kernel": g(prefix + ".weight").T}
        if bias:
            p["bias"] = g(prefix + ".bias")
        return p

    dims = cfg.band_dims()
    params: dict = {}

    bs = {}
    for i in range(len(dims)):
        bs[f"norm_{i}"] = {"gamma": g(f"band_split.to_features.{i}.0.gamma")}
        bs[f"proj_{i}"] = dense(f"band_split.to_features.{i}.1")
    params["band_split"] = bs

    n_linear = 1 if cfg.linear_transformer_depth else 0
    for i in range(cfg.depth):
        for kind, depth, mod_idx in (
            ("time", cfg.time_transformer_depth, n_linear),
            ("freq", cfg.freq_transformer_depth, n_linear + 1),
        ):
            tr = {}
            for j in range(depth):
                pre = f"layers.{i}.{mod_idx}.layers.{j}"
                tr[f"attn_{j}"] = {
                    "norm": {"gamma": g(f"{pre}.0.norm.gamma")},
                    "to_qkv": dense(f"{pre}.0.to_qkv", bias=False),
                    "to_gates": dense(f"{pre}.0.to_gates"),
                    "to_out": dense(f"{pre}.0.to_out.0", bias=False),
                }
                tr[f"ff_{j}"] = {
                    "norm": {"gamma": g(f"{pre}.1.net.0.gamma")},
                    "fc1": dense(f"{pre}.1.net.1"),
                    "fc2": dense(f"{pre}.1.net.4"),
                }
            if cfg.kind == "mel":  # per-block output RMSNorm (norm_output=True)
                tr["norm"] = {"gamma": g(f"layers.{i}.{mod_idx}.norm.gamma")}
            params[f"{kind}_{i}"] = tr

    if cfg.kind == "bs":
        params["final_norm"] = {"gamma": g("final_norm.gamma")}

    n_hidden = cfg.mask_estimator_depth - (1 if cfg.kind == "bs" else 0)
    for n in range(cfg.num_stems):
        me = {}
        for i in range(len(dims)):
            for j in range(n_hidden + 1):
                me[f"band{i}_fc{j}"] = dense(f"mask_estimators.{n}.to_freqs.{i}.0.{2 * j}")
        params[f"mask_{n}"] = me

    return params


# ---------------------------------------------------------------------------
# Chunked demix (fade-window overlap-add; bsroformer.py:111 demix_track)
# ---------------------------------------------------------------------------


def demix(
    apply_fn,
    mix: np.ndarray,
    *,
    chunk_size: int = 352800,
    num_overlap: int = 2,
    batch_size: int = 2,
    num_stems: int = 1,
) -> np.ndarray:
    """apply_fn: (B, S, chunk) -> (B, N, S, chunk) jitted model closure.

    mix (S, L) -> (N, S, L). Reflect-pads `border` on both ends, runs fixed
    chunk shapes, fade-in/out windows kill edge clicks. (The fade window is
    chosen per chunk here; the reference picks it per flushed batch, a
    harmless quirk since the overlap-add is counter-normalized either way.)
    """
    C = chunk_size
    step = C // num_overlap
    border = C - step
    fade = C // 10
    S, length_init = mix.shape

    if length_init > 2 * border and border > 0:
        mix = np.pad(mix, ((0, 0), (border, border)), mode="reflect")

    w_start, w_mid, w_fin = np.ones(C), np.ones(C), np.ones(C)
    w_start[-fade:] = np.linspace(1, 0, fade)
    w_fin[:fade] = np.linspace(0, 1, fade)
    w_mid[-fade:] = np.linspace(1, 0, fade)
    w_mid[:fade] = np.linspace(0, 1, fade)

    result = np.zeros((num_stems, S, mix.shape[-1]), np.float32)
    counter = np.zeros_like(result)

    batch, locs = [], []
    i = 0
    total = mix.shape[-1]
    while i < total:
        part = mix[:, i : i + C]
        ln = part.shape[-1]
        if ln < C:
            pad_mode = "reflect" if ln > C // 2 + 1 else "constant"
            part = np.pad(part, ((0, 0), (0, C - ln)), mode=pad_mode)
        batch.append(part)
        locs.append((i, ln))
        i += step
        if len(batch) >= batch_size or i >= total:
            n = len(batch)
            while len(batch) < batch_size:  # keep the compiled shape
                batch.append(np.zeros_like(batch[0]))
            out = np.asarray(apply_fn(jnp.asarray(np.stack(batch), jnp.float32)))[:n]
            for j, (start, ln) in enumerate(locs):
                if start == 0:
                    w = w_start
                elif i >= total and j == len(locs) - 1:
                    w = w_fin
                else:
                    w = w_mid
                result[..., start : start + ln] += out[j][..., :ln] * w[:ln]
                counter[..., start : start + ln] += w[:ln]
            batch, locs = [], []

    est = result / np.maximum(counter, 1e-10)
    est = np.nan_to_num(est, nan=0.0)
    if length_init > 2 * border and border > 0:
        est = est[..., border:-border]
    return est


# ---------------------------------------------------------------------------
# Loader / one-call separation (tools/uvr5/bsroformer.py Roformer_Loader)
# ---------------------------------------------------------------------------

# Defaults for checkpoints shipped without a YAML (bsroformer.py:23-95).
DEFAULT_BS_AUDIO = {"chunk_size": 352800, "sample_rate": 44100}
DEFAULT_BS_INFER = {"batch_size": 2, "num_overlap": 2}
DEFAULT_MEL_MODEL = dict(
    dim=384, depth=12, stereo=True, num_stems=1,
    time_transformer_depth=1, freq_transformer_depth=1, num_bands=60,
    dim_head=64, heads=8, sample_rate=44100,
    stft_n_fft=2048, stft_hop_length=441, stft_win_length=2048,
    mask_estimator_depth=2,
)
DEFAULT_BS_MODEL = dict(
    dim=512, depth=12, stereo=True, num_stems=1,
    time_transformer_depth=1, freq_transformer_depth=1,
    freqs_per_bands=DEFAULT_FREQS_PER_BANDS,
    dim_head=64, heads=8,
    stft_n_fft=2048, stft_hop_length=441, stft_win_length=2048,
    mask_estimator_depth=2,
)


def load_roformer(model_path: str, config_path: Optional[str] = None):
    """-> (Roformer module, params, audio cfg dict, inference cfg dict)."""
    import os

    from gpt_sovits_tpu.utils.checkpoint_compat import load_torch_checkpoint

    name = os.path.basename(model_path).lower()
    is_mel = "mel_band_roformer" in name or "melbandroformer" in name
    audio, infer = dict(DEFAULT_BS_AUDIO), dict(DEFAULT_BS_INFER)
    if config_path and os.path.exists(config_path):
        import yaml

        with open(config_path, encoding="utf-8") as f:
            y = yaml.load(f, Loader=yaml.FullLoader)
        model_cfg = dict(y["model"])
        audio.update(y.get("audio", {}))
        infer.update(y.get("inference", {}))
    else:
        model_cfg = dict(DEFAULT_MEL_MODEL if is_mel else DEFAULT_BS_MODEL)
    cfg = RoformerConfig.from_dict(model_cfg)
    sd = load_torch_checkpoint(model_path)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = params_from_torch(sd, cfg)
    return Roformer(cfg), params, audio, infer


def separate(
    wav: np.ndarray, sr: int, model_path: str, *, config_path: Optional[str] = None
) -> tuple[np.ndarray, np.ndarray]:
    """(L,) or (S, L) waveform -> (vocals, other) at the input rate."""
    from gpt_sovits_tpu.dsp.audio_io import resample

    model, params, audio, infer = load_roformer(model_path, config_path)
    cfg = model.cfg
    model_sr = audio.get("sample_rate", 44100)

    mono_in = wav.ndim == 1
    x = wav[None, :] if mono_in else np.asarray(wav, np.float32)
    if sr != model_sr:
        x = np.stack([resample(c, sr, model_sr) for c in x])
    if cfg.stereo and x.shape[0] == 1:
        x = np.repeat(x, 2, axis=0)
    if not cfg.stereo and x.shape[0] > 1:
        x = x.mean(axis=0, keepdims=True)

    # params as a jit argument (closure arrays embed into the compiled HLO)
    _fwd = jax.jit(lambda p, w: model.apply({"params": p}, w))
    fwd = lambda w: _fwd(params, w)
    est = demix(
        fwd,
        x,
        chunk_size=int(audio.get("chunk_size", 352800)),
        num_overlap=int(infer.get("num_overlap", 2)),
        batch_size=int(infer.get("batch_size", 2)),
        num_stems=cfg.num_stems,
    )
    vocals = est[0]
    other = x - vocals
    if sr != model_sr:
        vocals = np.stack([resample(c, model_sr, sr) for c in vocals])
        other = np.stack([resample(c, model_sr, sr) for c in other])

    def fit(a, n):  # double-resampling can drift by a sample; pin to input len
        return a[..., :n] if a.shape[-1] >= n else np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])])

    n_in = wav.shape[-1]
    vocals, other = fit(vocals, n_in), fit(other, n_in)
    if mono_in:
        vocals, other = vocals.mean(axis=0), other.mean(axis=0)
    return vocals.astype(np.float32), other.astype(np.float32)
