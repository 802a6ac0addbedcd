"""ERes2NetV2 speaker-verification embedder (v2Pro timbre conditioning).

Re-design of GPT_SoVITS/eres2net/ERes2NetV2.py:152 (+ fusion.py AFF,
kaldi.py fbank) in JAX/flax. The serving entry is `forward3`
(ERes2NetV2.py:240, used via sv.py compute_embedding3): 80-bin kaldi fbank
-> ERes2NetV2(baseWidth=24, scale=4, expansion=4) -> bottom-up fused map
flattened over (C, F) and averaged over time -> 20480-d embedding.

Inference-only (running BatchNorm stats folded in at weight import).
Layout: images are (B, T, F, C) — NHWC with H=time, W=freq.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# kaldi fbank (ref eres2net/kaldi.py, dither=0, 80 mel bins, 16 kHz)
# ---------------------------------------------------------------------------


def _povey_window(n: int) -> np.ndarray:
    a = 2 * np.pi / (n - 1)
    return (0.5 - 0.5 * np.cos(a * np.arange(n))) ** 0.85


def kaldi_fbank(
    wav: jnp.ndarray,  # (B, L) float in [-1, 1]
    *,
    num_mel_bins: int = 80,
    sample_frequency: int = 16000,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    energy_floor: float = 1.0,
) -> jnp.ndarray:
    """Kaldi-compatible log-mel filterbank features, (B, T, num_mel_bins).

    Matches torchaudio/kaldi fbank with dither=0, snip_edges=True, povey
    window, HTK mel scale on an asymmetric-round FFT size."""
    frame_len = int(sample_frequency * frame_length_ms / 1000)  # 400
    frame_shift = int(sample_frequency * frame_shift_ms / 1000)  # 160
    n_fft = 1 << (frame_len - 1).bit_length()  # 512

    # NB: unlike classic kaldi, the reference feeds the float wav unscaled
    # (sv.py:24-33 passes the [-1,1] waveform straight to fbank)
    b, l = wav.shape
    num_frames = 1 + (l - frame_len) // frame_shift
    idx = np.arange(num_frames)[:, None] * frame_shift + np.arange(frame_len)[None, :]
    frames = wav[:, idx]  # (B, T, frame_len)
    if remove_dc_offset:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    # preemphasis with first sample replicated (kaldi convention)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(_povey_window(frame_len), dtype=frames.dtype)

    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, T, n_fft//2+1)

    fb = _kaldi_mel_banks(num_mel_bins, n_fft, sample_frequency)
    mel = jnp.einsum("btf,mf->btm", power, jnp.asarray(fb))
    return jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))  # eps as in kaldi.py


def _kaldi_mel_banks(num_bins: int, n_fft: int, sr: int) -> np.ndarray:
    """Kaldi mel banks: HTK mel scale, triangular, NO area normalization,
    last fft bin excluded (kaldi uses n_fft//2 bins)."""

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    low_freq, high_freq = 20.0, sr / 2.0
    mel_low, mel_high = mel(low_freq), mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    fft_freqs = np.arange(n_fft // 2 + 1) * sr / n_fft
    fft_mel = mel(fft_freqs)
    banks = np.zeros((num_bins, n_fft // 2 + 1), dtype=np.float64)
    for m in range(num_bins):
        left = mel_low + m * mel_delta
        center = mel_low + (m + 1) * mel_delta
        right = mel_low + (m + 2) * mel_delta
        up = (fft_mel - left) / (center - left)
        down = (right - fft_mel) / (right - center)
        banks[m] = np.clip(np.minimum(up, down), 0.0, None)
    banks[:, -1] = 0.0  # kaldi drops the nyquist bin
    return banks.astype(np.float32)


# ---------------------------------------------------------------------------
# network
# ---------------------------------------------------------------------------


def relu20(x):
    return jnp.clip(x, 0.0, 20.0)  # ref ReLU = Hardtanh(0, 20)


class _BN(nn.Module):
    """Inference BatchNorm: y = (x - mean) / sqrt(var+eps) * gamma + beta.
    Stats live in params (folded at import)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class AFF(nn.Module):
    """Attentional feature fusion (ref eres2net/fusion.py:9)."""

    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, ds_y):
        inter = self.channels // self.r
        xa = jnp.concatenate([x, ds_y], axis=-1)
        h = nn.Conv(inter, (1, 1), use_bias=True, name="conv1")(xa)
        h = _BN(inter, name="bn1")(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (1, 1), use_bias=True, name="conv2")(h)
        h = _BN(self.channels, name="bn2")(h)
        att = 1.0 + jnp.tanh(h)
        return x * att + ds_y * (2.0 - att)


class BasicBlock(nn.Module):
    """Res2Net block; fuse=True adds AFF between scale branches
    (ref BasicBlockERes2NetV2 / ...AFF)."""

    in_planes: int
    planes: int
    stride: int = 1
    base_width: int = 26
    scale: int = 2
    expansion: int = 2
    fuse: bool = False

    @nn.compact
    def __call__(self, x):
        width = int(np.floor(self.planes * (self.base_width / 64.0)))
        out = nn.Conv(width * self.scale, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="conv1")(x)
        out = relu20(_BN(width * self.scale, name="bn1")(out))
        parts = jnp.split(out, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(self.scale):
            if i == 0:
                sp = parts[i]
            elif self.fuse:
                sp = AFF(width, name=f"fuse_{i - 1}")(sp, parts[i])
            else:
                sp = sp + parts[i]
            sp = nn.Conv(width, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name=f"conv_{i}")(sp)
            sp = relu20(_BN(width, name=f"bn_{i}")(sp))
            outs.append(sp)
        out = jnp.concatenate(outs, axis=-1)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, name="conv3")(out)
        out = _BN(self.planes * self.expansion, name="bn3")(out)
        if self.stride != 1 or self.in_planes != self.expansion * self.planes:
            sc = nn.Conv(
                self.expansion * self.planes, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="sc_conv"
            )(x)
            sc = _BN(self.expansion * self.planes, name="sc_bn")(sc)
        else:
            sc = x
        return relu20(out + sc)


@dataclass(frozen=True)
class ERes2NetConfig:
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    m_channels: int = 64
    feat_dim: int = 80
    base_width: int = 24
    scale: int = 4
    expansion: int = 4


class ERes2NetV2(nn.Module):
    cfg: ERes2NetConfig = ERes2NetConfig()

    @nn.compact
    def __call__(self, feat):
        """feat: (B, T, 80) kaldi fbank -> (B, 20480) sv embedding
        (forward3, ERes2NetV2.py:240)."""
        c = self.cfg
        # (B,T,F) -> (B,F,T) -> NHWC with H=F, W=T, C=1 matching ref layout
        x = jnp.swapaxes(feat, 1, 2)[..., None]  # (B, F, T, 1)
        x = nn.Conv(c.m_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        x = relu20(_BN(c.m_channels, name="bn1")(x))

        in_planes = c.m_channels
        outs = {}
        for li, (planes_mult, n_blocks, stride, fuse) in enumerate(
            [(1, c.num_blocks[0], 1, False), (2, c.num_blocks[1], 2, False),
             (4, c.num_blocks[2], 2, True), (8, c.num_blocks[3], 2, True)]
        ):
            planes = c.m_channels * planes_mult
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                x = BasicBlock(
                    in_planes, planes, s, c.base_width, c.scale, c.expansion, fuse,
                    name=f"layer{li + 1}_{bi}",
                )(x)
                in_planes = planes * c.expansion
            outs[li + 1] = x

        out3_ds = nn.Conv(
            c.m_channels * 8 * c.expansion, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, name="layer3_ds",
        )(outs[3])
        fused = AFF(c.m_channels * 8 * c.expansion, name="fuse34")(outs[4], out3_ds)
        # (B, F', T', C) -> flatten (C, F') per ref (B,C,F,T).flatten(1,2).mean(-1)
        b, fdim, tdim, ch = fused.shape
        flat = jnp.transpose(fused, (0, 3, 1, 2)).reshape(b, ch * fdim, tdim)
        return flat.mean(axis=-1)


# ---------------------------------------------------------------------------
# torch weight import (pretrained_eres2netv2w24s4ep4.ckpt)
# ---------------------------------------------------------------------------


def _bn(sd, pre):
    def g(k):
        return jnp.asarray(np.asarray(sd[f"{pre}.{k}"], dtype=np.float32))

    return {"scale": g("weight"), "bias": g("bias"), "mean": g("running_mean"), "var": g("running_var")}


def _conv2d(sd, pre):
    w = np.asarray(sd[f"{pre}.weight"], dtype=np.float32)  # (out,in,kh,kw)
    out = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if f"{pre}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{pre}.bias"], dtype=np.float32))
    return out


def _aff(sd, pre):
    return {
        "conv1": _conv2d(sd, f"{pre}.local_att.0"),
        "bn1": _bn(sd, f"{pre}.local_att.1"),
        "conv2": _conv2d(sd, f"{pre}.local_att.3"),
        "bn2": _bn(sd, f"{pre}.local_att.4"),
    }


def params_from_torch(state_dict: dict, cfg: ERes2NetConfig = ERes2NetConfig()) -> dict:
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in state_dict.items()}
    p: dict[str, Any] = {"conv1": _conv2d(sd, "conv1"), "bn1": _bn(sd, "bn1")}
    in_planes = cfg.m_channels
    for li, (mult, n_blocks, fuse) in enumerate(
        [(1, cfg.num_blocks[0], False), (2, cfg.num_blocks[1], False),
         (4, cfg.num_blocks[2], True), (8, cfg.num_blocks[3], True)]
    ):
        planes = cfg.m_channels * mult
        for bi in range(n_blocks):
            pre = f"layer{li + 1}.{bi}"
            blk: dict[str, Any] = {
                "conv1": _conv2d(sd, f"{pre}.conv1"),
                "bn1": _bn(sd, f"{pre}.bn1"),
                "conv3": _conv2d(sd, f"{pre}.conv3"),
                "bn3": _bn(sd, f"{pre}.bn3"),
            }
            for i in range(cfg.scale):
                blk[f"conv_{i}"] = _conv2d(sd, f"{pre}.convs.{i}")
                blk[f"bn_{i}"] = _bn(sd, f"{pre}.bns.{i}")
            if fuse:
                for j in range(cfg.scale - 1):
                    blk[f"fuse_{j}"] = _aff(sd, f"{pre}.fuse_models.{j}")
            stride = 1 if li == 0 or bi > 0 else 2
            if stride != 1 or in_planes != cfg.expansion * planes:
                blk["sc_conv"] = _conv2d(sd, f"{pre}.shortcut.0")
                blk["sc_bn"] = _bn(sd, f"{pre}.shortcut.1")
            p[f"layer{li + 1}_{bi}"] = blk
            in_planes = planes * cfg.expansion
    p["layer3_ds"] = _conv2d(sd, "layer3_ds")
    p["fuse34"] = _aff(sd, "fuse34")
    return {"params": p}
