"""Denoising for corpus preparation.

Counterpart of tools/cmd-denoise.py (modelscope FRCRN pipeline). Three
tiers, best available wins (`denoise` dispatches):
  1. native FRCRN (models/frcrn.py, flax) when a checkpoint is present —
     the same model family the reference downloads via modelscope
     (damo/speech_frcrn_ans_cirm_16k), no modelscope required;
  2. the modelscope pipeline itself when installed (`denoise_modelscope`);
  3. `spectral_gate`, a self-contained noise-profile spectral-subtraction
     denoiser that covers the common case (steady background noise)
     without any external weights.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def spectral_gate(
    wav: np.ndarray,
    sr: int,
    *,
    n_fft: int = 1024,
    hop: int = 256,
    noise_frames: int = 20,
    reduction_db: float = 18.0,
    smoothing: int = 2,
) -> np.ndarray:
    """Spectral gating: estimate a noise floor from the quietest frames and
    attenuate bins below floor+threshold. Pure numpy, streaming-safe."""
    wav = np.asarray(wav, np.float32)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    pad = n_fft // 2
    x = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * win
    spec = np.fft.rfft(frames, axis=-1)
    mag = np.abs(spec)

    # noise profile from the lowest-energy frames (speech pauses)
    energy = mag.sum(axis=1)
    quiet = np.argsort(energy)[: max(noise_frames, 1)]
    noise_floor = mag[quiet].mean(axis=0, keepdims=True)

    # over-subtraction with a gain floor (classic spectral subtraction)
    alpha = 1.5
    floor_gain = 10 ** (-reduction_db / 20.0)
    gain = np.clip(1.0 - alpha * noise_floor / np.maximum(mag, 1e-9), floor_gain, 1.0)
    # temporal smoothing of the gain to avoid musical noise
    if smoothing > 0:
        kernel = np.ones(2 * smoothing + 1) / (2 * smoothing + 1)
        gain = np.apply_along_axis(lambda g: np.convolve(g, kernel, mode="same"), 0, gain)

    spec_dn = spec * gain
    frames_dn = np.fft.irfft(spec_dn, n=n_fft, axis=-1) * win
    out = np.zeros(len(x), np.float32)
    wsum = np.zeros(len(x), np.float32)
    for i in range(n_frames):
        s = i * hop
        out[s : s + n_fft] += frames_dn[i]
        wsum[s : s + n_fft] += win * win
    out = out / np.maximum(wsum, 1e-8)
    return out[pad : pad + len(wav)]


_FRCRN_CACHE: dict = {}


def denoise_frcrn(wav: np.ndarray, sr: int, ckpt_path: str) -> np.ndarray:
    """Denoise with the native FRCRN (models/frcrn.py). Resamples to the
    model's 16 kHz, runs the complex-mask network, resamples back."""
    import jax.numpy as jnp

    from gpt_sovits_tpu.dsp.audio_io import resample

    if ckpt_path not in _FRCRN_CACHE:
        from gpt_sovits_tpu.models.frcrn import load_frcrn

        _FRCRN_CACHE.clear()  # one model at a time: corpus tools are batch jobs
        _FRCRN_CACHE[ckpt_path] = load_frcrn(ckpt_path)
    model, params = _FRCRN_CACHE[ckpt_path]
    wav = np.asarray(wav, np.float32)
    x = resample(wav, sr, 16000) if sr != 16000 else wav
    out, _ = model.apply(params, jnp.asarray(x[None]))
    out = np.asarray(out)[0]
    return resample(out, 16000, sr)[: len(wav)] if sr != 16000 else out


def denoise(wav: np.ndarray, sr: int, ckpt_path: Optional[str] = None) -> np.ndarray:
    """Best-available denoise: FRCRN when a checkpoint is given (or found
    at $GSVT_FRCRN_CKPT), spectral gate otherwise."""
    ckpt_path = ckpt_path or os.environ.get("GSVT_FRCRN_CKPT")
    if ckpt_path and os.path.exists(ckpt_path):
        return denoise_frcrn(wav, sr, ckpt_path)
    return spectral_gate(wav, sr)


def denoise_modelscope(wav_path: str, out_path: str) -> str:
    """FRCRN denoise via modelscope when installed (tools/cmd-denoise.py)."""
    try:
        from modelscope.pipelines import pipeline
    except ImportError as e:
        raise ImportError("modelscope is not installed; use spectral_gate or install modelscope") from e
    p = pipeline("acoustic-noise-suppression", model="damo/speech_frcrn_ans_cirm_16k")
    p(wav_path, output_path=out_path)
    return out_path
