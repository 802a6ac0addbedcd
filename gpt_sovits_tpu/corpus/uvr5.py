"""Vocal separation interface (UVR5 family).

Counterpart of tools/uvr5/ (VR spectrogram-mask CNNs, MDX-Net ONNX,
BS/Mel-RoFormer). The neural separators are implemented natively:
BS/Mel-Band RoFormer in corpus/roformer.py and the VR cascaded-mask CNNs
in corpus/vr.py, both loading the public UVR5 checkpoints directly.  This
module is the router: given a model file it picks the family the same way
the reference webui does (tools/uvr5/webui.py:45), and provides an
HPSS-based weights-free vocal-emphasis fallback.
"""

from __future__ import annotations

import os

import numpy as np


def separate_vocals(
    wav: np.ndarray,
    sr: int,
    *,
    backend: str = "auto",
    model_path: str | None = None,
    config_path: str | None = None,
    agg: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (vocals, accompaniment) at the input rate. backend:
    auto|roformer|vr|hpss; `auto` routes by the model filename like the
    reference webui (roformer substrings -> RoFormer, else VR), or HPSS
    when no model file is given."""
    if model_path and backend in ("auto", "roformer", "vr", "mdx"):
        name = os.path.basename(model_path).lower()
        is_rof = backend == "roformer" or any(
            k in name for k in ("bs_roformer", "bsroformer", "mel_band_roformer", "melbandroformer")
        )
        if is_rof:
            from gpt_sovits_tpu.corpus.roformer import separate as rof_separate

            return rof_separate(wav, sr, model_path, config_path=config_path)
        if backend == "mdx" or name.endswith(".onnx"):
            from gpt_sovits_tpu.corpus.mdx import separate as mdx_separate

            return mdx_separate(wav, sr, model_path)
        from gpt_sovits_tpu.corpus.vr import separate as vr_separate

        return vr_separate(wav, sr, model_path, agg=agg)
    if backend not in ("auto", "hpss"):
        raise ValueError(f"backend {backend!r} needs model_path")
    return hpss_vocal_emphasis(wav, sr)


def hpss_vocal_emphasis(
    wav: np.ndarray, sr: int, *, n_fft: int = 2048, hop: int = 512, kernel: int = 17, power: float = 2.0
) -> tuple[np.ndarray, np.ndarray]:
    """Harmonic/percussive median-filter separation (Fitzgerald 2010):
    vocals ride mostly in the harmonic component. A weights-free stand-in
    for UVR5 — useful as a pre-clean, not a studio-quality split."""
    wav = np.asarray(wav, np.float32)
    win = np.hanning(n_fft + 1)[:-1]
    pad = n_fft // 2
    x = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    spec = np.fft.rfft(x[idx] * win, axis=-1)  # (T, F)
    mag = np.abs(spec)

    def med_filt(a, k, axis):
        from scipy.ndimage import median_filter

        size = [1, 1]
        size[axis] = k
        return median_filter(a, size=tuple(size), mode="nearest")

    harm = med_filt(mag, kernel, axis=0)  # smooth over time -> harmonic
    perc = med_filt(mag, kernel, axis=1)  # smooth over freq -> percussive
    hp = harm**power
    pp = perc**power
    mask_h = hp / np.maximum(hp + pp, 1e-9)

    def resynth(masked):
        frames = np.fft.irfft(masked, n=n_fft, axis=-1) * win
        out = np.zeros(len(x), np.float32)
        wsum = np.zeros(len(x), np.float32)
        for i in range(n_frames):
            s = i * hop
            out[s : s + n_fft] += frames[i]
            wsum[s : s + n_fft] += win * win
        return (out / np.maximum(wsum, 1e-8))[pad : pad + len(wav)].astype(np.float32)

    vocals = resynth(spec * mask_h)
    other = resynth(spec * (1.0 - mask_h))
    return vocals, other
