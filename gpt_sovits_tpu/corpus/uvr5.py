"""Vocal separation interface (UVR5 family).

Counterpart of tools/uvr5/ (VR spectrogram-mask CNNs, MDX-Net ONNX,
BS/Mel-RoFormer — 5.1 kLoC of vendored model code plus ~1 GB of weights).
Those pretrained models are not redistributable with this framework; this
module defines the separation interface, routes to installed backends
(audio-separator covers all three families), and provides an HPSS-based
vocal-emphasis fallback for roughly pre-cleaning music-bed recordings.
"""

from __future__ import annotations

import numpy as np


def separate_vocals(wav: np.ndarray, sr: int, *, backend: str = "auto") -> tuple[np.ndarray, np.ndarray]:
    """-> (vocals, accompaniment). backend: auto|audio-separator|hpss."""
    if backend in ("auto", "audio-separator"):
        try:
            return _separate_audio_separator(wav, sr)
        except ImportError:
            if backend == "audio-separator":
                raise
    return hpss_vocal_emphasis(wav, sr)


def _separate_audio_separator(wav: np.ndarray, sr: int):
    try:
        from audio_separator.separator import Separator  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "no neural separation backend installed (pip install audio-separator); "
            "falling back to HPSS is available via backend='hpss'"
        ) from e
    raise NotImplementedError("wire audio-separator here when the package+weights are present")


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
