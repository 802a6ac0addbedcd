"""STFT / mel-spectrogram primitives, TPU-first.

Numerical conventions match the reference (GPT_SoVITS/module/mel_processing.py:
`spectrogram_torch:40`, `spec_to_mel_torch:77`, `mel_spectrogram_torch:93`):

  * reflect-pad (n_fft - hop)/2 on each side, center=False STFT
  * periodic hann window
  * magnitude = sqrt(re^2 + im^2 + 1e-8)
  * mel filterbank = librosa slaney-scale, slaney-norm (htk=False)
  * log dynamic-range compression log(clamp(x, 1e-5))

TPU design notes:
  * Framing is a gather with statically-shaped indices; XLA lowers it to
    dynamic slices, no host round-trip.
  * Two DFT paths: `jnp.fft.rfft` (VPU) and a real-DFT *matmul* against a
    windowed cosine/sine basis (MXU). The matmul path additionally lets XLA
    fuse the downstream mel projection; for n_fft<=2048 the MXU path is
    bandwidth-bound and beats the FFT on TPU.
  * Filterbanks/windows are computed in numpy at trace time and closed over
    as constants — the dict-cache of the reference is unnecessary under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.utils.config import MelConfig


# ---------------------------------------------------------------------------
# Filterbank / window construction (host-side numpy, cached)
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False): linear <1 kHz, log above."""
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freq = np.asarray(freq, dtype=np.float64)
    mels = freq / f_sp
    log_t = freq >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mels = np.asarray(mels, dtype=np.float64)
    freqs = f_sp * mels
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    sampling_rate: int,
    n_fft: int,
    num_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (num_mels, n_fft//2+1).

    Bit-compatible with `librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)`
    as used by the reference (mel_processing.py:87)."""
    if fmax is None:
        fmax = float(sampling_rate) / 2
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0, float(sampling_rate) / 2, n_bins, dtype=np.float64)
    mel_min = _hz_to_mel_slaney(np.array(fmin))
    mel_max = _hz_to_mel_slaney(np.array(fmax))
    mel_pts = np.linspace(mel_min, mel_max, num_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: equal area per band
    enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def hann_window(win_size: int) -> np.ndarray:
    """Periodic hann window, matches torch.hann_window(win_size)."""
    n = np.arange(win_size, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _rdft_basis(n_fft: int, win_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT cos/sin bases, each (n_fft, n_fft//2+1).

    frames @ cos_basis = Re(rfft(frames * window)),
    frames @ sin_basis = -Im(rfft(frames * window)).
    """
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    win = np.zeros(n_fft, dtype=np.float64)
    ofs = (n_fft - win_size) // 2
    win[ofs : ofs + win_size] = hann_window(win_size).astype(np.float64)
    cos_b = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_b = (np.sin(ang) * win[:, None]).astype(np.float32)
    return cos_b, sin_b


# ---------------------------------------------------------------------------
# Framing + STFT (jit-traceable)
# ---------------------------------------------------------------------------


def _frame_signal(y: jnp.ndarray, n_fft: int, hop_size: int) -> jnp.ndarray:
    """(B, L) -> (B, T, n_fft) frames, reflect-padded, center=False.

    Matches mel_processing.py:55-57: pad (n_fft - hop)/2 on both sides."""
    pad = int((n_fft - hop_size) / 2)
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + (y.shape[-1] - n_fft) // hop_size
    idx = np.arange(num_frames)[:, None] * hop_size + np.arange(n_fft)[None, :]
    return y[:, idx]


def spectrogram(
    y: jnp.ndarray,
    cfg: MelConfig,
    *,
    use_matmul_dft: bool = True,
) -> jnp.ndarray:
    """(B, L) waveform in [-1,1] -> (B, n_fft//2+1, T) linear magnitude.

    Equivalent of `spectrogram_torch` (mel_processing.py:40)."""
    frames = _frame_signal(y.astype(jnp.float32), cfg.n_fft, cfg.hop_size)
    if use_matmul_dft:
        cos_b, sin_b = _rdft_basis(cfg.n_fft, cfg.win_size)
        re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32)
        im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32)
        power = re * re + im * im
    else:
        win = np.zeros(cfg.n_fft, dtype=np.float32)
        ofs = (cfg.n_fft - cfg.win_size) // 2
        win[ofs : ofs + cfg.win_size] = hann_window(cfg.win_size)
        z = jnp.fft.rfft(frames * jnp.asarray(win), n=cfg.n_fft, axis=-1)
        power = jnp.real(z) ** 2 + jnp.imag(z) ** 2
    mag = jnp.sqrt(power + 1e-8)
    return jnp.swapaxes(mag, 1, 2)  # (B, bins, T)


def spec_to_mel(spec: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """(B, bins, T) linear magnitude -> (B, num_mels, T) log-mel.

    Equivalent of `spec_to_mel_torch` (mel_processing.py:77)."""
    fb = jnp.asarray(mel_filterbank(cfg.sampling_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax))
    mel = jnp.einsum("mf,bft->bmt", fb, spec, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_spectrogram(y: jnp.ndarray, cfg: MelConfig, *, use_matmul_dft: bool = True) -> jnp.ndarray:
    """(B, L) waveform -> (B, num_mels, T) log-mel.

    Equivalent of `mel_spectrogram_torch` (mel_processing.py:93). With the
    matmul-DFT path, XLA fuses window+DFT+mel into two MXU matmul chains."""
    return spec_to_mel(spectrogram(y, cfg, use_matmul_dft=use_matmul_dft), cfg)


# ---------------------------------------------------------------------------
# v3/v4 mel normalization (reference: TTS_infer_pack/TTS.py norm_spec, spec
# range [-12, 2] mapped to [-1, 1])
# ---------------------------------------------------------------------------

_SPEC_MIN = -12.0
_SPEC_MAX = 2.0


def norm_spec(x: jnp.ndarray) -> jnp.ndarray:
    return (x - _SPEC_MIN) / (_SPEC_MAX - _SPEC_MIN) * 2.0 - 1.0


def denorm_spec(x: jnp.ndarray) -> jnp.ndarray:
    return (x + 1.0) / 2.0 * (_SPEC_MAX - _SPEC_MIN) + _SPEC_MIN
