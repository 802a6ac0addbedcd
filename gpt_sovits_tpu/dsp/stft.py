"""Centered complex STFT / iSTFT (torch.stft/istft conventions), MXU-friendly.

The core TTS mel frontend (dsp/mel.py) follows the reference's
mel_processing.py framing (center=False, pre-padded).  The corpus tools
(UVR5 vocal separation: tools/uvr5/bs_roformer/bs_roformer.py:478,
tools/uvr5/lib/lib_v5/spec_utils.py:44, tools/uvr5/mdxnet.py:37) instead
use librosa/torch default *centered* framing (reflect-pad n_fft//2 on each
side) and need the inverse transform with window-square overlap-add
normalization.  Both directions are expressed as matmuls against
precomputed real-DFT bases so XLA tiles them onto the MXU instead of
falling back to an FFT custom call.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.dsp.mel import hann_window


@functools.lru_cache(maxsize=16)
def _fwd_basis(n_fft: int, win_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed forward bases, each (n_fft, n_fft//2+1): frames @ cos = Re,
    frames @ sin = Im (torch sign convention: X_k = sum x_n e^{-2πikn/N})."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    win = np.zeros(n_fft, dtype=np.float64)
    ofs = (n_fft - win_size) // 2
    win[ofs : ofs + win_size] = hann_window(win_size).astype(np.float64)
    cos_b = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * win[:, None]).astype(np.float32)
    return cos_b, sin_b


@functools.lru_cache(maxsize=16)
def _inv_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse bases, each (n_fft//2+1, n_fft): Re @ icos + Im @ isin = irfft."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((n_bins, 1), 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    icos = (np.cos(ang) * c / n_fft).astype(np.float32)
    isin = (-np.sin(ang) * c / n_fft).astype(np.float32)
    return icos, isin


def stft_center(y: jnp.ndarray, n_fft: int, hop: int, win_size: int | None = None) -> jnp.ndarray:
    """(..., L) real -> (..., n_fft//2+1, T) complex64; torch.stft(center=True)."""
    win_size = win_size or n_fft
    pad = n_fft // 2
    shape = y.shape
    y = y.reshape(-1, shape[-1]).astype(jnp.float32)
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[:, idx]  # (B, T, n_fft)
    cos_b, sin_b = _fwd_basis(n_fft, win_size)
    re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32)
    im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32)
    z = jax_complex(re, im)
    z = jnp.swapaxes(z, -1, -2)  # (B, F, T)
    return z.reshape(*shape[:-1], z.shape[-2], z.shape[-1])


def jax_complex(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return (re + 1j * im).astype(jnp.complex64)


def istft_center(
    z: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_size: int | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """(..., n_fft//2+1, T) complex -> (..., L) real; torch.istft(center=True).

    Overlap-add with window-square normalization; trims the n_fft//2 center
    padding and cuts/pads to `length` when given.
    """
    win_size = win_size or n_fft
    shape = z.shape
    z = z.reshape(-1, shape[-2], shape[-1])
    n_frames = z.shape[-1]
    icos, isin = _inv_basis(n_fft)
    re = jnp.real(z).swapaxes(-1, -2).astype(jnp.float32)  # (B, T, F)
    im = jnp.imag(z).swapaxes(-1, -2).astype(jnp.float32)
    frames = jnp.einsum("btk,kn->btn", re, jnp.asarray(icos), preferred_element_type=jnp.float32)
    frames = frames + jnp.einsum("btk,kn->btn", im, jnp.asarray(isin), preferred_element_type=jnp.float32)

    win = np.zeros(n_fft, dtype=np.float32)
    ofs = (n_fft - win_size) // 2
    win[ofs : ofs + win_size] = hann_window(win_size)
    frames = frames * jnp.asarray(win)

    out_len = n_fft + hop * (n_frames - 1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    out = jnp.zeros((frames.shape[0], out_len), jnp.float32).at[:, idx].add(frames)

    env = np.zeros(out_len, dtype=np.float32)
    np.add.at(env, idx.reshape(-1), np.tile(win * win, n_frames))
    out = out / jnp.asarray(np.maximum(env, 1e-11))

    pad = n_fft // 2
    out = out[:, pad : out_len - pad]
    if length is not None:
        if length <= out.shape[-1]:
            out = out[:, :length]
        else:
            out = jnp.pad(out, ((0, 0), (0, length - out.shape[-1])))
    return out.reshape(*shape[:-2], out.shape[-1])
