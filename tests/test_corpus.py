"""Corpus tool tests: manifest writer, spectral-gate denoiser, HPSS split."""

import numpy as np

from gpt_sovits_tpu.corpus.asr import write_manifest
from gpt_sovits_tpu.corpus.denoise import spectral_gate
from gpt_sovits_tpu.corpus.uvr5 import hpss_vocal_emphasis
from gpt_sovits_tpu.prepare.extract import read_manifest


def test_write_manifest_roundtrip(tmp_path):
    p = str(tmp_path / "out.list")
    write_manifest([("/a/x.wav", "hello | world"), ("/a/y.wav", "second")], p, speaker="spk", language="en")
    items = read_manifest(p)
    assert len(items) == 2
    assert items[0].lang == "en" and items[0].speaker == "spk"
    assert "|" not in items[0].text


def test_spectral_gate_improves_snr():
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr * 2) / sr
    clean = 0.5 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
    clean[: sr // 2] = 0.0  # leading pause — the noise-profile window
    noise = (rng.standard_normal(len(t)) * 0.05).astype(np.float32)
    noisy = clean + noise
    dn = spectral_gate(noisy, sr)
    assert dn.shape == noisy.shape

    def snr(x):
        err = x - clean
        return 10 * np.log10(np.mean(clean**2) / np.mean(err**2))

    assert snr(dn) > snr(noisy) + 3  # at least 3 dB better


def test_hpss_separates_tone_from_clicks():
    sr = 16000
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    clicks = np.zeros(sr, np.float32)
    clicks[::1600] = 0.8  # percussive impulses
    mix = tone + clicks
    vocals, other = hpss_vocal_emphasis(mix, sr)
    # harmonic channel keeps the tone, percussive channel keeps the clicks
    assert np.corrcoef(vocals[2000:-2000], tone[2000:-2000])[0, 1] > 0.9
    click_pos = np.arange(0, sr, 1600)[2:-2]
    assert np.abs(other[click_pos]).mean() > np.abs(vocals[click_pos]).mean()
