"""CLI smoke tests (host-side subcommands only)."""

import os

import numpy as np

from gpt_sovits_tpu.cli import main
from gpt_sovits_tpu.dsp.audio_io import load_wav, save_wav


def test_cli_slice(tmp_path):
    rng = np.random.default_rng(0)
    seg = (rng.standard_normal(16000 * 5) * 0.3).astype(np.float32)
    silence = np.zeros(16000, np.float32)
    audio = np.concatenate([seg, silence, seg])
    src = tmp_path / "long.wav"
    save_wav(str(src), audio, 16000)
    out = tmp_path / "slices"
    main(["slice", str(src), "--out-dir", str(out), "--min-length", "3000", "--max-sil-kept", "400"])
    files = sorted(os.listdir(out))
    assert len(files) == 2
    w, sr = load_wav(str(out / files[0]))
    assert sr == 16000 and len(w) > 16000


def test_cli_help_all_subcommands():
    import pytest

    for sub in ["slice", "prepare", "train-s1", "train-s2", "tts", "serve", "export"]:
        with pytest.raises(SystemExit) as e:
            main([sub, "--help"])
        assert e.value.code == 0
