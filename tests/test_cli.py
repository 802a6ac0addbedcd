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


def test_cli_list_models(tmp_path, capsys):
    import json

    d = tmp_path / "GPT_weights_v2"
    d.mkdir()
    (d / "spk-e10.ckpt").write_bytes(b"x")
    (d / "spk-e15.ckpt").write_bytes(b"x")
    d2 = tmp_path / "SoVITS_weights_v2"
    d2.mkdir()
    (d2 / "spk_e8_s96.pth").write_bytes(b"x")
    (d2 / "spk_e4_s48.pth").write_bytes(b"x")
    main(["list-models", "--root", str(tmp_path)])
    out = json.loads(capsys.readouterr().out)
    assert out["v2"]["gpt"].endswith("spk-e15.ckpt")
    assert out["v2"]["sovits"].endswith("spk_e8_s96.pth")


def test_cli_asr_writes_manifest(tmp_path, monkeypatch):
    """asr subcommand with an injected backend (external ASR deps are
    optional); validates the .list format plumbing."""
    from gpt_sovits_tpu.corpus import asr as asr_mod

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for n in ("a.wav", "b.wav"):
        save_wav(str(wav_dir / n), np.zeros(1600, np.float32), 16000)
    monkeypatch.setattr(
        asr_mod, "transcribe_funasr", lambda paths, language: [(p, f"text {os.path.basename(p)}") for p in paths]
    )
    out = tmp_path / "exp.list"
    main(["asr", "--in-dir", str(wav_dir), "--output", str(out), "--language", "zh", "--speaker", "spk"])
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 2
    path, speaker, lang, text = lines[0].split("|")
    assert speaker == "spk" and lang == "ZH" and text == "text a.wav"
