"""SOLA stitching and slicer tests."""

import numpy as np

from gpt_sovits_tpu.dsp.slicer import Slicer, frame_rms
from gpt_sovits_tpu.dsp.sola import chunk_plan, sola_stitch


def test_sola_stitch_aligned_sine():
    """Two overlapping sine fragments must stitch without discontinuity."""
    sr = 8000
    t = np.arange(2 * sr) / sr
    full = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    ov = 400
    f1 = full[: sr + ov]
    f2 = full[sr - ov :]  # overlaps by 2*ov around the cut
    out = sola_stitch([f1, f2[: sr + ov]], ov)
    # stitched signal stays continuous: max sample-to-sample jump bounded
    d = np.abs(np.diff(out))
    assert d.max() < 2 * np.pi * 220.0 / sr * 1.5
    assert len(out) > sr


def test_sola_stitch_matches_torch_reference():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    f1 = rng.standard_normal(1000).astype(np.float32)
    f2 = np.concatenate([f1[-300:], rng.standard_normal(700).astype(np.float32)])
    ov = 200

    # reference implementation (TTS.py:1611) inline as oracle
    frags = [torch.from_numpy(f1.copy()), torch.from_numpy(f2.copy())]
    w1 = frags[0][-ov:]
    w2 = frags[1][:ov]
    corr = F.conv1d(w1.view(1, 1, -1), w2.view(1, 1, -1), padding=ov // 2).view(-1)[:-1]
    idx = int(corr.argmax())
    cut = ov - idx
    a = frags[0][:-cut]
    b = frags[1][idx:].clone()
    win = torch.hann_window(2 * cut)
    b[:cut] = win[:cut] * b[:cut] + win[cut:] * frags[0][-cut:]
    ref = torch.cat([a, b]).numpy()

    ours = sola_stitch([f1, f2], ov)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_chunk_plan_covers_everything():
    plan = chunk_plan(1000, 155, 934)
    assert sum(ln for _, ln in plan) == 1000
    assert plan[0][0] == 0
    for (s1, l1), (s2, _) in zip(plan, plan[1:]):
        assert s2 == s1 + l1


def test_frame_rms_silence_vs_tone():
    sr = 8000
    x = np.concatenate([np.zeros(sr), 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)]).astype(np.float32)
    rms = frame_rms(x, 640, 160)
    assert rms[: sr // 160 - 3].max() < 1e-6
    assert rms[sr // 160 + 3 :].mean() > 0.2


def test_slicer_cuts_at_silences():
    sr = 16000
    rng = np.random.default_rng(0)
    seg = (rng.standard_normal(sr * 6) * 0.3).astype(np.float32)
    silence = np.zeros(sr, dtype=np.float32)
    audio = np.concatenate([seg, silence, seg, silence, seg])
    sl = Slicer(sr, threshold=-40.0, min_length=3000, min_interval=300, hop_size=20, max_sil_kept=500)
    chunks = sl.slice(audio)
    assert len(chunks) == 3
    total = sum(len(c) for c in chunks)
    assert total > len(audio) - 3 * sr  # silence removed but voice kept
    for c in chunks:
        assert len(c) >= sr * 3  # respects min_length roughly


def test_slicer_short_passthrough():
    # quirk-compatible with the reference: "short" compares SAMPLES against
    # a FRAME count (slicer2.py:72-73), so only tiny clips pass through
    sr = 16000
    audio = np.zeros(200, dtype=np.float32)
    sl = Slicer(sr)
    chunks = sl.slice(audio)
    assert len(chunks) == 1 and len(chunks[0]) == 200
