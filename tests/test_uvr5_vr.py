"""Parity tests: corpus/vr.py vs the reference UVR5 VR nets.

Dual-instantiation with shared weights against
tools/uvr5/lib/lib_v5/nets_61968KB.py (CascadedASPPNet) and nets_new.py
(CascadedNet), plus an end-to-end separate() drive through the 4-band
spec pipeline with a real-format checkpoint file.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gpt_sovits_tpu.corpus.vr import (
    MODEL_PARAMS_4BAND_V2,
    cascaded_aspp_net,
    cascaded_net,
    combined_spec_to_wave,
    fold_params,
    wave_to_combined_spec,
)

UVR5 = "/root/reference/tools/uvr5"


@pytest.fixture
def _install_stubs(monkeypatch):
    # monkeypatch-scoped: raw sys.modules writes leak into later tests in
    # the same xdist worker (the round-2 kaldi-fbank ordering flake)
    for name in ("librosa", "soundfile"):
        if name not in sys.modules:
            monkeypatch.setitem(sys.modules, name, types.ModuleType(name))
    if UVR5 not in sys.path:
        monkeypatch.syspath_prepend(UVR5)


def _randomize_bn_stats(model):
    """Populate BN running stats so folding is non-trivially tested."""
    model.train()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()


def test_cascaded_aspp_net_parity(_install_stubs):
    from lib.lib_v5 import nets_61968KB as Nets

    torch.manual_seed(0)
    n_fft = 64  # only sets max_bin/output_bin crop; channel widths are fixed
    ref = Nets.CascadedASPPNet(n_fft)
    _randomize_bn_stats(ref)

    p = fold_params(ref.state_dict())
    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal((1, 2, n_fft // 2 + 1, 32))).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(cascaded_aspp_net(p, jnp.asarray(x), n_fft))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # aggressiveness branch
    agg = {"split_bin": 10, "value": 0.1}
    with torch.no_grad():
        want_a = ref(torch.from_numpy(x), agg).numpy()
    got_a = np.asarray(cascaded_aspp_net(p, jnp.asarray(x), n_fft, (10, 0.1)))
    np.testing.assert_allclose(got_a, want_a, atol=2e-4)


@pytest.mark.parametrize("nout", [32])
def test_cascaded_net_parity(nout, _install_stubs):
    from lib.lib_v5.nets_new import CascadedNet

    torch.manual_seed(1)
    n_fft = 128
    ref = CascadedNet(n_fft, nout=nout, nout_lstm=64)
    _randomize_bn_stats(ref)

    p = fold_params(ref.state_dict())
    rng = np.random.default_rng(1)
    x = np.abs(rng.standard_normal((1, 2, n_fft // 2 + 1, 32))).astype(np.float32)

    with torch.no_grad():
        want = (ref(torch.from_numpy(x)) * torch.from_numpy(x)).numpy()
    got = np.asarray(cascaded_net(p, jnp.asarray(x), n_fft))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_band_pipeline_roundtrip():
    """4-band analysis/synthesis keeps the signal recognizable (the chain is
    lossy by design: band crops + lp/hp ramps), shapes/finiteness exact."""
    rng = np.random.default_rng(2)
    t = np.arange(44100) / 44100
    wav = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 550 * t)]).astype(np.float32)
    wav += 0.01 * rng.standard_normal(wav.shape).astype(np.float32)

    mp = MODEL_PARAMS_4BAND_V2
    spec, high_end, he_h = wave_to_combined_spec(wav, mp)
    assert spec.shape[0] == 2 and spec.shape[1] == mp["bins"] + 1
    assert np.isfinite(spec).all()
    out = combined_spec_to_wave(spec, mp).T  # (2, L')
    assert np.isfinite(out).all()
    n = min(out.shape[-1], wav.shape[-1])
    # energy should land in the same ballpark (no reconstruction blow-up)
    r = np.sqrt((out[..., :n] ** 2).mean()) / np.sqrt((wav[..., :n] ** 2).mean())
    assert 0.5 < r < 2.0, r
