"""Parity tests: corpus/roformer.py vs the reference BS/Mel-Band RoFormer.

Dual-instantiation with shared weights (the reference's own BigVGAN test
pattern): build the torch model from /root/reference/tools/uvr5, copy its
state_dict into our flax tree, compare separated audio on random input.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gpt_sovits_tpu.corpus.roformer import Roformer, RoformerConfig, demix, params_from_torch
from gpt_sovits_tpu.dsp.stft import istft_center, stft_center

UVR5 = "/root/reference/tools/uvr5"


@pytest.fixture
def _install_stubs(monkeypatch):
    # monkeypatch-scoped: raw sys.modules writes leak into later tests in
    # the same xdist worker (the round-2 kaldi-fbank ordering flake)
    if "rotary_embedding_torch" not in sys.modules:
        mod = types.ModuleType("rotary_embedding_torch")

        class RotaryEmbedding(torch.nn.Module):
            """Functional stand-in for rotary_embedding_torch's default
            (interleaved-pair, positions 0..n-1, theta 10000)."""

            def __init__(self, dim, theta=10000):
                super().__init__()
                inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
                self.register_buffer("inv_freq", inv)

            def rotate_queries_or_keys(self, t):
                n = t.shape[-2]
                freqs = torch.arange(n, device=t.device).float()[:, None] * self.inv_freq[None]
                freqs = torch.repeat_interleave(freqs, 2, dim=-1)
                x = t.reshape(*t.shape[:-1], -1, 2)
                x1, x2 = x.unbind(-1)
                rot = torch.stack((-x2, x1), -1).reshape(t.shape)
                return t * freqs.cos() + rot * freqs.sin()

        mod.RotaryEmbedding = RotaryEmbedding
        monkeypatch.setitem(sys.modules, "rotary_embedding_torch", mod)

    # another test file (e.g. test_uvr5_vr) may have installed a bare
    # librosa stub already: always (re)attach the filters submodule
    if "librosa" not in sys.modules:
        monkeypatch.setitem(sys.modules, "librosa", types.ModuleType("librosa"))
    if not hasattr(sys.modules["librosa"], "filters"):
        from gpt_sovits_tpu.dsp.mel import mel_filterbank

        lbf = types.ModuleType("librosa.filters")
        lbf.mel = lambda *, sr, n_fft, n_mels, fmin=0.0, fmax=None: mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        monkeypatch.setattr(sys.modules["librosa"], "filters", lbf, raising=False)
        monkeypatch.setitem(sys.modules, "librosa.filters", lbf)

    if UVR5 not in sys.path:
        monkeypatch.syspath_prepend(UVR5)


def test_stft_istft_match_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    n_fft, hop = 512, 160
    win = torch.hann_window(n_fft)
    zt = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop, window=win, return_complex=True)
    zj = stft_center(jnp.asarray(x), n_fft, hop)
    np.testing.assert_allclose(np.asarray(zj), zt.numpy(), atol=2e-3)

    yt = torch.istft(zt, n_fft=n_fft, hop_length=hop, window=win, length=4000)
    yj = istft_center(jnp.asarray(zj), n_fft, hop, length=4000)
    np.testing.assert_allclose(np.asarray(yj), yt.numpy(), atol=2e-3)


def _tiny_bs_cfg():
    return dict(
        dim=32,
        depth=2,
        stereo=True,
        num_stems=1,
        time_transformer_depth=1,
        freq_transformer_depth=1,
        freqs_per_bands=(2, 2, 2, 2, 4, 4, 8, 8, 16, 17),
        dim_head=8,
        heads=2,
        stft_n_fft=128,
        stft_hop_length=32,
        stft_win_length=128,
        mask_estimator_depth=2,
    )


def _tiny_mel_cfg():
    return dict(
        dim=32,
        depth=2,
        stereo=False,
        num_stems=1,
        time_transformer_depth=1,
        freq_transformer_depth=1,
        num_bands=12,
        dim_head=8,
        heads=2,
        sample_rate=16000,
        stft_n_fft=128,
        stft_hop_length=32,
        stft_win_length=128,
        mask_estimator_depth=2,
    )


@pytest.mark.parametrize("kind", ["bs", "mel"])
def test_roformer_parity(kind, _install_stubs):
    torch.manual_seed(0)

    if kind == "bs":
        from bs_roformer.bs_roformer import BSRoformer

        kw = _tiny_bs_cfg()
        ref = BSRoformer(flash_attn=False, **kw)
    else:
        from bs_roformer.mel_band_roformer import MelBandRoformer

        kw = _tiny_mel_cfg()
        ref = MelBandRoformer(flash_attn=False, **kw)
    ref.eval()

    cfg = RoformerConfig.from_dict(kw)
    assert cfg.kind == kind
    model = Roformer(cfg)
    params = params_from_torch(ref.state_dict(), cfg)

    rng = np.random.default_rng(1)
    S = 2 if kw["stereo"] else 1
    x = rng.standard_normal((1, S, 2048)).astype(np.float32) * 0.3

    with torch.no_grad():
        want = ref(torch.from_numpy(x if S == 2 else x[:, 0]))
    want = want.numpy()
    if want.ndim == 2:  # mono collapses to (b, t) after the (b 1 s t) squeeze
        want = want[:, None]

    got = model.apply({"params": params}, jnp.asarray(x))  # (B, N, S, L)
    got = np.asarray(got[:, 0])
    np.testing.assert_allclose(got, want.reshape(got.shape), atol=3e-3)


def test_demix_roundtrip_shapes():
    cfg = RoformerConfig.from_dict(_tiny_mel_cfg())
    model = Roformer(cfg)
    rng = np.random.default_rng(2)
    mix = rng.standard_normal((1, 5000)).astype(np.float32) * 0.1
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1024), jnp.float32))["params"]
    fn = jax.jit(lambda w: model.apply({"params": params}, w))
    out = demix(lambda w: fn(w), mix, chunk_size=1024, num_overlap=2, batch_size=2)
    assert out.shape == (1, 1, 5000)
    assert np.isfinite(out).all()
