"""corpus/mdx.py: ConvTDF framing roundtrip + demix pipeline over onnx_lite."""

import numpy as np
import torch

from gpt_sovits_tpu.corpus.mdx import MDXConfig, MDXSeparator, separate, spec_of, wave_of
from gpt_sovits_tpu.utils.onnx_lite import Graph, Node, encode_model

CFG = MDXConfig(dim_t_log2=5, dim_f=65, n_fft=128, hop=64, chunks=1, margin=8000, sr=8000, denoise=True)


def _identity_onnx(path):
    g = Graph(
        nodes=[Node("Identity", ["input"], ["output"], {})],
        initializers={},
        inputs=["input"],
        outputs=["output"],
    )
    with open(path, "wb") as f:
        f.write(encode_model(g))


def test_framing_matches_torch():
    """spec_of/wave_of equal the reference ConvTDFNetTrim stft/istft math."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, CFG.chunk_size)).astype(np.float32)

    spek = np.asarray(spec_of(jnp.asarray(x), CFG))

    xt = torch.from_numpy(x).reshape(-1, CFG.chunk_size)
    win = torch.hann_window(CFG.n_fft, periodic=True)
    zt = torch.stft(xt, n_fft=CFG.n_fft, hop_length=CFG.hop, window=win, center=True, return_complex=True)
    zt = torch.view_as_real(zt).permute(0, 3, 1, 2)
    zt = zt.reshape(-1, 2, 2, CFG.n_bins, zt.shape[-1]).reshape(-1, 4, CFG.n_bins, zt.shape[-1])
    want = zt[:, :, : CFG.dim_f, : CFG.dim_t].numpy()
    np.testing.assert_allclose(spek, want, atol=2e-3)

    # inverse roundtrip (dim_f == n_bins here, so only window-edge loss)
    back = np.asarray(wave_of(jnp.asarray(spek), CFG))
    trim = CFG.trim
    np.testing.assert_allclose(back[:, :, trim:-trim], x[:, :, trim:-trim], atol=2e-3)


def test_separate_identity_net(tmp_path):
    """Identity ONNX net -> stem==mix, main==0 (up to STFT edge loss)."""
    onnx_path = str(tmp_path / "vocals.onnx")
    _identity_onnx(onnx_path)

    rng = np.random.default_rng(1)
    t = np.arange(12000) / 8000
    mix = (np.sin(2 * np.pi * 440 * t) * 0.5).astype(np.float32)
    main, stem = separate(mix, 8000, onnx_path, cfg=CFG)
    assert main.shape == mix.shape and stem.shape == mix.shape
    assert np.isfinite(main).all() and np.isfinite(stem).all()
    core = slice(CFG.trim, -CFG.trim)
    np.testing.assert_allclose(stem[core], mix[core], atol=5e-3)
    assert np.abs(main[core]).max() < 5e-3


def test_demix_multi_segment(tmp_path):
    onnx_path = str(tmp_path / "vocals.onnx")
    _identity_onnx(onnx_path)
    rng = np.random.default_rng(2)
    mix = rng.standard_normal((2, 3 * 8000 + 123)).astype(np.float32) * 0.2
    sep = MDXSeparator(onnx_path, CFG)
    out = sep.demix(mix)
    assert out.shape == mix.shape
    core = slice(CFG.trim, -CFG.trim)
    np.testing.assert_allclose(out[:, core], mix[:, core], atol=5e-3)
