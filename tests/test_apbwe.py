"""AP-BWE super-resolution: STFT/iSTFT parity vs torch, model parity vs
the reference APNet_BWE_Model with shared random weights."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from gpt_sovits_tpu.models.apbwe import (
    APBWEConfig,
    APNetBWE,
    amp_pha_istft,
    amp_pha_stft,
    params_from_torch,
)

from reference_oracle import load_reference


def test_stft_istft_roundtrip_matches_torch():
    n_fft, hop, win = 256, 64, 256
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 4000)) * 0.3).astype(np.float32)

    mag, pha = amp_pha_stft(jnp.asarray(x), n_fft, hop, win)
    xt = torch.from_numpy(x)
    z = torch.stft(
        xt, n_fft, hop_length=hop, win_length=win, window=torch.hann_window(win),
        center=True, pad_mode="reflect", return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(mag), torch.log(z.abs() + 1e-4).numpy(), atol=1e-4, rtol=1e-3)

    # istft parity
    out = np.asarray(amp_pha_istft(mag, pha, n_fft, hop, win))
    ref = torch.istft(
        z, n_fft, hop_length=hop, win_length=win, window=torch.hann_window(win), center=True
    ).numpy()
    n = min(out.shape[-1], ref.shape[-1])
    np.testing.assert_allclose(out[:, :n], ref[:, :n], atol=1e-4)
    # and the roundtrip reconstructs the signal
    np.testing.assert_allclose(out[:, hop : n - hop], x[:, hop : n - hop], atol=1e-3)


SMALL = APBWEConfig(n_fft=64, hop_size=16, win_size=64, channels=32, layers=2)


def test_apnet_bwe_parity():
    load_reference()
    sys.path.append("/root/reference/tools/AP_BWE_main")
    from models.model import APNet_BWE_Model

    class H(dict):
        __getattr__ = dict.__getitem__

    torch.manual_seed(0)
    ref = APNet_BWE_Model(H(n_fft=SMALL.n_fft, ConvNeXt_channels=SMALL.channels, ConvNeXt_layers=SMALL.layers)).eval()

    rng = np.random.default_rng(1)
    bins = SMALL.n_fft // 2 + 1
    mag = rng.standard_normal((2, bins, 20)).astype(np.float32)
    pha = (rng.uniform(-np.pi, np.pi, (2, bins, 20))).astype(np.float32)
    with torch.no_grad():
        mag_ref, pha_ref, _ = ref(torch.from_numpy(mag), torch.from_numpy(pha))

    model = APNetBWE(SMALL)
    params = params_from_torch(ref.state_dict(), SMALL)
    mag_ours, pha_ours = model.apply(params, jnp.asarray(mag), jnp.asarray(pha))
    np.testing.assert_allclose(np.asarray(mag_ours), mag_ref.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pha_ours), pha_ref.numpy(), atol=2e-4, rtol=1e-3)
