"""ERes2NetV2 speaker embedder parity vs reference (random shared weights)
and kaldi fbank parity vs the reference's pure-torch kaldi implementation."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from gpt_sovits_tpu.models.eres2net import (
    ERes2NetConfig,
    ERes2NetV2,
    kaldi_fbank,
    params_from_torch,
)

from reference_oracle import load_reference


@pytest.fixture(scope="module")
def ref_eres2net():
    load_reference()  # stubs torchaudio etc.
    p = "/root/reference/GPT_SoVITS/eres2net"
    if p not in sys.path:
        sys.path.append(p)
    import ERes2NetV2 as ref_mod
    import kaldi as ref_kaldi

    return ref_mod, ref_kaldi


def test_kaldi_fbank_matches_reference(ref_eres2net):
    _, ref_kaldi = ref_eres2net
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ref = ref_kaldi.fbank(
        torch.from_numpy(wav)[None], num_mel_bins=80, sample_frequency=16000, dither=0
    ).numpy()
    ours = np.asarray(kaldi_fbank(jnp.asarray(wav[None])))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


# small config for speed: still exercises res2net split/fuse/shortcut paths
SMALL = ERes2NetConfig(num_blocks=(1, 1, 1, 1), m_channels=8, feat_dim=16, base_width=24, scale=4, expansion=4)


def test_eres2netv2_forward3_parity(ref_eres2net):
    ref_mod, _ = ref_eres2net
    torch.manual_seed(0)
    ref = ref_mod.ERes2NetV2(
        num_blocks=list(SMALL.num_blocks), m_channels=SMALL.m_channels, feat_dim=SMALL.feat_dim,
        baseWidth=SMALL.base_width, scale=SMALL.scale, expansion=SMALL.expansion,
    ).eval()
    feat = np.random.default_rng(1).standard_normal((2, 24, SMALL.feat_dim)).astype(np.float32)
    with torch.no_grad():
        emb_ref = ref.forward3(torch.from_numpy(feat.copy())).numpy()

    model = ERes2NetV2(SMALL)
    params = params_from_torch(ref.state_dict(), SMALL)
    emb_ours = np.asarray(model.apply(params, jnp.asarray(feat)))
    assert emb_ours.shape == emb_ref.shape
    np.testing.assert_allclose(emb_ours, emb_ref, atol=1e-4, rtol=1e-3)
