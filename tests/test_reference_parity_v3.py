"""Numerical parity of the v3 stack vs the reference SynthesizerTrnV3
(shared random weights): decode_encp (codes -> DiT conditioning) and the
DiT estimator forward. The Euler loop itself is RNG-dependent and is
covered logically in test_v3.py.

The reference hard-codes MRTE 512, DiT dim=1024/depth=22 — the heavy part
is the DiT init; forwards run on tiny sequence lengths.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from gpt_sovits_tpu.models.dit import DiT
from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3
from gpt_sovits_tpu.utils.checkpoint_compat import s2v3_params_from_torch
from gpt_sovits_tpu.utils.config import S2Config

from reference_oracle import load_reference

V3_CFG = S2Config(
    version="v3",
    spec_channels=705,  # ref_enc slices [:704]
    inter_channels=192,
    hidden_channels=192,  # MRTE hard-codes 192-ch content
    filter_channels=64,
    n_heads=2,
    n_layers=4,
    kernel_size=3,
    gin_channels=512,  # added straight into the 512-wide MRTE stream
    mrte_hidden=512,
    ssl_dim=768,
    n_codes=1024,
    cfm_mel_channels=100,
    cfm_dit_depth=22,
    cfm_dit_dim=1024,
    cfm_dit_heads=16,
)


@pytest.fixture(scope="module")
def ref_v3():
    ref_models, _ = load_reference()
    torch.manual_seed(0)
    m = ref_models.SynthesizerTrnV3(
        V3_CFG.spec_channels, 20480, V3_CFG.inter_channels, V3_CFG.hidden_channels,
        V3_CFG.filter_channels, V3_CFG.n_heads, V3_CFG.n_layers, V3_CFG.kernel_size,
        0.0, "1", [3], [[1, 3, 5]], [8, 8], 64, [16, 16],
        gin_channels=V3_CFG.gin_channels, semantic_frame_rate="25hz",
        freeze_quantizer=True, version="v3",
    ).eval()
    return m


def test_v3_decode_encp_parity(ref_v3):
    rng = np.random.default_rng(0)
    b, tc, tt, tr = 1, 10, 6, 12
    codes = rng.integers(0, 1024, (b, tc))
    text = rng.integers(0, 322, (b, tt))
    refer = (rng.standard_normal((b, V3_CFG.spec_channels, tr)) * 0.3 + 1.0).astype(np.float32)

    with torch.no_grad():
        fea_ref, ge_ref = ref_v3.decode_encp(
            torch.from_numpy(codes[None, 0:1]), torch.from_numpy(text), torch.from_numpy(refer)
        )

    model = SynthesizerTrnV3(V3_CFG)
    params = s2v3_params_from_torch(ref_v3.state_dict(), V3_CFG)
    fea, ge, mel_len = model.apply(
        params, jnp.asarray(codes), jnp.full((b,), tc), jnp.asarray(text), jnp.full((b,), tt),
        jnp.asarray(refer.transpose(0, 2, 1)), jnp.full((b,), tr),
        method=SynthesizerTrnV3.decode_encp,
    )
    assert np.asarray(fea).transpose(0, 2, 1).shape == fea_ref.numpy().shape
    np.testing.assert_allclose(np.asarray(ge)[:, 0], ge_ref.numpy()[:, :, 0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(fea).transpose(0, 2, 1), fea_ref.numpy(), atol=5e-4, rtol=2e-3
    )
    assert int(mel_len[0]) == int(tc * 2 * 1.875)  # the reference fea[:, :, :sizee] clips to floor(tc*3.75)


def test_dit_forward_parity(ref_v3):
    rng = np.random.default_rng(1)
    b, t = 1, 16
    x = rng.standard_normal((b, t, 100)).astype(np.float32) * 0.3
    cond = rng.standard_normal((b, t, 100)).astype(np.float32) * 0.3
    mu = rng.standard_normal((b, t, 512)).astype(np.float32) * 0.3
    tt = np.asarray([0.4], np.float32)
    dt = np.asarray([0.25], np.float32)

    ref_dit = ref_v3.cfm.estimator
    with torch.no_grad():
        # reference signature: (x0 (b,d,n), cond0 (b,d,n), x_lens, time, dt, text (b,d,n))
        out_ref = ref_dit(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(cond.transpose(0, 2, 1)),
            torch.tensor([t]),
            torch.from_numpy(tt),
            torch.from_numpy(dt),
            torch.from_numpy(mu.transpose(0, 2, 1)),
        ).numpy()

    model = SynthesizerTrnV3(V3_CFG)
    params = s2v3_params_from_torch(ref_v3.state_dict(), V3_CFG)
    dit = DiT(model.dit_config)
    dit_params = {"params": params["params"]["cfm"]["estimator"]}
    out, _ = dit.apply(
        dit_params, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(tt), jnp.asarray(dt),
        jnp.asarray(mu), jnp.ones((b, t), bool),
    )
    assert np.asarray(out).shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-3, rtol=5e-3)
