"""S2 SoVITS synthesizer tests: shapes, masking invariance, flow
invertibility, VQ round-trip, transposed-conv length math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.models.vits import Generator, SynthesizerTrn
from gpt_sovits_tpu.models.vits_modules import (
    ConvTranspose1d,
    ResidualCouplingBlock,
    VQCodebook,
    sequence_mask,
)
from gpt_sovits_tpu.utils.config import S2Config, replace

TINY = S2Config(
    version="v1",
    spec_channels=65,
    segment_size=16,
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=4,
    kernel_size=3,
    upsample_rates=(4, 4),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    gin_channels=32,
    mrte_hidden=32,
    ssl_dim=32,
    n_codes=17,
    sv_dim=40,
)

B, TS, TSPEC, TT = 2, 24, 24, 8  # ssl 50 Hz frames, spec frames, text len


def _inputs(key, cfg=TINY):
    ks = jax.random.split(key, 4)
    ssl = jax.random.normal(ks[0], (B, TS, cfg.ssl_dim))
    spec = jax.random.normal(ks[1], (B, TSPEC, cfg.spec_channels)) * 0.5
    text = jax.random.randint(ks[2], (B, TT), 0, cfg.phoneme_vocab_size)
    sv = jax.random.normal(ks[3], (B, cfg.sv_dim))
    return ssl, spec, text, sv


@pytest.fixture(scope="module")
def model_and_params():
    model = SynthesizerTrn(TINY)
    ssl, spec, text, _ = _inputs(jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2), "slice": jax.random.PRNGKey(3)},
        ssl, spec, jnp.asarray([TSPEC, TSPEC - 4]), text, jnp.asarray([TT, TT - 2]),
        method=SynthesizerTrn.init_all,
    )
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    ssl, spec, text, _ = _inputs(jax.random.PRNGKey(5))
    out = model.apply(
        params, ssl, spec, jnp.asarray([TSPEC, TSPEC - 4]), text, jnp.asarray([TT, TT - 2]),
        rngs_noise=jax.random.PRNGKey(6), rng_slice=jax.random.PRNGKey(7),
    )
    up = int(np.prod(TINY.upsample_rates))
    assert out["wav_hat"].shape == (B, TINY.segment_size * up, 1)
    assert out["z"].shape == (B, TSPEC, TINY.inter_channels)
    assert np.isfinite(float(out["commit_loss"]))
    for k in ("z_p", "m_p", "logs_p", "m_q", "logs_q"):
        assert out[k].shape == (B, TSPEC, TINY.inter_channels), k
        assert np.all(np.isfinite(np.asarray(out[k]))), k


def test_decode_shapes_and_determinism(model_and_params):
    model, params = model_and_params
    ssl, spec, text, _ = _inputs(jax.random.PRNGKey(8))
    codes = model.apply(params, ssl, method=SynthesizerTrn.extract_latent)
    assert codes.shape == (B, TS // 2)
    wav = model.apply(
        params, codes, jnp.asarray([TS // 2, TS // 2]), text, jnp.asarray([TT, TT]),
        spec, jnp.asarray([TSPEC, TSPEC]), method=SynthesizerTrn.decode,
    )
    up = int(np.prod(TINY.upsample_rates))
    assert wav.shape == (B, TS * up, 1)  # codes*2 latent frames * upsample
    wav2 = model.apply(
        params, codes, jnp.asarray([TS // 2, TS // 2]), text, jnp.asarray([TT, TT]),
        spec, jnp.asarray([TSPEC, TSPEC]), method=SynthesizerTrn.decode,
    )
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-6)


def test_v2pro_paths():
    cfg = replace(TINY, version="v2Pro", gin_channels=32)
    model = SynthesizerTrn(cfg)
    ssl, spec, text, sv = _inputs(jax.random.PRNGKey(9), cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2), "slice": jax.random.PRNGKey(3)},
        ssl, spec, jnp.asarray([TSPEC, TSPEC]), text, jnp.asarray([TT, TT]), sv_emb=sv,
        method=SynthesizerTrn.init_all,
    )
    out = model.apply(
        params, ssl, spec, jnp.asarray([TSPEC, TSPEC]), text, jnp.asarray([TT, TT]),
        rngs_noise=jax.random.PRNGKey(6), rng_slice=jax.random.PRNGKey(7), sv_emb=sv,
    )
    assert np.all(np.isfinite(np.asarray(out["wav_hat"])))


def test_flow_invertibility():
    cfg = TINY
    flow = ResidualCouplingBlock(cfg.inter_channels, cfg.hidden_channels, 5, 1, 4, gin_channels=cfg.gin_channels)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 12, cfg.inter_channels))
    mask = sequence_mask(jnp.asarray([12, 9]), 12)
    g = jax.random.normal(key, (B, 1, cfg.gin_channels))
    params = flow.init(jax.random.PRNGKey(1), x, mask, g=g)
    z = flow.apply(params, x, mask, g=g, reverse=False)
    x_rec = flow.apply(params, z, mask, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec * mask), np.asarray(x * mask), atol=1e-4)


def test_vq_roundtrip():
    vq = VQCodebook(codebook_size=17, dim=8)
    params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8)))
    embed = params["params"]["embed"]
    # inputs exactly on codebook entries must map to themselves
    x = embed[jnp.asarray([[0, 5, 16, 3]])]
    q, codes = vq.apply(params, x)
    np.testing.assert_array_equal(np.asarray(codes), [[0, 5, 16, 3]])
    np.testing.assert_allclose(np.asarray(q), np.asarray(x), atol=1e-6)
    dec = vq.apply(params, codes, method=VQCodebook.decode)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("k,s", [(16, 10), (16, 8), (8, 2), (2, 2), (4, 2)])
def test_convtranspose_length_matches_torch(k, s):
    import torch

    pad = (k - s) // 2
    t = 13
    x = np.random.default_rng(0).standard_normal((1, t, 3)).astype(np.float32)
    m = ConvTranspose1d(5, k, s, pad)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(params, jnp.asarray(x))
    ref = torch.nn.ConvTranspose1d(3, 5, k, s, padding=pad)
    expected_len = ref(torch.zeros(1, 3, t)).shape[-1]
    assert y.shape == (1, expected_len, 5)
    # numerical parity with identical weights
    w = np.asarray(params["params"]["kernel"])  # (k, in, out)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w.transpose(1, 2, 0)))  # (in, out, k)
        ref.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
    y_ref = ref(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


def test_generator_masked_vs_unmasked_tail():
    """The generator upsamples; valid prefix must not depend on batch padding."""
    model = Generator(TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 10, TINY.inter_channels))
    g = jax.random.normal(jax.random.PRNGKey(1), (1, 1, TINY.gin_channels))
    params = model.init(jax.random.PRNGKey(2), x, g=g)
    y1 = model.apply(params, x, g=g)
    up = int(np.prod(TINY.upsample_rates))
    assert y1.shape == (1, 10 * up, 1)
    assert np.all(np.abs(np.asarray(y1)) <= 1.0)
