"""ops/folded_conv.py: folded generator == standard Generator exactly."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.models.vits import SynthesizerTrn
from gpt_sovits_tpu.ops.folded_conv import (
    _pick_r,
    fold_conv_weight,
    fold_generator_params,
    folded_conv,
    generator_apply,
)
from gpt_sovits_tpu.utils.config import S2Config


def test_fold_conv_weight_exact():
    rng = np.random.default_rng(0)
    for k, d, C, r in [(3, 1, 16, 8), (7, 3, 16, 8), (11, 5, 32, 4), (3, 5, 64, 2), (7, 1, 8, 4)]:
        T = 32 * r
        w = rng.standard_normal((k, C, C)).astype(np.float32) * 0.1
        x = rng.standard_normal((1, T, C)).astype(np.float32)
        pad = (k - 1) * d // 2
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1,), [(pad, pad)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        wf, pads = fold_conv_weight(w, d, pad, r)
        got = folded_conv(jnp.asarray(x.reshape(1, T // r, r * C)), jnp.asarray(wf), pads)
        got = np.asarray(got).reshape(1, T, C)
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, err_msg=f"k{k} d{d} C{C} r{r}")


def test_pick_r():
    assert _pick_r(64) == 2
    assert _pick_r(32) == 4
    assert _pick_r(16) == 8
    assert _pick_r(128) == 1
    assert _pick_r(96) == 4  # 384 = 3 full lanes
    assert _pick_r(24) == 4  # 96/128 occupancy, best available


@pytest.mark.parametrize("version", ["v2"])
def test_folded_generator_matches_standard(version):
    cfg = S2Config(
        version=version,
        inter_channels=24,
        hidden_channels=24,
        gin_channels=16,
        upsample_rates=(10, 8, 2, 2, 2),
        upsample_initial_channel=256,  # stages: 128, 64, 32, 16, 8
        upsample_kernel_sizes=(16, 16, 8, 2, 2),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    )
    from gpt_sovits_tpu.models.vits import Generator

    gen = Generator(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 40, cfg.inter_channels)) * 0.5
    g = jax.random.normal(jax.random.PRNGKey(1), (1, 1, cfg.gin_channels))
    params = gen.init(key, x, g)["params"]

    want = np.asarray(gen.apply({"params": params}, x, g))
    folded = fold_generator_params(params, cfg)
    got = np.asarray(jax.jit(functools.partial(generator_apply, folded))(x, g))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_decode_latent_plus_folded_equals_decode():
    cfg = S2Config(
        version="v2",
        spec_channels=65,
        segment_size=8,
        inter_channels=24,
        hidden_channels=24,
        filter_channels=32,
        n_heads=2,
        n_layers=2,
        gin_channels=32,
        mrte_hidden=32,
        ssl_dim=32,
        n_codes=17,
        upsample_rates=(4, 2, 2),
        upsample_initial_channel=64,  # stages: 32, 16, 8
        upsample_kernel_sizes=(8, 2, 2),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    s2 = SynthesizerTrn(cfg)
    key = jax.random.PRNGKey(0)
    b, Tc, Tt, Tr = 1, 16, 6, 20
    codes = jax.random.randint(key, (b, Tc), 0, cfg.n_codes)
    codes_lengths = jnp.array([Tc])
    text = jax.random.randint(key, (b, Tt), 0, cfg.phoneme_vocab_size)
    text_lengths = jnp.array([Tt])
    refer = jax.random.normal(key, (b, Tr, cfg.spec_channels)) * 0.3 + 1.0
    refer_lengths = jnp.array([Tr])
    params = s2.init(
        {"params": key, "noise": key, "slice": key},
        jax.random.normal(key, (b, 2 * Tc, cfg.ssl_dim)),
        refer, refer_lengths, text, text_lengths,
        method=SynthesizerTrn.init_all,
    )["params"]

    want = np.asarray(
        s2.apply({"params": params}, codes, codes_lengths, text, text_lengths, refer, refer_lengths,
                 method=SynthesizerTrn.decode)
    )
    z, ge = s2.apply({"params": params}, codes, codes_lengths, text, text_lengths, refer, refer_lengths,
                     method=SynthesizerTrn.decode_latent)
    folded = fold_generator_params(params["dec"], cfg)
    got = np.asarray(generator_apply(folded, z, ge))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_folded_v4_vocoder_matches_standard():
    """v4 standalone vocoder config: post bias, no ge conditioning,
    rates (10,6,2,2,2) (loaders.py build_v3_bundle v4)."""
    import types

    from gpt_sovits_tpu.models.vits import Generator

    cfg = S2Config(
        version="v4",
        inter_channels=20,  # mel input channels for the standalone vocoder
        upsample_rates=(10, 6, 2, 2, 2),
        upsample_kernel_sizes=(20, 12, 4, 4, 4),
        upsample_initial_channel=128,  # stages: 64, 32, 16, 8, 4
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    gen = Generator(cfg, use_post_bias=True)
    key = jax.random.PRNGKey(2)
    mel = jax.random.normal(key, (1, 25, cfg.inter_channels)) * 0.5
    params = gen.init(key, mel)["params"]
    want = np.asarray(gen.apply({"params": params}, mel))

    eff = types.SimpleNamespace(
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock_kernel_sizes=cfg.resblock_kernel_sizes,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
    )
    folded = fold_generator_params(params, eff)
    got = np.asarray(generator_apply(folded, mel))
    assert got.shape == want.shape == (1, 25 * 480, 1)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_folded_bigvgan_matches_standard():
    """bigvgan_apply == BigVGAN.__call__ (float reassociation only) on a
    shrunken config that still exercises r=1 and r>1 stages + the
    anti-aliased snake in folded layout."""
    from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from gpt_sovits_tpu.ops.folded_bigvgan import bigvgan_apply, fold_bigvgan_params

    cfg = BigVGANConfig(
        num_mels=16,
        upsample_rates=(4, 2, 2),
        upsample_kernel_sizes=(8, 4, 4),
        upsample_initial_channel=256,  # stages: 128 (r=1), 64, 32 (folded)
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    model = BigVGAN(cfg)
    key = jax.random.PRNGKey(0)
    mel = jax.random.normal(key, (2, 24, cfg.num_mels))
    params = model.init(jax.random.PRNGKey(1), mel)
    ref = np.asarray(model.apply(params, mel))

    folded = fold_bigvgan_params(params["params"], cfg)
    got = np.asarray(bigvgan_apply(folded, mel))
    assert got.shape == ref.shape == (2, 24 * 4 * 2 * 2, 1)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_conv_apply_taps_matches_conv(monkeypatch):
    """The per-tap dot_general path (TPU serving default) computes the
    same contraction as lax.conv — forced on here via the backend gate."""
    import numpy as np

    from gpt_sovits_tpu.ops import folded_conv as fc

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 50, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, 16, 24)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((24,)).astype(np.float32))
    for pad, dil in [((3, 3), 1), ((9, 9), 3), ((2, 4), 2)]:
        ref = fc.conv_apply(x, w, b, pad, dil=dil)
        monkeypatch.setattr(fc.jax, "default_backend", lambda: "tpu")
        got = fc.conv_apply(x, w, b, pad, dil=dil)
        monkeypatch.undo()
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
