"""BigVGAN vocoder tests: anti-aliased resampling parity vs the reference
torch implementation, snake activations, and full-generator parity with
shared weights (tiny config)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from gpt_sovits_tpu.models.bigvgan import (
    BigVGAN,
    BigVGANConfig,
    downsample1d,
    kaiser_sinc_filter1d,
    params_from_torch,
    snake_beta,
    upsample1d,
)

from reference_oracle import load_reference


@pytest.fixture(scope="module")
def ref_bigvgan_pkg():
    load_reference()  # installs stubs + sys.path
    import BigVGAN.bigvgan as ref_bigvgan
    from BigVGAN.env import AttrDict

    return ref_bigvgan, AttrDict


def test_kaiser_filter_matches_torch(ref_bigvgan_pkg):
    from BigVGAN.alias_free_activation.torch.filter import kaiser_sinc_filter1d as ref_filt

    for ratio in (2,):
        ks = int(6 * ratio // 2) * 2
        ours = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks)
        ref = ref_filt(0.5 / ratio, 0.6 / ratio, ks).numpy().reshape(-1)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_resample_matches_torch(ref_bigvgan_pkg):
    from BigVGAN.alias_free_activation.torch.resample import DownSample1d, UpSample1d

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 2, 1))
    up_ref = UpSample1d(2)(xt).numpy().transpose(0, 2, 1)
    up_ours = np.asarray(upsample1d(jnp.asarray(x), 2))
    assert up_ours.shape == up_ref.shape
    np.testing.assert_allclose(up_ours, up_ref, atol=1e-5)

    dn_ref = DownSample1d(2)(xt).numpy().transpose(0, 2, 1)
    dn_ours = np.asarray(downsample1d(jnp.asarray(x), 2))
    assert dn_ours.shape == dn_ref.shape
    np.testing.assert_allclose(dn_ours, dn_ref, atol=1e-5)


def test_snakebeta_matches_torch(ref_bigvgan_pkg):
    from BigVGAN import activations

    torch.manual_seed(0)
    act = activations.SnakeBeta(5, alpha_logscale=True)
    with torch.no_grad():
        act.alpha.copy_(torch.randn(5) * 0.1)
        act.beta.copy_(torch.randn(5) * 0.1)
    x = np.random.default_rng(1).standard_normal((2, 5, 32)).astype(np.float32)
    with torch.no_grad():
        ref = act(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        snake_beta(
            jnp.asarray(x.transpose(0, 2, 1)),
            jnp.asarray(act.alpha.detach().numpy()),
            jnp.asarray(act.beta.detach().numpy()),
            True,
        )
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


TINY = BigVGANConfig(
    num_mels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),),
)


def test_bigvgan_generator_parity(ref_bigvgan_pkg):
    ref_bigvgan, AttrDict = ref_bigvgan_pkg
    h = AttrDict(
        {
            "num_mels": TINY.num_mels,
            "upsample_rates": list(TINY.upsample_rates),
            "upsample_kernel_sizes": list(TINY.upsample_kernel_sizes),
            "upsample_initial_channel": TINY.upsample_initial_channel,
            "resblock": "1",
            "resblock_kernel_sizes": list(TINY.resblock_kernel_sizes),
            "resblock_dilation_sizes": [list(d) for d in TINY.resblock_dilation_sizes],
            "activation": "snakebeta",
            "snake_logscale": True,
            "use_tanh_at_final": False,
            "use_bias_at_final": False,
        }
    )
    torch.manual_seed(0)
    ref = ref_bigvgan.BigVGAN(h).eval()
    x = np.random.default_rng(2).standard_normal((1, TINY.num_mels, 20)).astype(np.float32) * 0.5
    with torch.no_grad():
        wav_ref = ref(torch.from_numpy(x)).numpy()

    model = BigVGAN(TINY)
    params = params_from_torch(ref.state_dict(), TINY)
    wav_ours = np.asarray(model.apply(params, jnp.asarray(x.transpose(0, 2, 1))))[..., 0]
    assert wav_ours.shape == wav_ref[:, 0].shape
    np.testing.assert_allclose(wav_ours, wav_ref[:, 0], atol=5e-4, rtol=1e-3)
