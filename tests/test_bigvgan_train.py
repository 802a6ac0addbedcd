"""BigVGAN vocoder trainer test (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from gpt_sovits_tpu.train.bigvgan_train import BigVGANDiscriminators, init_state, make_train_step, multiscale_mel_loss
from gpt_sovits_tpu.utils.config import MelConfig, TrainConfig

MEL = MelConfig(sampling_rate=8000, n_fft=256, win_size=256, hop_size=64, num_mels=13)
CFG = BigVGANConfig(
    num_mels=13, upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
    upsample_initial_channel=32, resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
)


def test_bigvgan_train_step():
    assert int(np.prod(CFG.upsample_rates)) == MEL.hop_size
    gen = BigVGAN(CFG)
    disc = BigVGANDiscriminators(periods=(2, 3), resolutions=((128, 32, 64), (256, 64, 128)))
    tc = TrainConfig(batch_size=2, learning_rate=2e-4)
    seg = 16
    state = init_state(jax.random.PRNGKey(0), gen, disc, tc, MEL, seg)
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal((2, seg, 13)).astype(np.float32)),
        "wav": jnp.asarray(rng.standard_normal((2, seg * MEL.hop_size, 1)).astype(np.float32) * 0.1),
    }
    g0 = np.asarray(jax.tree_util.tree_leaves(state.params_g)[0]).copy()
    step = make_train_step(gen, disc, tc, MEL)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(state.params_g)[0]), g0)


def test_multiscale_mel_loss_zero_for_identical():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32) * 0.1)
    assert float(multiscale_mel_loss(y, y, MEL)) == 0.0
    y2 = y + 0.05
    assert float(multiscale_mel_loss(y, y2, MEL)) > 0.0


def test_mrd_discriminator_shapes():
    """DiscriminatorR: 3 stride-2 time stages over the |STFT| image, 6 fmaps
    (BigVGAN/discriminators.py:140-236)."""
    from gpt_sovits_tpu.models.discriminators import MultiResolutionDiscriminator

    mrd = MultiResolutionDiscriminator(((128, 32, 64), (256, 64, 128)))
    y = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1024, 1)).astype(np.float32))
    params = mrd.init(jax.random.PRNGKey(0), y, y)
    r, g, fr, fg = mrd.apply(params, y, y * 0.5)
    assert len(r) == len(g) == len(fr) == len(fg) == 2
    for rr, ff in zip(r, fr):
        assert rr.ndim == 2 and rr.shape[0] == 2
        assert len(ff) == 6
    # real==gen inputs give identical outputs (shared params)
    r2, g2, _, _ = mrd.apply(params, y, y)
    for a, b in zip(r2, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
