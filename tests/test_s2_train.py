"""S2 GAN train-step tests: losses finite, params update, VQ stays frozen."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.train.s2_train import init_state, make_train_step
from gpt_sovits_tpu.utils.config import MelConfig, S2Config, TrainConfig

CFG = S2Config(
    version="v2",
    spec_channels=65,
    segment_size=8,
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=4,
    kernel_size=3,
    upsample_rates=(8, 8),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(16, 16),
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    gin_channels=32,
    mrte_hidden=32,
    ssl_dim=32,
    n_codes=17,
)
MEL = MelConfig(sampling_rate=8000, n_fft=128, win_size=128, hop_size=64, num_mels=13)
TRAIN = TrainConfig(batch_size=2, segment_size=CFG.segment_size * MEL.hop_size)

B, TSPEC, TT = 2, 20, 6


def _batch(key):
    ks = jax.random.split(key, 4)
    return {
        "ssl": jax.random.normal(ks[0], (B, TSPEC * 2, CFG.ssl_dim)),
        "spec": jax.random.normal(ks[1], (B, TSPEC, CFG.spec_channels)) * 0.3 + 1.0,
        "spec_lengths": jnp.asarray([TSPEC, TSPEC - 3]),
        "wav": jax.random.normal(ks[2], (B, TSPEC * MEL.hop_size, 1)) * 0.1,
        "text": jax.random.randint(ks[3], (B, TT), 0, CFG.phoneme_vocab_size),
        "text_lengths": jnp.asarray([TT, TT - 2]),
    }


def test_s2_train_step():
    batch = _batch(jax.random.PRNGKey(0))
    state, gen, disc = init_state(jax.random.PRNGKey(1), CFG, TRAIN, batch)
    vq_before = np.asarray(state.params_g["params"]["quantizer"]["embed"]).copy()
    dec_before = np.asarray(
        jax.tree_util.tree_leaves(state.params_g["params"]["dec"])[0]
    ).copy()

    step = make_train_step(gen, disc, TRAIN, MEL)
    metrics_list = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        metrics_list.append(jax.tree_util.tree_map(float, metrics))

    for m in metrics_list:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    assert int(state.step) == 2
    # frozen quantizer unchanged
    np.testing.assert_array_equal(np.asarray(state.params_g["params"]["quantizer"]["embed"]), vq_before)
    # generator actually updated
    dec_after = np.asarray(jax.tree_util.tree_leaves(state.params_g["params"]["dec"])[0])
    assert not np.allclose(dec_after, dec_before)


def test_vq_ema_update_moves_codes_toward_data():
    from gpt_sovits_tpu.train.s2_train import VQEmaState, vq_ema_update

    rng = np.random.default_rng(0)
    k, d = 8, 4
    embed = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
    state = VQEmaState.init(embed)
    # all data near code 0's target location
    target = np.ones(d, np.float32) * 3.0
    x = jnp.asarray(target[None].repeat(64, 0) + rng.standard_normal((64, d)).astype(np.float32) * 0.01)
    codes = jnp.zeros(64, jnp.int32)
    e = embed
    for _ in range(200):
        e, state = vq_ema_update(e, state, x, codes, decay=0.9)
    # code 0 converges to the data mean; others decay toward laplace prior
    np.testing.assert_allclose(np.asarray(e[0]), target, atol=0.1)
