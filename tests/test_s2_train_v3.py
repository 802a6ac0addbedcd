"""v3 CFM trainer tests: full fine-tune freezing + LoRA-only updates."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3
from gpt_sovits_tpu.train.s2_train_v3 import (
    V3TrainState,
    init_lora,
    init_state,
    make_lora_train_step,
    make_train_step,
    merge_lora,
)
from gpt_sovits_tpu.utils.config import S2Config, TrainConfig

from test_v3 import V3_TINY  # tiny v3 config

B, TS, TSPEC, TT, TMEL = 2, 24, 24, 6, 45


def _batch(key):
    ks = jax.random.split(key, 4)
    return {
        "ssl": jax.random.normal(ks[0], (B, TS, V3_TINY.ssl_dim)),
        "spec": jax.random.normal(ks[1], (B, TSPEC, V3_TINY.spec_channels)) * 0.3,
        "spec_lengths": jnp.asarray([TSPEC, TSPEC - 4]),
        "mel": jax.random.normal(ks[2], (B, TMEL, 20)) * 0.3,
        "mel_lengths": jnp.asarray([TMEL, TMEL - 6]),
        "text": jax.random.randint(ks[3], (B, TT), 0, 100),
        "text_lengths": jnp.asarray([TT, TT - 2]),
    }


def test_v3_train_step_freezes_front():
    model = SynthesizerTrnV3(V3_TINY)
    batch = _batch(jax.random.PRNGKey(0))
    state = init_state(jax.random.PRNGKey(1), model, TrainConfig(batch_size=B), batch)
    enc_p_before = np.asarray(jax.tree_util.tree_leaves(state.params["params"]["enc_p"])[0]).copy()
    vq_before = np.asarray(state.params["params"]["quantizer"]["embed"]).copy()
    dit_before = np.asarray(jax.tree_util.tree_leaves(state.params["params"]["cfm"])[0]).copy()

    step = make_train_step(model, TrainConfig(batch_size=B))
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["cfm_loss"]))
    np.testing.assert_array_equal(np.asarray(state.params["params"]["quantizer"]["embed"]), vq_before)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.params["params"]["enc_p"])[0]), enc_p_before
    )
    dit_after = np.asarray(jax.tree_util.tree_leaves(state.params["params"]["cfm"])[0])
    assert not np.allclose(dit_after, dit_before)


def test_lora_init_merge_and_step():
    model = SynthesizerTrnV3(V3_TINY)
    batch = _batch(jax.random.PRNGKey(3))
    state = init_state(jax.random.PRNGKey(4), model, TrainConfig(batch_size=B), batch)
    lora = init_lora(state.params, rank=2, key=jax.random.PRNGKey(5))
    # lora targets exist (to_q etc. inside DiT blocks)
    leaves = jax.tree_util.tree_leaves(lora)
    assert leaves, "no lora targets found"
    # zero-init delta: merged == base
    merged = merge_lora(state.params, lora)
    for a, b in zip(jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from gpt_sovits_tpu.train.s2_train_v3 import make_lora_optimizer

    cfg = TrainConfig(batch_size=B, learning_rate=1e-3)
    opt_step = make_lora_train_step(model, cfg)
    state = V3TrainState(state.step, state.params, make_lora_optimizer(cfg).init(lora), lora)
    base_before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, m = opt_step(state, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(m["cfm_loss"]))
    # base unchanged, lora changed
    np.testing.assert_array_equal(np.asarray(jax.tree_util.tree_leaves(state.params)[0]), base_before)
    b_leaves = [l for l in jax.tree_util.tree_leaves(state.lora)]
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in b_leaves)
