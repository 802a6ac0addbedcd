"""S1 train-step tests (plain and DPO), grad-accum behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.models.t2s import T2SDecoder
from gpt_sovits_tpu.train.s1_train import S1TrainState, init_state, make_reject_y, make_train_step
from gpt_sovits_tpu.utils.config import S1Config, TrainConfig

TINY = S1Config(
    vocab_size=41, phoneme_vocab_size=37, embedding_dim=48, hidden_dim=48,
    num_heads=4, ffn_dim=96, num_layers=2, eos_id=40, bert_dim=16, max_len=128,
)
TRAIN = TrainConfig(grad_accum=2, warmup_steps=4)


def _batch(key, b=2, tx=8, ty=10):
    ks = jax.random.split(key, 3)
    return {
        "phoneme_ids": jax.random.randint(ks[0], (b, tx), 0, TINY.phoneme_vocab_size),
        "phoneme_lens": jnp.asarray([tx, tx - 2]),
        "semantic_ids": jax.random.randint(ks[1], (b, ty), 0, TINY.vocab_size - 1),
        "semantic_lens": jnp.asarray([ty, ty - 3]),
        "bert_features": jax.random.normal(ks[2], (b, tx, TINY.bert_dim)),
    }


def test_s1_train_step_plain():
    model = T2SDecoder(TINY)
    state = init_state(jax.random.PRNGKey(0), model, TRAIN)
    step = make_train_step(model, TRAIN)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    for i in range(3):
        state, m = step(state, _batch(jax.random.PRNGKey(i)), jax.random.PRNGKey(9))
        assert np.isfinite(float(m["loss"]))
    # grad_accum=2: params must have changed after >=2 steps
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(p0, p1)


def test_s1_train_step_dpo():
    model = T2SDecoder(TINY)
    cfg = TrainConfig(grad_accum=1, warmup_steps=2)
    state = init_state(jax.random.PRNGKey(0), model, cfg)
    step = make_train_step(model, cfg, use_dpo=True)
    state, m = step(state, _batch(jax.random.PRNGKey(5)), jax.random.PRNGKey(9))
    assert np.isfinite(float(m["loss"]))


def test_make_reject_y_shapes():
    y = jnp.arange(24).reshape(2, 12) % 40
    lens = jnp.asarray([12, 8])
    rej, rej_lens = make_reject_y(y, lens, jax.random.PRNGKey(0))
    assert rej.shape == y.shape
    assert np.all(np.asarray(rej_lens) >= 1)
    # rejected differs from chosen for at least one sequence
    assert not np.array_equal(np.asarray(rej), np.asarray(y))


def test_s1_train_step_scaled_adam():
    model = T2SDecoder(TINY)
    cfg = TrainConfig(grad_accum=1, warmup_steps=2)
    state = init_state(jax.random.PRNGKey(0), model, cfg, optimizer="scaled_adam")
    step = make_train_step(model, cfg, optimizer="scaled_adam")
    state, m = step(state, _batch(jax.random.PRNGKey(1)), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
