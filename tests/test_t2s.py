"""S1 AR model tests.

The decode loop (preallocated-cache while_loop) is validated by padding
invariance: batched generation with left-padded text / right-padded prompts
must produce exactly the tokens that per-sequence generation produces under
greedy (top_k=1) sampling. This covers masks, positions, KV cache writes and
the per-sequence first-logits path in one go.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.models.t2s import (
    T2SDecoder,
    build_prefix_attn_bias,
    generate,
    sample_token,
    t2s_loss,
)
from gpt_sovits_tpu.utils.config import S1Config, replace

TINY = S1Config(
    vocab_size=41,
    phoneme_vocab_size=37,
    embedding_dim=64,
    hidden_dim=64,
    num_heads=4,
    ffn_dim=128,
    num_layers=2,
    eos_id=40,
    bert_dim=16,
    max_len=256,
    max_new_tokens=24,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = T2SDecoder(TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    return model, params


def _make_batch(key, b, tx, tp, x_lens, p_lens):
    k1, k2, k3 = jax.random.split(key, 3)
    # left-pad text
    x = jax.random.randint(k1, (b, tx), 0, TINY.phoneme_vocab_size)
    ar = jnp.arange(tx)[None, :]
    x = jnp.where(ar >= (tx - jnp.asarray(x_lens)[:, None]), x, 0)
    bert = jax.random.normal(k2, (b, tx, TINY.bert_dim))
    p = jax.random.randint(k3, (b, tp), 0, TINY.vocab_size - 1)
    arp = jnp.arange(tp)[None, :]
    p = jnp.where(arp < jnp.asarray(p_lens)[:, None], p, 0)
    return x, bert, p


def test_loss_and_grads_finite(tiny_model):
    model, params = tiny_model
    key = jax.random.PRNGKey(1)
    b, tx, ty = 2, 10, 14
    x, bert, y = _make_batch(key, b, tx, ty, [10, 7], [14, 9])

    def loss_fn(p):
        loss, aux = t2s_loss(model, p, x, jnp.asarray([10, 7]), y, jnp.asarray([14, 9]), bert)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert 0.0 <= float(aux["acc"]) <= 1.0


def test_loss_padding_invariance(tiny_model):
    """Extra padding on either stream must not change the loss."""
    model, params = tiny_model
    key = jax.random.PRNGKey(2)
    x, bert, y = _make_batch(key, 1, 8, 10, [8], [10])
    loss1, _ = t2s_loss(model, params, x, jnp.asarray([8]), y, jnp.asarray([10]), bert)
    # add left-padding to text, right-padding to audio
    x2 = jnp.pad(x, ((0, 0), (3, 0)))
    bert2 = jnp.pad(bert, ((0, 0), (3, 0), (0, 0)))
    y2 = jnp.pad(y, ((0, 0), (0, 4)))
    loss2, _ = t2s_loss(model, params, x2, jnp.asarray([8]), y2, jnp.asarray([10]), bert2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)


def test_greedy_generate_padding_invariance(tiny_model):
    model, params = tiny_model
    key = jax.random.PRNGKey(3)
    b, tx, tp = 3, 12, 9
    x_lens, p_lens = [12, 8, 5], [9, 6, 3]
    x, bert, p = _make_batch(key, b, tx, tp, x_lens, p_lens)
    kw = dict(max_new_tokens=16, top_k=1, repetition_penalty=1.0, early_stop_num=-1)

    out_b = generate(
        T2SDecoder(TINY), params, x, jnp.asarray(x_lens), bert, p, jnp.asarray(p_lens),
        jax.random.PRNGKey(7), **kw,
    )
    for i in range(b):
        xi = x[i : i + 1, tx - x_lens[i] :]
        bi = bert[i : i + 1, tx - x_lens[i] :]
        pi = p[i : i + 1, : p_lens[i]]
        out_1 = generate(
            T2SDecoder(TINY), params, xi, jnp.asarray([x_lens[i]]), bi, pi, jnp.asarray([p_lens[i]]),
            jax.random.PRNGKey(11), **kw,
        )
        n = int(out_1.lengths[0])
        nb = int(out_b.lengths[i])
        assert nb == n, f"seq {i}: batched len {nb} != single len {n}"
        np.testing.assert_array_equal(
            np.asarray(out_b.tokens[i, :n]), np.asarray(out_1.tokens[0, :n]), err_msg=f"seq {i}"
        )


def test_generate_stops_and_shapes(tiny_model):
    model, params = tiny_model
    key = jax.random.PRNGKey(4)
    x, bert, p = _make_batch(key, 2, 6, 4, [6, 6], [4, 4])
    out = generate(
        T2SDecoder(TINY), params, x, jnp.asarray([6, 6]), bert, p, jnp.asarray([4, 4]),
        jax.random.PRNGKey(5), max_new_tokens=20, top_k=5, temperature=0.9,
    )
    assert out.tokens.shape == (2, 20)
    assert np.all(np.asarray(out.lengths) >= 1)
    assert np.all(np.asarray(out.lengths) <= 20)
    # tokens within semantic codebook range (no EOS leaks into output)
    toks = np.asarray(out.tokens)
    lens = np.asarray(out.lengths)
    for i in range(2):
        assert np.all(toks[i, : lens[i]] < TINY.eos_id)


def _np_filter_oracle(logits, history_ids, top_k, top_p, temperature, rp):
    """Numpy oracle for the reference filtering order (utils.py:147-196)."""
    logits = logits.copy().astype(np.float64)
    for b in range(logits.shape[0]):
        for t in set(history_ids[b]):
            s = logits[b, t]
            logits[b, t] = s * rp if s < 0 else s / rp
    if top_p < 1.0:
        for b in range(logits.shape[0]):
            order = np.argsort(-logits[b], kind="stable")
            probs = np.exp(logits[b, order] - logits[b, order].max())
            probs = probs / probs.sum()
            cum = np.cumsum(probs)
            remove = cum > top_p
            remove[0] = False
            logits[b, order[remove]] = -np.inf
    logits = logits / max(temperature, 1e-5)
    if top_k > 0:
        for b in range(logits.shape[0]):
            kth = np.sort(logits[b])[-top_k]
            logits[b, logits[b] < kth] = -np.inf
    return logits


def test_sample_token_filtering_matches_oracle():
    rng = np.random.default_rng(0)
    v = 32
    logits = rng.standard_normal((2, v)).astype(np.float32) * 3
    history = [[1, 5, 5, 9], [0, 2]]
    presence = np.zeros((2, v), dtype=bool)
    for b, h in enumerate(history):
        presence[b, h] = True
    kw = dict(top_k=8, top_p=0.8, temperature=0.7, repetition_penalty=1.35)
    oracle = _np_filter_oracle(logits, history, kw["top_k"], kw["top_p"], kw["temperature"], kw["repetition_penalty"])
    # sample many times with greedy-from-filtered: the support must match
    tok = sample_token(jax.random.PRNGKey(0), jnp.asarray(logits), jnp.asarray(presence), **kw)
    assert np.isfinite(oracle[0, int(tok[0])])
    assert np.isfinite(oracle[1, int(tok[1])])
    # greedy agreement: top_k=1 must pick oracle argmax
    kw1 = dict(kw, top_k=1)
    oracle1 = _np_filter_oracle(logits, history, 1, kw["top_p"], kw["temperature"], kw["repetition_penalty"])
    tok1 = sample_token(jax.random.PRNGKey(1), jnp.asarray(logits), jnp.asarray(presence), **kw1)
    np.testing.assert_array_equal(np.asarray(tok1), np.argmax(np.nan_to_num(oracle1, neginf=-1e30), axis=-1))


def test_attn_bias_no_nan_rows():
    x_valid = jnp.asarray([[False, True, True]])
    y_valid = jnp.asarray([[True, False]])
    bias = build_prefix_attn_bias(x_valid, y_valid)
    assert bias.shape == (1, 1, 5, 5)
    # every row has at least one attendable key
    assert bool(jnp.all(jnp.any(bias[0, 0] == 0.0, axis=-1)))
