"""Fused decode-step Pallas kernel vs the flax reference decode path
(interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.models.t2s import T2SDecoder
from gpt_sovits_tpu.utils.config import S1Config

TINY = S1Config(
    vocab_size=41, phoneme_vocab_size=37, embedding_dim=256, hidden_dim=256,
    num_heads=8, ffn_dim=512, num_layers=3, eos_id=40, bert_dim=16, max_len=128,
)


def _flax_decode(model, params, tok_emb, k_caches, v_caches, valid, write_idx):
    return model.apply(params, tok_emb, k_caches, v_caches, valid, write_idx, method=T2SDecoder.decode_step)


@pytest.mark.parametrize("b", [1, 2])
def test_fused_decode_matches_flax(b):
    from jax.experimental.pallas import tpu as pltpu

    from gpt_sovits_tpu.ops.pallas.decode_step import fused_decode_step, stack_weights_from_params

    model = T2SDecoder(TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)

    rng = np.random.default_rng(0)
    L, d, h = TINY.num_layers, TINY.hidden_dim, TINY.num_heads
    dh = d // h
    t_pad = 256
    n_valid = 70
    k_c = rng.standard_normal((L, b, t_pad, h, dh)).astype(np.float32) * 0.3
    v_c = rng.standard_normal((L, b, t_pad, h, dh)).astype(np.float32) * 0.3
    valid = np.zeros((b, t_pad), bool)
    valid[:, :n_valid] = True
    valid[0, 5:9] = False  # irregular hole (left-padding pattern)
    x = rng.standard_normal((b, 1, d)).astype(np.float32) * 0.5
    write_idx = n_valid

    # flax reference: valid must INCLUDE the write slot (decode_step writes
    # then attends); the kernel handles the current token separately
    valid_flax = valid.copy()
    valid_flax[:, write_idx] = True
    logits_ref, k_ref, v_ref = _flax_decode(
        model, params, jnp.asarray(x), jnp.asarray(k_c), jnp.asarray(v_c),
        jnp.asarray(valid_flax), write_idx,
    )
    # reference hidden before the head: recompute via predict^-1 is awkward;
    # instead compare k/v writes and the final logits through the head
    weights = stack_weights_from_params(params, L)
    # kernel wants a combined (L, B, T, 2D) K||V cache
    kv_flat = jnp.concatenate(
        [jnp.asarray(k_c.reshape(L, b, t_pad, d)), jnp.asarray(v_c.reshape(L, b, t_pad, d))], axis=-1
    )
    with pltpu.force_tpu_interpret_mode():
        y, kv_out = fused_decode_step(
            jnp.asarray(x[:, 0]), weights, kv_flat,
            jnp.asarray(valid.astype(np.float32)), jnp.asarray(write_idx),
            chunk=64, num_heads=h,
        )
    # compare new K/V written at write_idx
    np.testing.assert_allclose(
        np.asarray(kv_out[:, :, write_idx, :d]).reshape(L, b, h, dh),
        np.asarray(k_ref[:, :, write_idx]),
        atol=2e-2, rtol=2e-2,  # kernel stores bf16-free f32; flax casts via dtype
    )
    # compare logits after the head
    head = params["params"]["predict"]["kernel"]
    logits_kernel = jnp.asarray(y) @ head
    np.testing.assert_allclose(
        np.asarray(logits_kernel), np.asarray(logits_ref), atol=5e-2, rtol=5e-2
    )
    # tighter check on hidden correlation
    a = np.asarray(logits_kernel).ravel()
    r = np.asarray(logits_ref).ravel()
    corr = np.corrcoef(a, r)[0, 1]
    assert corr > 0.9999, corr


def test_generate_fused_matches_xla_greedy():
    """End-to-end: generate() with the fused kernel must reproduce the XLA
    decode loop under greedy sampling (modulo bf16 cache rounding)."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt_sovits_tpu.models.t2s import generate

    model = T2SDecoder(TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    rng = np.random.default_rng(3)
    b, tx, tp = 2, 10, 7
    phones = jnp.asarray(rng.integers(0, TINY.phoneme_vocab_size, (b, tx)))
    bert = jnp.asarray(rng.standard_normal((b, tx, TINY.bert_dim)).astype(np.float32) * 0.1)
    prompts = jnp.asarray(rng.integers(0, TINY.vocab_size - 1, (b, tp)))
    kw = dict(max_new_tokens=12, top_k=1, repetition_penalty=1.0, early_stop_num=-1)
    args = (model, params, phones, jnp.asarray([tx, tx - 3]), bert, prompts, jnp.asarray([tp, tp - 2]))

    out_xla = generate(*args, jax.random.PRNGKey(1), **kw)
    with pltpu.force_tpu_interpret_mode():
        out_fused = generate(*args, jax.random.PRNGKey(1), use_fused_kernel=True, **kw)

    t_x = np.asarray(out_xla.tokens)
    t_f = np.asarray(out_fused.tokens)
    n = min(int(out_xla.lengths.min()), int(out_fused.lengths.min()))
    match = (t_x[:, :n] == t_f[:, :n]).mean()
    assert match >= 0.9, (match, t_x[:, :n], t_f[:, :n])


def test_generate_fused_int8_close_to_bf16():
    """Weight-only int8 decode: greedy tokens track the bf16 fused path."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt_sovits_tpu.models.t2s import generate
    from gpt_sovits_tpu.ops.pallas.decode_step import _quantize_cols

    # quantization itself is exact modulo rounding: dequantized weights are
    # within one scale step of the originals
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 8, 16)).astype(np.float32))
    q, s = _quantize_cols(w)
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(s), np.asarray(w), atol=float(s.max()) * 0.51)

    model = T2SDecoder(TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    nrng = np.random.default_rng(5)
    b, tx, tp = 1, 10, 7
    phones = jnp.asarray(nrng.integers(0, TINY.phoneme_vocab_size, (b, tx)))
    bert = jnp.asarray(nrng.standard_normal((b, tx, TINY.bert_dim)).astype(np.float32) * 0.1)
    prompts = jnp.asarray(nrng.integers(0, TINY.vocab_size - 1, (b, tp)))
    kw = dict(max_new_tokens=10, top_k=1, repetition_penalty=1.0, early_stop_num=-1)
    args = (model, params, phones, jnp.asarray([tx]), bert, prompts, jnp.asarray([tp]))

    with pltpu.force_tpu_interpret_mode():
        out16 = generate(*args, jax.random.PRNGKey(1), use_fused_kernel=True, **kw)
        out8 = generate(*args, jax.random.PRNGKey(1), use_fused_kernel=True, weight_quant="int8", **kw)
    t16, t8 = np.asarray(out16.tokens), np.asarray(out8.tokens)
    n = min(int(out16.lengths.min()), int(out8.lengths.min()))
    match = (t16[:, :n] == t8[:, :n]).mean()
    assert match >= 0.8, (match, t16[:, :n], t8[:, :n])


def test_fused_decode_int8_kv_close_to_bf16(b=2):
    """int8 KV cache mode: per-token symmetric quantized K/V + in-kernel
    rescale stays within ~2% of the full-precision attention output, and
    the new token's K/V round-trips through the quantized writeback."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt_sovits_tpu.ops.pallas.decode_step import (
        fused_decode_step, quantize_kv_cache, stack_weights_from_params,
    )

    model = T2SDecoder(TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    weights = stack_weights_from_params(params, TINY.num_layers)

    rng = np.random.default_rng(1)
    L, d = TINY.num_layers, TINY.hidden_dim
    t_pad = 256
    n_valid = 64
    kv = jnp.asarray(rng.standard_normal((L, b, t_pad, 2 * d)).astype(np.float32) * 0.3)
    valid = np.zeros((b, t_pad), np.float32)
    valid[:, :n_valid] = 1.0
    x = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32) * 0.5)

    with pltpu.force_tpu_interpret_mode():
        y_ref, kv_ref = fused_decode_step(
            x, weights, kv.astype(jnp.bfloat16), jnp.asarray(valid), n_valid, chunk=128
        )
        kv_q, scales = quantize_kv_cache(kv)
        y_q, kv_q2, scales2 = fused_decode_step(
            x, weights, kv_q, jnp.asarray(valid), n_valid, scales, chunk=128
        )

    rel = np.abs(np.asarray(y_q) - np.asarray(y_ref)).mean() / (
        np.abs(np.asarray(y_ref)).mean() + 1e-9
    )
    assert rel < 0.02, rel
    # writeback: the new slot holds int8 codes whose dequant matches the
    # bf16 path's written K/V
    new_q = np.asarray(kv_q2[:, :, n_valid, :], np.float32)
    sk = np.asarray(scales2[:, :, 0, n_valid])[..., None]
    sv = np.asarray(scales2[:, :, 1, n_valid])[..., None]
    deq = np.concatenate([new_q[..., :d] * sk, new_q[..., d:] * sv], axis=-1)
    ref_new = np.asarray(kv_ref[:, :, n_valid, :], np.float32)
    np.testing.assert_allclose(deq, ref_new, rtol=0.05, atol=0.02)


def test_generate_int8_kv_greedy_close(b=2):
    """generate() with kv_cache_quant=int8: greedy decode stays on the
    bf16-KV trajectory for a tiny model (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt_sovits_tpu.models.t2s import generate

    model = T2SDecoder(TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    rng = np.random.default_rng(3)
    tx, tp, max_new = 12, 9, 16
    phones = jnp.asarray(rng.integers(1, TINY.phoneme_vocab_size, (b, tx)), jnp.int32)
    bert = jnp.asarray(rng.standard_normal((b, tx, TINY.bert_dim)) * 0.1, jnp.float32)
    prompt = jnp.asarray(rng.integers(0, TINY.vocab_size - 1, (b, tp)), jnp.int32)
    lens = jnp.full((b,), tx, jnp.int32)
    plens = jnp.full((b,), tp, jnp.int32)

    kw = dict(max_new_tokens=max_new, early_stop_num=max_new, top_k=1, top_p=1.0,
              temperature=1.0, repetition_penalty=1.35, use_fused_kernel=True)
    with pltpu.force_tpu_interpret_mode():
        ref = generate(model, params, phones, lens, bert, prompt, plens,
                       jax.random.PRNGKey(5), **kw)
        got = generate(model, params, phones, lens, bert, prompt, plens,
                       jax.random.PRNGKey(5), kv_cache_quant="int8", **kw)
    a = np.asarray(ref.tokens)
    g = np.asarray(got.tokens)
    agree = (a == g).mean()
    assert agree >= 0.9, f"greedy agreement {agree} with int8 KV"
