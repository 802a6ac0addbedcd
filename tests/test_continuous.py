"""Continuous batching (infer/continuous.py): equivalence with generate()
under argmax sampling, mid-decode admission, slot reuse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.infer.continuous import ContinuousBatcher
from gpt_sovits_tpu.models.t2s import T2SDecoder, generate
from gpt_sovits_tpu.utils.config import S1Config

CFG = S1Config(
    vocab_size=41, phoneme_vocab_size=100, embedding_dim=48, hidden_dim=48,
    num_heads=4, ffn_dim=96, num_layers=2, eos_id=40, bert_dim=8,
    max_len=1024, semantic_frame_rate=25,
)

ARGMAX = dict(top_k=1, top_p=1.0, temperature=1.0, repetition_penalty=1.35)


@pytest.fixture(scope="module")
def model():
    m = T2SDecoder(CFG)
    params = m.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    return m, params


def _mk_request(seed, tx=12, tp=9):
    rng = np.random.default_rng(seed)
    phones = rng.integers(1, CFG.phoneme_vocab_size, tx).astype(np.int32)
    bert = rng.standard_normal((tx, CFG.bert_dim)).astype(np.float32) * 0.1
    prompt = rng.integers(0, CFG.vocab_size - 1, tp).astype(np.int32)
    return phones, bert, prompt


def _reference_tokens(model, params, phones, bert, prompt, max_new):
    """Single-request generate() under argmax."""
    out = generate(
        model, params,
        jnp.asarray(phones[None]), jnp.asarray([len(phones)]),
        jnp.asarray(bert[None]), jnp.asarray(prompt[None]), jnp.asarray([len(prompt)]),
        jax.random.PRNGKey(123), max_new_tokens=max_new, early_stop_num=max_new, **ARGMAX,
    )
    n = int(out.lengths[0])
    return np.asarray(out.tokens[0, :n])


def test_single_request_matches_generate(model):
    m, params = model
    phones, bert, prompt = _mk_request(1)
    max_new = 24
    want = _reference_tokens(m, params, phones, bert, prompt, max_new)

    cb = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new, **ARGMAX)
    rid = cb.submit(phones, bert, prompt)
    done = cb.drain(n=7)
    assert rid in done
    np.testing.assert_array_equal(done[rid], want)


def test_staggered_admission_matches_generate(model):
    m, params = model
    max_new = 24
    reqs = [_mk_request(s) for s in (2, 3, 4)]
    wants = [_reference_tokens(m, params, *r, max_new) for r in reqs]

    cb = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new, **ARGMAX)
    r0 = cb.submit(*reqs[0])
    got = dict(cb.step(n=5))  # request 0 mid-decode
    r1 = cb.submit(*reqs[1])  # joins while r0 is running
    got.update(cb.step(n=5))
    r2 = cb.submit(*reqs[2])  # queued (2 slots busy) or joins a free slot
    got.update(cb.drain(n=5))
    for rid, want in zip((r0, r1, r2), wants):
        assert rid in got, (rid, got.keys())
        np.testing.assert_array_equal(got[rid], want)
    # r1 was admitted before r0 finished (true mid-decode join)
    assert cb.admitted_at[r1] < cb.finished_at[r0]


def test_more_requests_than_slots(model):
    m, params = model
    max_new = 16
    cb = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new, **ARGMAX)
    rids = [cb.submit(*_mk_request(10 + s)) for s in range(5)]
    done = cb.drain(n=8)
    assert set(done) == set(rids)
    for rid in rids:
        assert 1 <= len(done[rid]) <= max_new
        assert np.all(done[rid] < CFG.vocab_size)


def test_cap_terminates(model):
    m, params = model
    cb = ContinuousBatcher(m, params, slots=1, tx_max=16, tp_max=16, max_new=8, **ARGMAX)
    rid = cb.submit(*_mk_request(42))
    done = cb.drain(n=4)
    assert rid in done and len(done[rid]) <= 8
    assert cb.pending == 0


def test_length_validation(model):
    m, params = model
    cb = ContinuousBatcher(m, params, slots=1, tx_max=8, tp_max=8, max_new=8, **ARGMAX)
    with pytest.raises(ValueError, match="phones length"):
        cb.submit(np.ones(20, np.int32), None, np.ones(4, np.int32))
    with pytest.raises(ValueError, match="prompt length"):
        cb.submit(np.ones(4, np.int32), None, np.ones(20, np.int32))


def test_fused_segment_matches_unfused(model):
    """Fused-kernel continuous mode (per-row write indices through the
    Pallas decode step, interpret mode) produces the same tokens as the
    XLA path under argmax."""
    from jax.experimental.pallas import tpu as pltpu

    m, params = model
    max_new = 12
    reqs = [_mk_request(s) for s in (21, 22)]

    cb_x = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new,
                             use_fused=False, **ARGMAX)
    rids_x = [cb_x.submit(*r) for r in reqs]
    want = cb_x.drain(n=6)

    with pltpu.force_tpu_interpret_mode():
        cb_f = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new,
                                 use_fused=True, **ARGMAX)
        rids_f = [cb_f.submit(*r) for r in reqs]
        got = cb_f.drain(n=6)
    for rx, rf in zip(rids_x, rids_f):
        np.testing.assert_array_equal(got[rf], want[rx])


def test_fused_kv_int8_close(model):
    """Continuous fused mode with int8 KV pool: greedy tokens stay on the
    bf16-KV trajectory (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    m, params = model
    max_new = 12
    reqs = [_mk_request(s) for s in (31, 32)]

    cb_ref = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new,
                               use_fused=False, **ARGMAX)
    want = {}
    rids_ref = [cb_ref.submit(*r) for r in reqs]
    want = cb_ref.drain(n=6)

    with pltpu.force_tpu_interpret_mode():
        cb = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new,
                               use_fused=True, kv_quant="int8", **ARGMAX)
        rids = [cb.submit(*r) for r in reqs]
        got = cb.drain(n=6)
    total = agree = 0
    for rr, rq in zip(rids_ref, rids):
        a, g = want[rr], got[rq]
        n = min(len(a), len(g))
        total += n
        agree += (a[:n] == g[:n]).sum()
    assert agree / max(total, 1) >= 0.8, (agree, total)


def test_per_request_seed_reproducible(model):
    """A seeded request's token stream is identical whether it runs alone
    or with pool co-tenants (per-slot PRNG keys + per-row sampling)."""
    m, params = model
    max_new = 16
    req = _mk_request(50)
    sampling = dict(top_k=5, top_p=0.9, temperature=0.9, repetition_penalty=1.2)

    cb1 = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new)
    r_alone = cb1.submit(*req, seed=7, **sampling)
    alone = cb1.drain(n=5)[r_alone]

    cb2 = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new)
    cb2.submit(*_mk_request(51), seed=8, temperature=1.3)  # co-tenant, different params
    cb2.step(n=3)  # co-tenant mid-decode before ours joins
    r_shared = cb2.submit(*req, seed=7, **sampling)
    shared = cb2.drain(n=5)[r_shared]
    np.testing.assert_array_equal(alone, shared)


def test_mixed_sampling_params_one_pool(model):
    """Per-row traced sampling: an argmax row decodes its generate()
    trajectory while sharing the pool with a high-temperature row."""
    m, params = model
    max_new = 16
    req = _mk_request(60)
    want = _reference_tokens(m, params, *req, max_new)

    cb = ContinuousBatcher(m, params, slots=2, tx_max=16, tp_max=16, max_new=max_new,
                           top_k=50, top_p=1.0, temperature=1.5, repetition_penalty=1.0)
    cb.submit(*_mk_request(61))  # pool-default sampling (hot)
    rid = cb.submit(*req, top_k=1, repetition_penalty=1.35)  # argmax override
    got = cb.drain(n=5)
    np.testing.assert_array_equal(got[rid], want)
