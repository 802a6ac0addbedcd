"""One-shot-softmax int8-P@V attention kernel (ops/pallas/qflash.py) vs
the f32 einsum reference (the models/dit.py non-flash path), interpreter
mode on CPU. The compiled path is exercised on-chip by
scripts/probe_qflash.py / scripts/bench_v3.py and the serving perf
contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gpt_sovits_tpu.ops.pallas.qflash import flash_attn_int8


def _ref_attn(q, k, v, mask, sm_scale):
    """models/dit.py einsum path (f32): kv-axis mask only. Returns the
    MERGED (B, T, H*dh) layout qflash emits."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * sm_scale
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    b, h, t, dh = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _mk(b, h, t, dh, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, t, dh), dtype)
    k = jax.random.normal(ks[1], (b, h, t, dh), dtype)
    v = jax.random.normal(ks[2], (b, h, t, dh), dtype)
    return q, k, v


@pytest.mark.parametrize("shape", [(2, 2, 256, 64), (1, 4, 512, 64)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_qflash_matches_einsum(shape, dtype):
    b, h, t, dh = shape
    q, k, v = _mk(b, h, t, dh, dtype=dtype)
    sm = 1.0 / float(np.sqrt(dh))
    with pltpu.force_tpu_interpret_mode():
        got = flash_attn_int8(q, k, v, sm_scale=sm)
    want = _ref_attn(q, k, v, None, sm)
    assert got.shape == (b, t, h * dh) and got.dtype == q.dtype
    # int8 probs/V rounding ~1%; bf16 inputs add q*sm_scale + output
    # rounding on top
    tol = 4e-2 if dtype == jnp.float32 else 7e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=tol, atol=tol
    )


def test_qflash_odd_head_count():
    # H odd -> single-head grid-step fallback
    b, h, t, dh = 1, 3, 256, 64
    q, k, v = _mk(b, h, t, dh, seed=5)
    sm = 1.0 / float(np.sqrt(dh))
    with pltpu.force_tpu_interpret_mode():
        got = flash_attn_int8(q, k, v, sm_scale=sm)
    want = _ref_attn(q, k, v, None, sm)
    assert got.shape == (b, t, h * dh)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=4e-2, atol=3e-2
    )


def test_qflash_kv_mask():
    b, h, t, dh = 2, 2, 256, 64
    q, k, v = _mk(b, h, t, dh, seed=1)
    lens = np.array([256, 131])
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    sm = 1.0 / float(np.sqrt(dh))
    with pltpu.force_tpu_interpret_mode():
        got = flash_attn_int8(q, k, v, mask, sm_scale=sm)
    want = _ref_attn(q, k, v, mask, sm)
    # compare REAL query rows only (pad-query rows are caller-masked)
    for i, ln in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(got[i, :ln], np.float32),
            np.asarray(want[i, :ln], np.float32),
            rtol=4e-2, atol=3e-2,
        )


def test_qflash_block_q_tiling():
    b, h, t, dh = 1, 2, 512, 64
    q, k, v = _mk(b, h, t, dh, seed=2)
    sm = 1.0 / float(np.sqrt(dh))
    with pltpu.force_tpu_interpret_mode():
        whole = flash_attn_int8(q, k, v, sm_scale=sm, block_q=512)
        tiled = flash_attn_int8(q, k, v, sm_scale=sm, block_q=128)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(tiled), rtol=1e-6, atol=1e-6)


def test_qflash_probs_precision_peaky():
    """Peaky rows (large logit spread): bf16 QK^T keeps logits exact, so
    the error is the int8 prob rounding on a near-one-hot row — bounded
    by ~|v|/127 per element."""
    b, h, t, dh = 1, 2, 256, 64
    q, k, v = _mk(b, h, t, dh, seed=3)
    q = q * 4.0  # sharpen logits
    sm = 1.0 / float(np.sqrt(dh))
    with pltpu.force_tpu_interpret_mode():
        got = flash_attn_int8(q, k, v, sm_scale=sm)
    want = _ref_attn(q, k, v, None, sm)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=8e-2, atol=6e-2
    )
