"""Fused int8 dynamic-quant matmul kernel (ops/pallas/qmatmul.py) — exact
equivalence vs the XLA W8A8 composition it replaces, in interpreter mode
on CPU (compiled path is exercised by scripts/bench_v3.py on the chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gpt_sovits_tpu.ops.pallas.qmatmul import qdense_int8


def _xla_w8a8(x, wq, sw, bias):
    """The unfused reference formulation (models/dit.py QDense XLA path)."""
    sx = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = y.astype(jnp.float32) * sx * sw.reshape(1, -1)
    return (y + bias).astype(x.dtype)


def _mk(b, t, k, n, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (b, t, k), dtype) if b else jax.random.normal(ks[0], (t, k), dtype)
    w = jax.random.normal(ks[1], (k, n), jnp.float32) * 0.05
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    bias = jax.random.normal(ks[2], (n,), jnp.float32)
    return x, wq, s, bias


@pytest.mark.parametrize("shape", [(2, 256, 128, 256), (1, 512, 256, 128), (3, 100, 128, 128)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_qdense_matches_xla_formulation(shape, dtype):
    b, t, k, n = shape
    x, wq, s, bias = _mk(b, t, k, n, dtype)
    with pltpu.force_tpu_interpret_mode():
        got = qdense_int8(x, wq, s, bias, block_m=128)
    want = _xla_w8a8(x, wq, s, bias)
    assert got.shape == (b, t, n) and got.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_qdense_2d_and_ragged_t():
    # 2D input and T not a multiple of block_m (padding path)
    x, wq, s, bias = _mk(0, 130, 128, 128, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = qdense_int8(x, wq, s, bias, block_m=64)
    want = _xla_w8a8(x, wq, s, bias)
    assert got.shape == (130, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_qdense_accuracy_vs_float():
    # end-to-end quantization error against the unquantized matmul stays
    # in the expected W8A8 band (same bound as tests/test_dit_quant.py)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 128, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (256, 128), jnp.float32) * 0.05
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    bias = jnp.zeros((128,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(qdense_int8(x, wq, s, bias, block_m=128))
    ref = np.asarray(jnp.dot(x, w) + bias)
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.02, rel


def test_qkv_rope_matches_unfused_composition():
    """qkv_rope_int8 == [3x XLA W8A8 proj -> rope_rotate -> head split ->
    (B,H,T,dh) transpose] from models/dit.py."""
    from gpt_sovits_tpu.models.dit import rope_rotate
    from gpt_sovits_tpu.ops.pallas.qmatmul import qkv_rope_int8

    b, t, k, heads, dh = 2, 96, 128, 2, 64
    n = heads * dh
    x, wq_q, sq, bq = _mk(b, t, k, n, jnp.float32, seed=0)
    _, wk_q, sk, bk = _mk(b, t, k, n, jnp.float32, seed=1)
    _, wv_q, sv, bv = _mk(b, t, k, n, jnp.float32, seed=2)

    with pltpu.force_tpu_interpret_mode():
        qf, kf, vf = qkv_rope_int8(
            x, wq_q, wk_q, wv_q, sq, sk, sv, bq, bk, bv, dim_head=dh, block_m=32
        )

    def unfused(wq, s, bias, rope):
        y = _xla_w8a8(x, wq, s.reshape(1, -1) * 1.0, bias)
        if rope:
            y = rope_rotate(y, t, dh)
        return y.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)

    np.testing.assert_allclose(np.asarray(qf), np.asarray(unfused(wq_q, sq, bq, True)), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(kf), np.asarray(unfused(wk_q, sk, bk, True)), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(unfused(wv_q, sv, bv, False)), rtol=2e-2, atol=2e-2)
    assert qf.shape == (b, heads, t, dh)


def test_qdense_out_matches_unfused_composition():
    from gpt_sovits_tpu.ops.pallas.qmatmul import qdense_out_int8

    b, heads, t, dh, n = 2, 4, 64, 32, 96
    k = heads * dh
    key = jax.random.PRNGKey(9)
    attn = jax.random.normal(key, (b, heads, t, dh), jnp.float32)
    _, wq, s, bias = _mk(b, t, k, n, jnp.float32, seed=5)
    with pltpu.force_tpu_interpret_mode():
        got = qdense_out_int8(attn, wq, s, bias, block_m=32)
    merged = attn.transpose(0, 2, 1, 3).reshape(b, t, k)
    want = _xla_w8a8(merged, wq, s, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def _ln_mod_ref(x, sc, sh):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    return (xn * (1 + sc[:, None]) + sh[:, None]).astype(x.dtype)


def test_qdense_fused_glue_matches_unfused():
    """Round-5 glue fusion: LN+AdaLN prologue, gelu epilogue, gated
    residual epilogue — vs the separate-ops composition in DiTBlock."""
    b, t, k, n = 2, 128, 128, 256
    x, wq, s, bias = _mk(b, t, k, n, jnp.float32)
    key = jax.random.PRNGKey(9)
    sc = jax.random.normal(key, (b, k)) * 0.3
    sh = jax.random.normal(jax.random.fold_in(key, 1), (b, k)) * 0.3
    with pltpu.force_tpu_interpret_mode():
        got = qdense_int8(x, wq, s, bias, ln_mod=(sc, sh), act="gelu", block_m=64)
    want = jax.nn.gelu(_xla_w8a8(_ln_mod_ref(x, sc, sh), wq, s, bias), approximate=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)

    # gated residual epilogue
    res = jax.random.normal(jax.random.fold_in(key, 2), (b, t, n))
    gate = jax.random.normal(jax.random.fold_in(key, 3), (b, n)) * 0.5
    with pltpu.force_tpu_interpret_mode():
        got2 = qdense_int8(x, wq, s, bias, res_gate=(res, gate), block_m=64)
    want2 = res + gate[:, None] * _xla_w8a8(x, wq, s, bias)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=2e-2, atol=2e-2)


def test_qkv_rope_ln_mod_prologue():
    from gpt_sovits_tpu.ops.pallas.qmatmul import qkv_rope_int8

    b, t, k, n, dh = 1, 64, 128, 128, 64
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (b, t, k), jnp.float32)
    ws, ss, bs_ = [], [], []
    for i in range(3):
        _, wq, s, bias = _mk(b, t, k, n, jnp.float32, seed=10 + i)
        ws.append(wq); ss.append(s); bs_.append(bias)
    sc = jax.random.normal(jax.random.fold_in(key, 7), (b, k)) * 0.3
    sh = jax.random.normal(jax.random.fold_in(key, 8), (b, k)) * 0.3
    with pltpu.force_tpu_interpret_mode():
        q1, k1, v1 = qkv_rope_int8(
            x, *ws, *ss, *bs_, dim_head=dh, block_m=64)
        q2, k2, v2 = qkv_rope_int8(
            _ln_mod_ref(x, sc, sh), *ws, *ss, *bs_, dim_head=dh, block_m=64)
        q3, k3, v3 = qkv_rope_int8(
            x, *ws, *ss, *bs_, ln_mod=(sc, sh), dim_head=dh, block_m=64)
    # fused prologue == normalizing outside (same kernel downstream)
    for a, bt in [(q2, q3), (k2, k3), (v2, v3)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(bt), rtol=2e-2, atol=2e-2)
    # and it is NOT a no-op
    assert float(jnp.max(jnp.abs(q1 - q3))) > 1e-3


def test_qdense_out_res_gate_mask_epilogue():
    from gpt_sovits_tpu.ops.pallas.qmatmul import qdense_out_int8

    b, h, t, dh, n = 2, 4, 64, 32, 128
    k = h * dh
    key = jax.random.PRNGKey(5)
    attn = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    _, wq, s, bias = _mk(b, t, k, n, jnp.float32, seed=20)
    res = jax.random.normal(jax.random.fold_in(key, 1), (b, t, n))
    gate = jax.random.normal(jax.random.fold_in(key, 2), (b, n)) * 0.5
    mask = (jnp.arange(t)[None, :] < jnp.asarray([50, 64])[:, None]).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = qdense_out_int8(attn, wq, s, bias, res_gate_mask=(res, gate, mask), block_m=32)
    merged = attn.transpose(0, 2, 1, 3).reshape(b, t, k)
    proj = _xla_w8a8(merged, wq, s, bias)
    want = res + gate[:, None] * jnp.where(mask[..., None] > 0, proj, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
