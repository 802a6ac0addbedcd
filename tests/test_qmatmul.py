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
