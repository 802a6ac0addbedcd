"""jaxpr -> ONNX export: graphs must execute to the same numbers as the JAX
model (via the independently torch-tested onnx_lite executor).

Mirrors the reference's onnx_export.py artifact split (t2s encoder / decode
step + VITS decode; reference onnx_export.py:1-398, models_onnx.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.utils.onnx_export import (
    export_s1_prefill_onnx,
    export_s1_step_onnx,
    export_s2_decode_onnx,
    export_vocoder_onnx,
    to_onnx,
)
from gpt_sovits_tpu.utils.onnx_lite import OnnxModel

from test_vits import TINY as S2_TINY, _inputs
from test_t2s import TINY as S1_TINY


def test_to_onnx_basics():
    fn = lambda x, w: jnp.tanh(x @ w) * jax.nn.sigmoid(x @ w)
    x = np.random.RandomState(0).randn(2, 4).astype(np.float32)
    w = (np.random.RandomState(1).randn(4, 3) * 0.1).astype(np.float32)
    m = OnnxModel(to_onnx(fn, (jnp.asarray(x), jnp.asarray(w))))
    np.testing.assert_allclose(np.asarray(m(x, w)[0]), np.asarray(fn(x, w)), atol=1e-6)


def test_to_onnx_dynamic_slices():
    def fn(cache, upd, i):
        c = jax.lax.dynamic_update_slice(cache, upd, (jnp.asarray(0), i, jnp.asarray(0)))
        return jax.lax.dynamic_slice(c, (jnp.asarray(0), i, jnp.asarray(0)), (2, 3, 4))

    cache = np.zeros((2, 10, 4), np.float32)
    upd = np.random.RandomState(2).randn(2, 3, 4).astype(np.float32)
    m = OnnxModel(to_onnx(fn, (jnp.asarray(cache), jnp.asarray(upd), jnp.asarray(5))))
    np.testing.assert_allclose(
        np.asarray(m(cache, upd, np.asarray(5))[0]),
        np.asarray(fn(cache, upd, jnp.asarray(5))),
        atol=1e-6,
    )


def test_to_onnx_flip_and_grouped_conv_transpose():
    def fg(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1,), ((3, 3),), lhs_dilation=(2,),
            dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=4,
        )
        return jnp.flip(y, axis=2)

    x = np.random.RandomState(0).randn(1, 8, 16).astype(np.float32)
    w = np.random.RandomState(1).randn(8, 2, 5).astype(np.float32)
    m = OnnxModel(to_onnx(fg, (jnp.asarray(x), jnp.asarray(w))))
    np.testing.assert_allclose(np.asarray(m(x, w)[0]), np.asarray(fg(x, w)), atol=1e-4)


def _s2_model():
    from gpt_sovits_tpu.models.vits import SynthesizerTrn

    model = SynthesizerTrn(S2_TINY)
    ssl, spec, text, _ = _inputs(jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2), "slice": jax.random.PRNGKey(3)},
        ssl, spec, jnp.asarray([24, 24]), text, jnp.asarray([8, 8]),
        method=SynthesizerTrn.init_all,
    )
    return model, params


def test_s2_decode_onnx_parity():
    from gpt_sovits_tpu.models.vits import SynthesizerTrn

    model, params = _s2_model()
    blob = export_s2_decode_onnx(model, params, b=1, tc=12, tt=8, tr=16)
    om = OnnxModel(blob)
    codes = np.ones((1, 12), np.int32)
    txt = np.ones((1, 8), np.int32)
    ref = (np.random.RandomState(0).randn(1, 16, S2_TINY.spec_channels) * 0.3).astype(np.float32)
    got = om(codes, np.asarray([12], np.int32), txt, np.asarray([8], np.int32), ref, np.asarray([16], np.int32))
    want = jax.tree_util.tree_leaves(
        model.apply(
            params, jnp.asarray(codes), jnp.asarray([12]), jnp.asarray(txt), jnp.asarray([8]),
            jnp.asarray(ref), jnp.asarray([16]), method=SynthesizerTrn.decode,
        )
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)


def test_s1_step_and_prefill_onnx_parity():
    from gpt_sovits_tpu.models.t2s import T2SDecoder

    model = T2SDecoder(S1_TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    h, dh = S1_TINY.num_heads, S1_TINY.hidden_dim // S1_TINY.num_heads
    rng = np.random.RandomState(1)

    om = OnnxModel(export_s1_step_onnx(model, params, b=1, t_cache=64))
    e = (rng.randn(1, 1, S1_TINY.embedding_dim) * 0.1).astype(np.float32)
    k = (rng.randn(S1_TINY.num_layers, 1, 64, h, dh) * 0.1).astype(np.float32)
    v = (rng.randn(S1_TINY.num_layers, 1, 64, h, dh) * 0.1).astype(np.float32)
    valid = np.zeros((1, 64), bool)
    valid[:, :10] = True
    got = om(e, k, v, valid, np.asarray(10, np.int32))
    want = jax.tree_util.tree_leaves(
        model.apply(params, jnp.asarray(e), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid),
                    jnp.asarray(10), method=T2SDecoder.decode_step)
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)

    T = 12
    omp = OnnxModel(export_s1_prefill_onnx(model, params, b=1, t=T))
    xy = (rng.randn(1, T, S1_TINY.embedding_dim) * 0.1).astype(np.float32)
    bias = np.where(np.tril(np.ones((T, T), bool))[None, None], 0.0, -1e9).astype(np.float32)
    got = omp(xy, bias)
    want = jax.tree_util.tree_leaves(
        model.apply(params, jnp.asarray(xy), jnp.asarray(bias), method=T2SDecoder.prefill)
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)


def test_vocoder_onnx_parity():
    from gpt_sovits_tpu.models.bigvgan import BigVGAN
    from test_bigvgan import TINY

    model = BigVGAN(TINY)
    mel = (np.random.default_rng(2).standard_normal((1, 20, TINY.num_mels)) * 0.5).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mel))
    om = OnnxModel(export_vocoder_onnx(model, params, b=1, t=20))
    got = om(mel)[0]
    want = model.apply(params, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_to_onnx_io_types_and_dup_outputs():
    # graph I/O must carry TypeProto (elem_type + dims) and duplicate
    # outputs must get distinct names (ADVICE r1: onnx_lite.py:326, onnx_export.py:583)
    from gpt_sovits_tpu.utils.onnx_lite import parse_model

    def fn(x, i):
        y = jnp.tanh(x)
        return y, y, x.astype(jnp.int32) + i  # same var twice + mixed dtypes

    x = np.random.RandomState(0).randn(2, 5).astype(np.float32)
    blob = to_onnx(fn, (jnp.asarray(x), jnp.asarray(3)))
    g = parse_model(blob)
    assert len(set(g.outputs)) == len(g.outputs) == 3
    for name in g.inputs + g.outputs:
        assert name in g.io_types, f"missing TypeProto for {name}"
    assert g.io_types[g.inputs[0]] == (np.dtype(np.float32), (2, 5))
    assert g.io_types[g.outputs[0]] == (np.dtype(np.float32), (2, 5))
    assert g.io_types[g.outputs[2]][0] == np.dtype(np.int32)
    m = OnnxModel(blob)
    o = m(x, np.asarray(3))
    np.testing.assert_allclose(np.asarray(o[0]), np.tanh(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o[0]), np.asarray(o[1]))


def test_to_onnx_rem_c_semantics():
    # lax.rem follows the dividend's sign; Mod must be emitted with fmod=1
    fn = lambda a, b: (jax.lax.rem(a, b), jax.lax.rem(a.astype(jnp.int32), b.astype(jnp.int32)))
    a = np.asarray([-7.5, 7.5, -3.0, 3.0], np.float32)
    b = np.asarray([2.0, -2.0, 2.5, -2.5], np.float32)
    m = OnnxModel(to_onnx(fn, (jnp.asarray(a), jnp.asarray(b))))
    got_f, got_i = m(a, b)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(jax.lax.rem(jnp.asarray(a), jnp.asarray(b))), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got_i),
        np.asarray(jax.lax.rem(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32))),
    )


def test_gather_non_take_layout_refused():
    # a gather whose offset_dims deviate from the canonical take layout must
    # raise instead of silently exporting wrong element order
    import pytest

    def fn(table, idx):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(0,),  # operand dim placed before the batch dim: non-take order
            collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        return jax.lax.gather(table, idx, dn, slice_sizes=(1, 4))

    table = np.random.RandomState(0).randn(6, 4).astype(np.float32)
    idx = np.asarray([[1], [3], [0]], np.int32)
    out = fn(jnp.asarray(table), jnp.asarray(idx))
    assert out.shape == (4, 3)  # offset dim first: not the take layout
    with pytest.raises(NotImplementedError):
        to_onnx(fn, (jnp.asarray(table), jnp.asarray(idx)))
