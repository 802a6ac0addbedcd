"""StableHLO export roundtrip: serialize, deserialize, numerically equal."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.models.t2s import T2SDecoder
from gpt_sovits_tpu.utils.export import export_fn, export_s1_step, export_s2_decode, load_exported

from test_vits import TINY as S2_TINY, _inputs
from test_t2s import TINY as S1_TINY


def test_export_roundtrip_simple():
    fn = lambda x, w: jnp.tanh(x @ w)
    x = jnp.ones((2, 4))
    w = jnp.ones((4, 3)) * 0.1
    blob = export_fn(fn, (x, w))
    assert isinstance(blob, bytes) and len(blob) > 100
    restored = load_exported(blob)
    np.testing.assert_allclose(np.asarray(restored(x, w)), np.asarray(fn(x, w)), atol=1e-6)


def test_export_s2_decode():
    from gpt_sovits_tpu.models.vits import SynthesizerTrn

    model = SynthesizerTrn(S2_TINY)
    ssl, spec, text, _ = _inputs(jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2), "slice": jax.random.PRNGKey(3)},
        ssl, spec, jnp.asarray([24, 24]), text, jnp.asarray([8, 8]),
        method=SynthesizerTrn.init_all,
    )
    blob = export_s2_decode(model, params, b=1, tc=12, tt=8, tr=16)
    restored = load_exported(blob)
    codes = jnp.ones((1, 12), jnp.int32)
    out = restored(
        codes, jnp.asarray([12]), jnp.ones((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.ones((1, 16, S2_TINY.spec_channels)), jnp.asarray([16]),
    )
    direct = model.apply(
        params, codes, jnp.asarray([12]), jnp.ones((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.ones((1, 16, S2_TINY.spec_channels)), jnp.asarray([16]),
        method=SynthesizerTrn.decode,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-5)


def test_export_s1_step():
    model = T2SDecoder(S1_TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    blob = export_s1_step(model, params, b=1, t_cache=64)
    restored = load_exported(blob)
    h, dh = S1_TINY.num_heads, S1_TINY.hidden_dim // S1_TINY.num_heads
    out = restored(
        jnp.ones((1, 1, S1_TINY.embedding_dim)) * 0.1,
        jnp.zeros((S1_TINY.num_layers, 1, 64, h, dh)),
        jnp.zeros((S1_TINY.num_layers, 1, 64, h, dh)),
        jnp.zeros((1, 64), bool).at[:, :10].set(True),
        jnp.asarray(10, jnp.int32),
    )
    assert out[0].shape == (1, S1_TINY.vocab_size)
    assert np.all(np.isfinite(np.asarray(out[0])))
