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


def test_export_v3_decode_and_cfm():
    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3, cfm_inference
    from gpt_sovits_tpu.models.dit import DiT
    from gpt_sovits_tpu.utils.export import export_cfm, export_v3_decode

    from test_v3 import B, TMEL, TSPEC, TS, TT, V3_TINY

    model = SynthesizerTrnV3(V3_TINY)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    ssl = jax.random.normal(ks[0], (B, TS, V3_TINY.ssl_dim))
    spec = jax.random.normal(ks[1], (B, TSPEC, V3_TINY.spec_channels)) * 0.3
    mel = jax.random.normal(ks[2], (B, TMEL, model.dit_config.mel_dim)) * 0.3
    text = jax.random.randint(ks[3], (B, TT), 0, 100)
    params = model.init(
        {"params": key, "noise": jax.random.PRNGKey(1)},
        ssl, spec, jnp.asarray([TSPEC, TSPEC - 4]), mel, jnp.asarray([TMEL, TMEL - 6]),
        text, jnp.asarray([TT, TT - 2]),
        method=SynthesizerTrnV3.init_all,
    )

    # decode_encp module: equal to the direct call
    tc, tt, tr = 12, TT, TSPEC
    blob = export_v3_decode(model, params, b=1, tc=tc, tt=tt, tr=tr)
    restored = load_exported(blob)
    codes = jnp.ones((1, tc), jnp.int32)
    args = (codes, jnp.asarray([tc]), jnp.ones((1, tt), jnp.int32), jnp.asarray([tt]),
            jnp.ones((1, tr, V3_TINY.spec_channels)), jnp.asarray([tr]))
    fea, ge, mel_len = restored(*args)
    fea_d, ge_d, mel_len_d = model.apply(params, *args, method=SynthesizerTrnV3.decode_encp)
    np.testing.assert_allclose(np.asarray(fea), np.asarray(fea_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mel_len), np.asarray(mel_len_d))

    # CFM Euler loop module: equal trajectory for equal seed
    t, tp, steps = 48, 16, 2
    blob = export_cfm(model, params, b=1, t=t, tp=tp, n_steps=steps)
    restored = load_exported(blob)
    mu = jax.random.normal(ks[0], (1, t, model.dit_config.text_dim)) * 0.1
    x_lens = jnp.asarray([t])
    prompt = jax.random.normal(ks[1], (1, tp, model.dit_config.mel_dim)) * 0.1
    out = restored(mu, x_lens, prompt, jnp.asarray(7, jnp.uint32))
    dit = DiT(model.dit_config)
    dit_params = {"params": params["params"]["cfm"]["estimator"]}
    direct = cfm_inference(dit, dit_params, mu, x_lens, prompt, jax.random.PRNGKey(jnp.uint32(7)), n_steps=steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-5)
