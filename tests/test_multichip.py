"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §4: the reference has no distributed tests at all; here the
(data, model) mesh path is exercised in CI — dp-sharded GAN training and
tp-sharded inference both compile and run under jax.sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch, shard_params

from test_s2_train import CFG, MEL, TRAIN, _batch


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(-1, 2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_s2_train_step_dp_tp_mesh():
    from gpt_sovits_tpu.train.s2_train import init_state, make_train_step

    mesh = make_mesh(4, 2)
    batch = _batch(jax.random.PRNGKey(0))
    # pad batch to 4 (divisible by data axis)
    batch = jax.tree_util.tree_map(lambda x: jnp.concatenate([x, x], axis=0), batch)
    with mesh:
        state, gen, disc = init_state(jax.random.PRNGKey(1), CFG, TRAIN, batch)
        state = state.replace(
            params_g=shard_params(state.params_g, mesh),
            params_d=shard_params(state.params_d, mesh),
        )
        batch = shard_batch(batch, mesh)
        step = make_train_step(gen, disc, TRAIN, MEL)
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        jax.block_until_ready(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_s1_generate_under_mesh():
    """Inference with dp over the 'data' axis: batch 8 over 8 devices."""
    from gpt_sovits_tpu.models.t2s import T2SDecoder, generate

    from test_t2s import TINY

    mesh = make_mesh(8, 1)
    model = T2SDecoder(TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    b, tx, tp = 8, 12, 6
    rng = np.random.default_rng(0)
    phones = jnp.asarray(rng.integers(0, TINY.phoneme_vocab_size, (b, tx)))
    bert = jnp.asarray(rng.standard_normal((b, tx, TINY.bert_dim)).astype(np.float32) * 0.1)
    prompts = jnp.asarray(rng.integers(0, TINY.vocab_size - 1, (b, tp)))
    with mesh:
        params = shard_params(params, mesh)
        sb = batch_sharding(mesh)
        phones = jax.device_put(phones, sb)
        bert = jax.device_put(bert, sb)
        prompts = jax.device_put(prompts, sb)
        out = generate(
            model, params, phones, jnp.full((b,), tx), bert, prompts, jnp.full((b,), tp),
            jax.random.PRNGKey(1), max_new_tokens=8, top_k=3,
        )
        jax.block_until_ready(out.tokens)
    assert out.tokens.shape == (8, 8)
    assert np.all(np.asarray(out.lengths) >= 1)


def test_pipeline_under_mesh():
    """Serving pipeline with batches dp-sharded over the mesh (the
    multi-host serving configuration, BASELINE config 5)."""
    import numpy as np

    from gpt_sovits_tpu.infer.pipeline import TTSPipeline
    from gpt_sovits_tpu.models.hubert import HubertEncoder
    from gpt_sovits_tpu.models.t2s import T2SDecoder
    from gpt_sovits_tpu.models.vits import SynthesizerTrn
    from gpt_sovits_tpu.utils.config import InferenceConfig

    from test_pipeline import HUBERT_TINY, MEL_TINY, S1_TINY, S2_TINY

    mesh = make_mesh(8, 1)
    key = jax.random.PRNGKey(0)
    s1 = T2SDecoder(S1_TINY)
    s1_params = s1.init(key, method=T2SDecoder.init_all)
    s2 = SynthesizerTrn(S2_TINY)
    s2_params = s2.init(
        {"params": key, "noise": key, "slice": key},
        jnp.zeros((1, 8, S2_TINY.ssl_dim)), jnp.zeros((1, 24, S2_TINY.spec_channels)),
        jnp.asarray([24]), jnp.zeros((1, 5), jnp.int32), jnp.asarray([5]),
        method=SynthesizerTrn.init_all,
    )
    hub = HubertEncoder(HUBERT_TINY)
    hub_params = hub.init(key, jnp.zeros((1, 800)))
    with mesh:
        pipe = TTSPipeline(
            s1_model=s1, s1_params=shard_params(s1_params, mesh),
            s2_model=s2, s2_params=shard_params(s2_params, mesh),
            hubert_model=hub, hubert_params=hub_params,
            mel_cfg=MEL_TINY,
            infer_cfg=InferenceConfig(min_ref_sec=0.1, max_ref_sec=30.0, batch_size=8),
            mesh=mesh,
        )
        rng = np.random.default_rng(0)
        pipe.set_ref_audio((rng.standard_normal(8000) * 0.1).astype(np.float32), sr=8000)
        sr, audio = pipe.run(
            "The first sentence is here. Second one follows now! A third sentence appears? Fourth piece of text. Fifth sentence arrives! Sixth one as well? Seventh in the row. Eighth closes it out!", "en", seed=1, max_sec=1, cut_method="cut5",
        )
    assert len(audio) > 0 and np.isfinite(audio.astype(np.float32)).all()
