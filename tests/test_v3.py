"""v3/v4 CFM-DiT path tests: shapes, loss finiteness, Euler inference,
prompt-region invariants, v3 vs v4 interpolation factors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.models.dit import DiT, DiTConfig
from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3, cfm_inference, interpolate_nearest
from gpt_sovits_tpu.utils.config import S2Config, replace

DIT_TINY = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=20, text_dim=32, conv_layers=2, max_pos=256)

V3_TINY = S2Config(
    version="v3", spec_channels=65, inter_channels=32, hidden_channels=32,
    filter_channels=48, n_heads=2, n_layers=4, kernel_size=3,
    gin_channels=32, mrte_hidden=32, ssl_dim=48, n_codes=33,
    cfm_mel_channels=20, cfm_dit_depth=2, cfm_dit_dim=64, cfm_dit_heads=4,
)

B, TS, TSPEC, TT, TMEL = 2, 24, 24, 6, 45


def test_interpolate_nearest_matches_torch():
    import torch

    x = np.random.default_rng(0).standard_normal((1, 16, 3)).astype(np.float32)
    for scale in (1.875, 2.0):
        ours = np.asarray(interpolate_nearest(jnp.asarray(x), scale))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 2, 1)), scale_factor=scale, mode="nearest"
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, err_msg=str(scale))


def test_dit_forward_shapes():
    model = DiT(DIT_TINY)
    b, t = 2, 12
    x = jnp.zeros((b, t, 20))
    cond = jnp.zeros((b, t, 20))
    text = jnp.zeros((b, t, 32))
    mask = jnp.ones((b, t), bool)
    params = model.init(jax.random.PRNGKey(0), x, cond, jnp.zeros((b,)), jnp.zeros((b,)), text, mask)
    out, text_embed = model.apply(params, x, cond, jnp.full((b,), 0.5), jnp.zeros((b,)), text, mask)
    assert out.shape == (b, t, 20)
    assert text_embed.shape == (b, t, 32)
    # cached text embed path gives identical output
    out2, _ = model.apply(
        params, x, cond, jnp.full((b,), 0.5), jnp.zeros((b,)), text, mask, text_embed_cache=text_embed
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


@pytest.fixture(scope="module")
def v3_model():
    model = SynthesizerTrnV3(V3_TINY)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    ssl = jax.random.normal(ks[0], (B, TS, V3_TINY.ssl_dim))
    spec = jax.random.normal(ks[1], (B, TSPEC, V3_TINY.spec_channels)) * 0.3
    mel = jax.random.normal(ks[2], (B, TMEL, 20)) * 0.3
    text = jax.random.randint(ks[3], (B, TT), 0, 100)
    params = model.init(
        {"params": key, "noise": jax.random.PRNGKey(1)},
        ssl, spec, jnp.asarray([TSPEC, TSPEC - 4]), mel, jnp.asarray([TMEL, TMEL - 6]),
        text, jnp.asarray([TT, TT - 2]),
        method=SynthesizerTrnV3.init_all,
    )
    return model, params, (ssl, spec, mel, text)


def test_v3_training_loss(v3_model):
    model, params, (ssl, spec, mel, text) = v3_model
    loss = model.apply(
        params, ssl, spec, jnp.asarray([TSPEC, TSPEC - 4]), mel, jnp.asarray([TMEL, TMEL - 6]),
        text, jnp.asarray([TT, TT - 2]), rng=jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(loss))


def test_v3_decode_encp_and_euler(v3_model):
    model, params, (ssl, spec, mel, text) = v3_model
    codes = model.apply(params, ssl, method=SynthesizerTrnV3.extract_latent)
    assert codes.shape == (B, TS // 2)
    fea, ge, mel_len = model.apply(
        params, codes, jnp.full((B,), TS // 2), text, jnp.asarray([TT, TT]),
        spec, jnp.asarray([TSPEC, TSPEC]), method=SynthesizerTrnV3.decode_encp,
    )
    # v3: fea time = codes*2 (50Hz) interpolated x1.875
    assert fea.shape == (B, int(TS * 1.875), 512)
    assert int(mel_len[0]) == int((TS // 2) * 2 * 1.875)  # clipped content length (models.py:1254 sizee is clipped by torch slicing)

    dit = DiT(model.dit_config)
    dit_params = {"params": params["params"]["cfm"]["estimator"]}
    prompt = mel[:, :10]
    out = cfm_inference(dit, dit_params, fea, mel_len, prompt, jax.random.PRNGKey(3), n_steps=4)
    assert out.shape == (B, fea.shape[1], 20)
    # prompt region zeroed (reference keeps it zeroed through the loop)
    np.testing.assert_allclose(np.asarray(out[:, :10]), 0.0, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_v4_interp_factor():
    cfg = replace(V3_TINY, version="v4")
    model = SynthesizerTrnV3(cfg)
    assert model.interp_factor == 2.0


# ---------------------------------------------------------------------------
# SynthesizerTrnV3b (hybrid GAN + CFM, models.py:1276)
# ---------------------------------------------------------------------------


def test_v3b_forward_and_decode():
    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3b

    cfg = replace(
        V3_TINY,
        segment_size=8,
        upsample_rates=(4, 4),
        upsample_initial_channel=32,
        upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    model = SynthesizerTrnV3b(cfg)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    ssl = jax.random.normal(ks[0], (B, TS, cfg.ssl_dim))
    spec = jax.random.normal(ks[1], (B, TSPEC, cfg.spec_channels))
    spec_lengths = jnp.array([TSPEC, TSPEC - 4])
    mel = jax.random.normal(ks[2], (B, TMEL, cfg.cfm_mel_channels))
    mel_lengths = jnp.array([TMEL, TMEL - 6])
    text = jax.random.randint(ks[3], (B, TT), 0, cfg.phoneme_vocab_size)
    text_lengths = jnp.array([TT, TT - 2])

    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        ssl, spec, spec_lengths, mel, mel_lengths, text, text_lengths,
        method=SynthesizerTrnV3b.init_all,
    )["params"]

    out = model.apply(
        {"params": params},
        ssl, spec, spec_lengths, mel, mel_lengths, text, text_lengths,
        rngs_noise=jax.random.PRNGKey(3), rng_slice=jax.random.PRNGKey(4), rng_cfm=jax.random.PRNGKey(5),
    )
    # GAN side: sliced waveform at segment_size * prod(upsample_rates)
    assert out["wav_hat"].shape == (B, cfg.segment_size * 16, 1)
    for k in ("commit_loss", "cfm_loss", "mel_mse"):
        assert np.isfinite(float(out[k])), k
    assert out["z"].shape == out["z_p"].shape

    # inference-side conditioning: mel_len = codes * 2.5 * 1.5 (models.py:1411)
    codes = model.apply({"params": params}, ssl, method=SynthesizerTrnV3b.extract_latent)
    fea, ge, mel_len = model.apply(
        {"params": params},
        codes, jnp.full((B,), codes.shape[1]), text, text_lengths, spec, spec_lengths,
        method=SynthesizerTrnV3b.decode_encp,
    )
    assert fea.shape[0] == B and fea.shape[2] == 512
    assert int(mel_len[0]) == int(codes.shape[1] * 2.5 * 1.5)
    assert ge.shape[-1] == cfg.gin_channels


def test_cfm_inference_bf16_close_to_f32():
    """bf16 CFM sampling (the serving half path) tracks the f32 sampler.

    Timestep embeddings are forced f32 inside the DiT (dit.py), so the
    only drift is bf16 matmul rounding; on a tiny model with unit-scale
    activations the end-to-end mel should stay close."""
    dit = DiT(DIT_TINY)
    b, t, tp = 1, 24, 8
    key = jax.random.PRNGKey(0)
    mu = jax.random.normal(key, (b, t, 32))
    prompt = jax.random.normal(jax.random.PRNGKey(1), (b, tp, 20)) * 0.1
    x = jnp.zeros((b, t, 20))
    params = dit.init(
        jax.random.PRNGKey(2), x, x, jnp.zeros((b,)), jnp.zeros((b,)), mu, jnp.ones((b, t), bool)
    )
    x_lens = jnp.asarray([t])
    out32 = cfm_inference(dit, params, mu, x_lens, prompt, jax.random.PRNGKey(3), n_steps=4)
    params_bf = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    out16 = cfm_inference(
        dit, params_bf, mu.astype(jnp.bfloat16), x_lens, prompt.astype(jnp.bfloat16),
        jax.random.PRNGKey(3), n_steps=4,
    ).astype(jnp.float32)
    a, bb = np.asarray(out32), np.asarray(out16)
    assert np.all(np.isfinite(bb))
    # same noise draw (PRNG is dtype-dependent only in rounding), so the
    # two trajectories start together; require high agreement
    denom = np.abs(a).mean() + 1e-6
    assert np.abs(a - bb).mean() / denom < 0.1


def test_cfm_inference_time_padding_exact():
    """Padding T to a tile multiple (the TPU serving path) must be
    numerically exact for real frames: pad frames are masked in attention
    and equal 'same'-conv zero padding elsewhere."""
    dit = DiT(DIT_TINY)
    b, t, tp = 2, 21, 6
    key = jax.random.PRNGKey(0)
    mu = jax.random.normal(key, (b, t, 32))
    prompt = jax.random.normal(jax.random.PRNGKey(1), (b, tp, 20)) * 0.1
    x = jnp.zeros((b, t, 20))
    params = dit.init(
        jax.random.PRNGKey(2), x, x, jnp.zeros((b,)), jnp.zeros((b,)), mu, jnp.ones((b, t), bool)
    )
    x_lens = jnp.asarray([t, t - 4])
    base = cfm_inference(dit, params, mu, x_lens, prompt, jax.random.PRNGKey(3), n_steps=3, pad_t_to=0)
    padded = cfm_inference(dit, params, mu, x_lens, prompt, jax.random.PRNGKey(3), n_steps=3, pad_t_to=8)
    a, p = np.asarray(base), np.asarray(padded)
    assert p.shape == a.shape
    np.testing.assert_allclose(a[0], p[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(a[1, : t - 4], p[1, : t - 4], rtol=1e-5, atol=1e-5)
