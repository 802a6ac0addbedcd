"""On-chip serving perf contracts (SKIPPED off-TPU).

Run on a TPU host: `GSVT_TPU_TESTS=1 python -m pytest tests/test_tpu_serving_perf.py -q -n0`
(the conftest forces the CPU platform for the main suite; clear it so the
chip is visible). These pin the round-3 perf floor so regressions show up
as test failures instead of silent bench drift; thresholds have ~40%
headroom over the archived numbers (benchmarks/*_r03.*) to absorb
tunnel/host variance.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a TPU (run with JAX_PLATFORMS='')"
)


@pytest.fixture(scope="module", autouse=True)
def _cache():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def test_folded_bigvgan_on_chip_parity_and_speed():
    """Folded+taps+Pallas-snake vocoder: numerically equal to the XLA
    composition ON CHIP, and under RTF 0.02 (archived: 0.0095)."""
    import os

    from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from gpt_sovits_tpu.ops.folded_bigvgan import bigvgan_apply, fold_bigvgan_params

    cfg = BigVGANConfig()
    bv = BigVGAN(cfg)
    key = jax.random.PRNGKey(0)
    bv_params = jax.jit(bv.init)(key, jnp.zeros((1, 64, 100)))
    folded = fold_bigvgan_params(bv_params["params"], cfg, dtype=jnp.bfloat16)
    static = {k: v for k, v in folded.items() if k != "arrays"}
    t_mel = 512  # keep the parity compile small; speed run reuses it
    mel = jax.random.normal(key, (1, t_mel, 100)) * 0.3

    voc = jax.jit(lambda a, m: bigvgan_apply({"arrays": a, **static}, m.astype(jnp.bfloat16)))
    out = voc(folded["arrays"], mel)
    os.environ["GSVT_SNAKE"] = "xla"
    try:
        voc_ref = jax.jit(lambda a, m, _v=1: bigvgan_apply({"arrays": a, **static}, m.astype(jnp.bfloat16)))
        ref = voc_ref(folded["arrays"], mel)
    finally:
        os.environ.pop("GSVT_SNAKE", None)
    d = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    assert d < 5e-3, d  # bf16 reassociation only

    jax.block_until_ready(voc(folded["arrays"], mel))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(voc(folded["arrays"], mel))
    dt = (time.perf_counter() - t0) / 3
    rtf = dt / (t_mel * 256 / 24000)
    assert rtf < 0.02, rtf


def test_fused_decode_b8_runs_and_is_fast():
    """B=8 fused decode must not fall back (the round-2 VMEM cliff) and
    stays under 4 ms/batch-token (archived: ~1 ms incl. S2 share)."""
    import functools

    from gpt_sovits_tpu.models.t2s import T2SDecoder, generate
    from gpt_sovits_tpu.ops.pallas.decode_step import fused_decode_supported
    from gpt_sovits_tpu.utils.config import S1Config

    assert fused_decode_supported(8, 512)
    cfg = S1Config()
    s1 = T2SDecoder(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(functools.partial(s1.init, method=T2SDecoder.init_all))(key)
    b, tl, pt, n_new = 8, 64, 64, 32
    phones = jnp.zeros((b, tl), jnp.int32)
    bert = jnp.zeros((b, tl, cfg.bert_dim), jnp.bfloat16)
    prompt = jnp.zeros((b, pt), jnp.int32)

    def step(k):
        return generate(
            s1, params, phones, jnp.full((b,), tl, jnp.int32), bert, prompt,
            jnp.full((b,), pt, jnp.int32), k, max_new_tokens=n_new, top_k=15,
            top_p=1.0, temperature=1.0, repetition_penalty=1.35,
            early_stop_num=n_new, use_fused_kernel=True, weight_quant="int8",
        )

    out = step(key)
    jax.block_until_ready(out.tokens)
    t0 = time.perf_counter()
    out = step(jax.random.PRNGKey(1))
    jax.block_until_ready(out.tokens)
    dt = (time.perf_counter() - t0) / n_new
    assert np.isfinite(np.asarray(out.tokens)).all()
    assert dt < 4e-3, dt


def test_fused_decode_b1_int8kv_floor():
    """B=1 serving default (int8 weights + int8 KV) stays under 1 ms/token
    wall (device ~118 us/token after the round-5 MXU-oriented KV sweep,
    benchmarks/TRIAGE_s1_r05.json; the slack absorbs tunnel RTT)."""
    import functools

    from gpt_sovits_tpu.models.t2s import T2SDecoder, generate
    from gpt_sovits_tpu.utils.config import S1Config

    cfg = S1Config()
    s1 = T2SDecoder(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(functools.partial(s1.init, method=T2SDecoder.init_all))(key)
    b, tl, pt, n_new = 1, 64, 64, 128
    phones = jnp.zeros((b, tl), jnp.int32)
    bert = jnp.zeros((b, tl, cfg.bert_dim), jnp.bfloat16)
    prompt = jnp.zeros((b, pt), jnp.int32)

    def step(k):
        return generate(
            s1, params, phones, jnp.full((b,), tl, jnp.int32), bert, prompt,
            jnp.full((b,), pt, jnp.int32), k, max_new_tokens=n_new, top_k=15,
            top_p=1.0, temperature=1.0, repetition_penalty=1.35,
            early_stop_num=n_new, use_fused_kernel=True, weight_quant="int8",
            kv_cache_quant="int8",
        )

    out = step(key)
    jax.block_until_ready(out.tokens)
    t0 = time.perf_counter()
    out = step(jax.random.PRNGKey(1))
    jax.block_until_ready(out.tokens)
    dt = (time.perf_counter() - t0) / n_new
    assert np.isfinite(np.asarray(out.tokens)).all()
    assert dt < 1e-3, dt
