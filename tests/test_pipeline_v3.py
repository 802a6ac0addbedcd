"""End-to-end v3/v4 pipeline smoke test (chunked CFM + vocoder) with tiny
random-weight models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.infer.pipeline import TTSPipeline, V3Bundle
from gpt_sovits_tpu.models.hubert import HubertConfig, HubertEncoder
from gpt_sovits_tpu.models.t2s import T2SDecoder
from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3
from gpt_sovits_tpu.models.vits import Generator, SynthesizerTrn
from gpt_sovits_tpu.utils.config import InferenceConfig, MelConfig, S1Config, S2Config, replace

HUBERT_TINY = HubertConfig(
    conv_dim=32, conv_kernels=(10, 3, 2), conv_strides=(5, 2, 2),
    hidden_size=48, num_layers=1, num_heads=4, intermediate_size=64,
    pos_conv_kernel=16, pos_conv_groups=4,
)

S1_TINY = S1Config(
    vocab_size=33, phoneme_vocab_size=732, embedding_dim=48, hidden_dim=48,
    num_heads=4, ffn_dim=96, num_layers=2, eos_id=32, bert_dim=1024,
    max_len=2048, semantic_frame_rate=25,
)

V3_TINY = S2Config(
    version="v3", spec_channels=65, inter_channels=32, hidden_channels=32,
    filter_channels=48, n_heads=2, n_layers=4, kernel_size=3,
    gin_channels=32, mrte_hidden=32, ssl_dim=48, n_codes=32,
    cfm_mel_channels=20, cfm_dit_depth=2, cfm_dit_dim=64, cfm_dit_heads=4,
)

# "spec" mel config (for ge) and CFM-target mel config
MEL_SPEC = MelConfig(sampling_rate=8000, n_fft=128, win_size=128, hop_size=64, num_mels=13)
MEL_CFM = MelConfig(sampling_rate=6000, n_fft=64, win_size=64, hop_size=16, num_mels=20)

VOC_CFG = replace(
    V3_TINY,
    upsample_rates=(4, 4),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


@pytest.fixture(scope="module")
def v3_pipeline():
    return _build_v3_pipeline()


def _build_v3_pipeline(half=False):
    key = jax.random.PRNGKey(0)
    s1 = T2SDecoder(S1_TINY)
    s1_params = s1.init(key, method=T2SDecoder.init_all)

    v3 = SynthesizerTrnV3(V3_TINY)
    v3_params = v3.init(
        {"params": key, "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, V3_TINY.ssl_dim)), jnp.zeros((1, 16, V3_TINY.spec_channels)),
        jnp.asarray([16]), jnp.zeros((1, 30, 20)), jnp.asarray([30]),
        jnp.zeros((1, 5), jnp.int32), jnp.asarray([5]),
        method=SynthesizerTrnV3.init_all,
    )

    # v4-style vocoder: mel (B,T,20) -> wav x16
    voc = Generator(VOC_CFG, use_post_bias=True)
    voc_params = voc.init(jax.random.PRNGKey(2), jnp.zeros((1, 10, 20)))

    hub = HubertEncoder(HUBERT_TINY)
    hub_params = hub.init(key, jnp.zeros((1, 800)))

    # dummy s2 (v2) model is still required by the pipeline constructor for
    # the latent path signature; v3 bundle overrides it
    s2 = SynthesizerTrn(replace(V3_TINY, version="v2"))

    bundle = V3Bundle(
        model=v3, params=v3_params, vocoder=voc, vocoder_params=voc_params,
        mel_cfg=MEL_CFM, t_ref=12, t_chunk=48,
        out_sr=MEL_CFM.sampling_rate * 16 // MEL_CFM.hop_size, sample_steps=2,
    )
    return TTSPipeline(
        s1_model=s1, s1_params=s1_params,
        s2_model=s2, s2_params=None,
        hubert_model=hub, hubert_params=hub_params,
        mel_cfg=MEL_SPEC,
        infer_cfg=InferenceConfig(min_ref_sec=0.1, max_ref_sec=30.0, batch_size=2),
        v3_bundle=bundle,
        half=half,
    )


def test_v3_run_end_to_end_half_int8(monkeypatch):
    """half=True + GSVT_DIT_QUANT=int8 drives the bf16 vocoder + int8
    QDense CFM serving path end to end on CPU (int8 is opt-in: measured
    ~1.0x bf16 throughput on v5e, benchmarks/BENCH_v3_r03.json)."""
    monkeypatch.setenv("GSVT_DIT_QUANT", "int8")
    pipe = _build_v3_pipeline(half=True)
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    pipe.set_ref_audio(wav, sr=8000, ref_text="hello world")
    sr, audio = pipe.run("Quantized serving path check.", "en", seed=1, max_sec=2)
    assert len(audio) > 0 and np.isfinite(audio.astype(np.float32)).all()
    from flax.traverse_util import flatten_dict

    kinds = {leaf.dtype for _, leaf in flatten_dict(pipe._dit_params).items()}
    assert jnp.int8 in {jnp.dtype(k) for k in kinds} or any(str(k) == "int8" for k in kinds)


def test_v3_run_end_to_end(v3_pipeline):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    v3_pipeline.set_ref_audio(wav, sr=8000, ref_text="hello world")
    sr, audio = v3_pipeline.run("Testing the flow matching path now. Short text!", "en", seed=1, max_sec=2)
    assert sr == v3_pipeline.v3.out_sr
    assert audio.dtype == np.int16
    assert len(audio) > 0
    assert np.isfinite(audio.astype(np.float32)).all()


def test_v3_requires_ref_text(v3_pipeline):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    v3_pipeline.set_ref_audio(wav, sr=8000)  # no text
    v3_pipeline._fea_ref_cache = None
    with pytest.raises(ValueError, match="reference text"):
        v3_pipeline.run("hello there friend", "en", seed=0, max_sec=1)


def test_v3_with_super_resolution(v3_pipeline):
    """AP-BWE super-resolution doubles the output rate after the vocoder."""
    from gpt_sovits_tpu.models.apbwe import APBWEConfig, APNetBWE

    rng = np.random.default_rng(2)
    sr_cfg = APBWEConfig(n_fft=64, hop_size=16, win_size=64, channels=16, layers=1,
                         hr_sampling_rate=v3_pipeline.v3.out_sr * 2)
    sr_model = APNetBWE(sr_cfg)
    bins = sr_cfg.n_fft // 2 + 1
    sr_params = sr_model.init(jax.random.PRNGKey(0), jnp.zeros((1, bins, 8)), jnp.zeros((1, bins, 8)))
    v3_pipeline.v3.sr_model = sr_model
    v3_pipeline.v3.sr_params = sr_params
    try:
        wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        v3_pipeline.set_ref_audio(wav, sr=8000, ref_text="hello world")
        sr, audio = v3_pipeline.run("Super resolution check.", "en", seed=2, max_sec=1)
        assert sr == sr_cfg.hr_sampling_rate
        assert len(audio) > 0 and np.isfinite(audio.astype(np.float32)).all()
    finally:
        v3_pipeline.v3.sr_model = None
        v3_pipeline.v3.sr_params = None


def test_v3_sample_steps_override(v3_pipeline):
    """per-request sample_steps (api_v2 TTS_Request.sample_steps) changes the
    Euler integration; deterministic per (seed, steps)."""
    rng = np.random.default_rng(4)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    v3_pipeline.set_ref_audio(wav, sr=8000, ref_text="hello world")
    v3_pipeline._fea_ref_cache = None
    sr, a8 = v3_pipeline.run("Step override test.", "en", seed=2, max_sec=1, sample_steps=8)
    sr, a8b = v3_pipeline.run("Step override test.", "en", seed=2, max_sec=1, sample_steps=8)
    sr, a4 = v3_pipeline.run("Step override test.", "en", seed=2, max_sec=1, sample_steps=4)
    np.testing.assert_array_equal(a8, a8b)
    assert len(a4) == len(a8) and not np.array_equal(a4, a8)


def test_v3_parallel_vs_serial_equal_duration(v3_pipeline):
    """With identical S1 tokens (same batch + key), the batched+SOLA path
    must produce per-segment wavs of exactly the same lengths as the serial
    rolling-reference path (content differs: chunk boundaries and CFM noise
    order), and both must be finite."""
    rng = np.random.default_rng(5)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    v3_pipeline.set_ref_audio(wav, sr=8000, ref_text="hello world")
    v3_pipeline._fea_ref_cache = None
    text = "First sentence here. Second one follows! A third, longer sentence to span chunks?"
    batch = v3_pipeline.preprocess(text, "en", "cut5")
    kw = dict(top_k=5, top_p=1.0, temperature=1.0, repetition_penalty=1.35,
              speed=1.0, max_sec=2)
    key = jax.random.PRNGKey(7)
    par = v3_pipeline._synthesize_v3_batch_parallel(batch, key, **kw)
    ser = v3_pipeline._synthesize_v3_batch(batch, key, **kw)
    assert [len(w) for w in par] == [len(w) for w in ser]
    for w in par + ser:
        assert np.isfinite(w).all()


def test_v3_parallel_multi_chunk_sola():
    """Chunk slicing + SOLA bookkeeping: with tiny T_chunk the feature
    stream spans many overlapped chunks; total output length must still be
    exactly sum(feat_lens) * upsample."""
    from gpt_sovits_tpu.dsp.sola import sola_stitch

    # direct unit check of the chunk arithmetic used by the parallel path
    chunk_len, overlap, upsample = 36, 12, 16
    feat_lens = [50, 41, 77]
    total = sum(feat_lens)
    padded = total + overlap
    n_chunks = 1 + max(0, -(-(padded - chunk_len) // (chunk_len - overlap)))
    stitched = chunk_len * upsample * n_chunks - (n_chunks - 1) * overlap * upsample
    padding = n_chunks * (chunk_len - overlap) + overlap - padded
    assert stitched - overlap * upsample - padding * upsample == total * upsample


def test_mel_len_host_formula_matches_device(v3_pipeline):
    """_mel_len_for (host closed form used by the no-sync launch path)
    must equal decode_encp's device mel_len expression (models/v3.py:118-128:
    nominal frames clamped to interpolated content length) for every token
    count / speed the serving path can produce."""
    import jax.numpy as jnp

    from gpt_sovits_tpu.infer.pipeline import snap_speed

    p = v3_pipeline
    c = p.v3.model.cfg
    f = 3.875 if c.version == "v3" else 4
    interp = 1.875 if c.version == "v3" else 2.0
    for speed in (1.0, 0.5, 0.75, 1.25, 2.0, snap_speed(1.37)):
        ns = jnp.asarray([1, 2, 7, 63, 64, 127, 250, 500, 750], jnp.int32)
        if speed != 1.0:
            dev = (ns * f / speed).astype(jnp.int32) + 1
        else:
            dev = (ns * f).astype(jnp.int32)
        content = jnp.floor(ns * 2 * interp).astype(jnp.int32)
        dev = np.asarray(jnp.minimum(dev, content))
        host = [p._mel_len_for(int(n), speed) for n in np.asarray(ns)]
        np.testing.assert_array_equal(host, dev)
