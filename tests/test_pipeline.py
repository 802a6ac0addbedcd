"""End-to-end pipeline smoke test with tiny random-weight models.

Covers the full serving path: reference audio -> HuBERT -> VQ prompt,
text -> g2p -> batched S1 decode -> S2 decode -> int16 audio. (Quality
needs pretrained weights; this validates the plumbing, shapes, bucketing
and order restoration.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.infer.pipeline import TTSPipeline
from gpt_sovits_tpu.models.hubert import HubertConfig, HubertEncoder
from gpt_sovits_tpu.models.t2s import T2SDecoder
from gpt_sovits_tpu.models.vits import SynthesizerTrn
from gpt_sovits_tpu.utils.config import InferenceConfig, MelConfig, S1Config, S2Config

HUBERT_TINY = HubertConfig(
    conv_dim=32, conv_kernels=(10, 3, 2), conv_strides=(5, 2, 2),
    hidden_size=48, num_layers=1, num_heads=4, intermediate_size=64,
    pos_conv_kernel=16, pos_conv_groups=4,
)

S1_TINY = S1Config(
    vocab_size=41, phoneme_vocab_size=732, embedding_dim=48, hidden_dim=48,
    num_heads=4, ffn_dim=96, num_layers=2, eos_id=40, bert_dim=1024,
    max_len=1024, semantic_frame_rate=25,
)

S2_TINY = S2Config(
    version="v2", spec_channels=65, segment_size=8, inter_channels=32,
    hidden_channels=32, filter_channels=48, n_heads=2, n_layers=4,
    kernel_size=3, upsample_rates=(4, 4), upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 8), resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), gin_channels=32, mrte_hidden=32,
    ssl_dim=48, n_codes=40,
)

MEL_TINY = MelConfig(sampling_rate=8000, n_fft=128, win_size=128, hop_size=64, num_mels=13)


@pytest.fixture(scope="module")
def pipeline():
    key = jax.random.PRNGKey(0)
    s1 = T2SDecoder(S1_TINY)
    s1_params = s1.init(key, method=T2SDecoder.init_all)
    s2 = SynthesizerTrn(S2_TINY)
    s2_params = s2.init(
        {"params": key, "noise": key, "slice": key},
        jnp.zeros((1, 8, S2_TINY.ssl_dim)), jnp.zeros((1, 10, S2_TINY.spec_channels)),
        jnp.asarray([10]), jnp.zeros((1, 5), jnp.int32), jnp.asarray([5]),
        method=SynthesizerTrn.init_all,
    )
    hub = HubertEncoder(HUBERT_TINY)
    hub_params = hub.init(key, jnp.zeros((1, 800)))
    return TTSPipeline(
        s1_model=s1, s1_params=s1_params,
        s2_model=s2, s2_params=s2_params,
        hubert_model=hub, hubert_params=hub_params,
        mel_cfg=MEL_TINY,
        infer_cfg=InferenceConfig(min_ref_sec=0.1, max_ref_sec=30.0, batch_size=4),
    )


def test_set_ref_audio_and_cache(pipeline):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)  # 1 s @ 8 kHz
    ref = pipeline.set_ref_audio(wav, sr=8000)
    assert ref.prompt_semantic.ndim == 1 and len(ref.prompt_semantic) > 0
    assert np.all(ref.prompt_semantic < S2_TINY.n_codes)
    assert ref.refer_spec.shape[1] == S2_TINY.spec_channels


def test_ref_duration_guard():
    # uses a fresh config with the real 3-10 s guard
    p = TTSPipeline.__new__(TTSPipeline)
    p.cfg = InferenceConfig()
    with pytest.raises(ValueError, match="reference audio"):
        TTSPipeline.set_ref_audio(p, np.zeros(8000, np.float32), sr=8000)


def test_preprocess_segments(pipeline):
    segs = pipeline.preprocess("Hello world. This is a test! Another sentence here?", "en", "cut5")
    assert len(segs) >= 2
    for s in segs:
        assert len(s["phones"]) >= 2
        assert s["bert"].shape == (len(s["phones"]), 1024)


def test_run_end_to_end(pipeline):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    pipeline.set_ref_audio(wav, sr=8000)
    sr, audio = pipeline.run(
        "Hello world. Testing the pipeline now!", "en", seed=3, max_sec=2, cut_method="cut5",
    )
    assert sr == MEL_TINY.sampling_rate
    assert audio.dtype == np.int16
    assert len(audio) > 0
    # deterministic for fixed seed
    sr2, audio2 = pipeline.run(
        "Hello world. Testing the pipeline now!", "en", seed=3, max_sec=2, cut_method="cut5",
    )
    np.testing.assert_array_equal(audio, audio2)


def test_v2pro_pipeline_with_sv(tmp_path):
    """v2Pro path: ERes2NetV2 speaker embedding fused into ge."""
    from gpt_sovits_tpu.models.eres2net import ERes2NetConfig, ERes2NetV2
    from gpt_sovits_tpu.utils.config import replace

    key = jax.random.PRNGKey(0)
    sv_cfg = ERes2NetConfig(num_blocks=(1, 1, 1, 1), m_channels=4, feat_dim=80, base_width=24, scale=4, expansion=4)
    sv_model = ERes2NetV2(sv_cfg)
    sv_params = sv_model.init(key, jnp.zeros((1, 32, 80)))
    sv_dim = 4 * 8 * 4 * (80 // 8)  # m*8*expansion * fdim/8

    s2_cfg = replace(S2_TINY, version="v2Pro", sv_dim=sv_dim)
    s2 = SynthesizerTrn(s2_cfg)
    s2_params = s2.init(
        {"params": key, "noise": key, "slice": key},
        jnp.zeros((1, 8, s2_cfg.ssl_dim)), jnp.zeros((1, 10, s2_cfg.spec_channels)),
        jnp.asarray([10]), jnp.zeros((1, 5), jnp.int32), jnp.asarray([5]),
        sv_emb=jnp.zeros((1, sv_dim)),
        method=SynthesizerTrn.init_all,
    )
    s1 = T2SDecoder(S1_TINY)
    s1_params = s1.init(key, method=T2SDecoder.init_all)
    hub = HubertEncoder(HUBERT_TINY)
    hub_params = hub.init(key, jnp.zeros((1, 800)))
    pipe = TTSPipeline(
        s1_model=s1, s1_params=s1_params, s2_model=s2, s2_params=s2_params,
        hubert_model=hub, hubert_params=hub_params,
        sv_model=sv_model, sv_params=sv_params,
        mel_cfg=MEL_TINY,
        infer_cfg=InferenceConfig(min_ref_sec=0.1, max_ref_sec=30.0, batch_size=2, version="v2Pro"),
    )
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ref = pipe.set_ref_audio(wav, sr=8000)
    assert ref.sv_emb is not None and ref.sv_emb.shape == (sv_dim,)
    sr, audio = pipe.run("Pro path check.", "en", seed=1, max_sec=1)
    assert len(audio) > 0 and np.isfinite(audio.astype(np.float32)).all()


def test_zh_bert_features_in_pipeline(pipeline):
    """zh segments get phone-level BERT features (layer -3, word2ph repeat)."""
    from gpt_sovits_tpu.models.bert import BertConfig, BertEncoder

    cfg = BertConfig(vocab_size=64, hidden_size=1024, num_layers=3, num_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    bert = BertEncoder(cfg)
    bert_params = bert.init(jax.random.PRNGKey(0), jnp.zeros((1, 6), jnp.int32))

    class StubTok:
        def __call__(self, text, return_tensors="np"):
            ids = np.asarray([[2] + [min(ord(c) % 60 + 3, 63) for c in text] + [3]])
            return {"input_ids": ids}

    pipeline.bert = bert
    pipeline.bert_params = bert_params
    pipeline.bert_tokenizer = StubTok()
    try:
        segs = pipeline.preprocess("你好。", "zh", "cut0")
        assert segs
        feats = segs[0]["bert"]
        assert feats.shape[1] == 1024
        assert np.abs(feats).sum() > 0  # non-zero for zh
        # en still zero
        segs_en = pipeline.preprocess("hello there", "en", "cut0")
        assert np.abs(segs_en[0]["bert"]).sum() == 0
    finally:
        pipeline.bert = None
        pipeline.bert_params = None
        pipeline.bert_tokenizer = None

def test_multi_reference_tone_fusion(pipeline):
    """aux_wavs: ge averages over main+aux refs (models.py:977-984,
    TTS.py aux_ref_audio_paths). Must run end-to-end and differ from the
    single-ref output while staying deterministic."""
    rng = np.random.default_rng(7)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    aux1 = (rng.standard_normal(6000) * 0.2).astype(np.float32)
    aux2 = (rng.standard_normal(9000) * 0.05).astype(np.float32)

    pipeline.set_ref_audio(wav, sr=8000)
    sr, single = pipeline.run("Fusion check sentence.", "en", seed=5, max_sec=1)

    ref = pipeline.set_ref_audio(wav, sr=8000, aux_wavs=[(aux1, 8000), (aux2, 8000)])
    assert ref.aux_specs is not None and len(ref.aux_specs) == 2
    sr2, fused = pipeline.run("Fusion check sentence.", "en", seed=5, max_sec=1)
    assert sr2 == sr and len(fused) > 0
    assert np.isfinite(fused.astype(np.float32)).all()
    # timbre vector changed -> waveform changes
    if len(fused) == len(single):
        assert not np.array_equal(fused, single)
    # deterministic under the same aux set
    _, fused2 = pipeline.run("Fusion check sentence.", "en", seed=5, max_sec=1)
    np.testing.assert_array_equal(fused, fused2)
    pipeline.set_ref_audio(wav, sr=8000)  # restore for other tests


def test_multi_reference_ge_is_mean_of_per_ref_ge(pipeline):
    """RefCache.ge == mean of per-ref compute_ge_masked, each ref encoded at
    its OWN length (reference encodes the spec list one by one; padding is
    not equivalent because the temporal convs see pad rows)."""
    rng = np.random.default_rng(11)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    aux = (rng.standard_normal(5600) * 0.2).astype(np.float32)
    ref = pipeline.set_ref_audio(wav, sr=8000, aux_wavs=[(aux, 8000)])
    assert ref.ge is not None and ref.ge.shape[0] == 1

    ges = []
    for s in [ref.refer_spec] + list(ref.aux_specs):
        ge = pipeline.s2.apply(
            pipeline.s2_params, jnp.asarray(s[None]),
            jnp.asarray([s.shape[0]], jnp.int32), None,
            method=SynthesizerTrn.compute_ge_masked,
        )
        ges.append(np.asarray(ge))
    np.testing.assert_allclose(ref.ge, np.mean(ges, axis=0), rtol=1e-6, atol=1e-7)
    # single ref -> no precomputed ge (in-graph path unchanged)
    ref1 = pipeline.set_ref_audio(wav, sr=8000)
    assert ref1.ge is None


def test_run_parallel_infer_off_and_batch_size(pipeline):
    """parallel_infer=False (one-by-one decode) and per-request batch_size
    give the same audio content ordering as the batched default."""
    rng = np.random.default_rng(9)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    pipeline.set_ref_audio(wav, sr=8000)
    text = "First sentence here. Second one follows! Third closes it?"
    sr, batched = pipeline.run(text, "en", seed=11, max_sec=1)
    sr, serial = pipeline.run(text, "en", seed=11, max_sec=1, parallel_infer=False)
    sr, bs1 = pipeline.run(text, "en", seed=11, max_sec=1, batch_size=1, split_bucket=False)
    assert len(serial) > 0 and len(bs1) > 0
    # one-at-a-time == batch_size 1 without bucketing (identical work order)
    np.testing.assert_array_equal(serial, bs1)


def test_split_batches_matches_reference_algorithm():
    """_split_batches reproduces to_batch's greedy threshold splitting
    (TTS.py:858-879) on random length sets."""
    import numpy as np

    from gpt_sovits_tpu.infer.pipeline import _split_batches

    def ref_split(lens, batch_size, threshold):
        idx_len = sorted(enumerate(lens), key=lambda x: x[1])
        arr = np.array([[i, l] for i, l in idx_len], dtype=np.int64)
        out, pos = [], 0
        while pos < arr.shape[0]:
            pos_end = min(pos + batch_size, arr.shape[0])
            while pos < pos_end:
                batch = arr[pos:pos_end, 1].astype(np.float32)
                score = batch[(pos_end - pos) // 2] / (batch.mean() + 1e-8)
                if (score >= threshold) or (pos_end - pos == 1):
                    out.append(arr[pos:pos_end, 0].tolist())
                    pos = pos_end
                    break
                pos_end -= 1
        return out

    rng = np.random.default_rng(0)
    for trial in range(100):
        n = int(rng.integers(1, 25))
        lens = rng.integers(1, 200, size=n).tolist()
        bs = int(rng.integers(1, 9))
        th = float(rng.uniform(0.3, 1.0))
        order = sorted(range(n), key=lambda i: lens[i])
        ours = [[order[g] for g in grp] for grp in _split_batches([lens[i] for i in order], bs, th)]
        theirs = ref_split(lens, bs, th)
        assert [sorted(lens[i] for i in a) for a in ours] == [sorted(lens[i] for i in b) for b in theirs]
        assert sorted(i for g in ours for i in g) == list(range(n))


def test_snap_speed_grid():
    """speed_factor snaps to a bounded grid so the XLA compile cache cannot
    be thrashed by continuous slider values (models.py:227 resize makes
    speed a trace-time constant)."""
    from gpt_sovits_tpu.infer.pipeline import snap_speed

    assert snap_speed(1.0) == 1.0
    assert snap_speed(1.013) == 1.0
    assert snap_speed(1.237) == 1.25
    assert snap_speed(0.01) == 0.5
    assert snap_speed(9.9) == 2.0
    # grid is closed under itself and bounded
    vals = {snap_speed(0.5 + i * 0.001) for i in range(1500)}
    assert len(vals) <= 31
    assert all(abs(v * 20 - round(v * 20)) < 1e-9 for v in vals)
