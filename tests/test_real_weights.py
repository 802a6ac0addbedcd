"""Real-pretrained-weights end-to-end golden (asset-gated).

This environment has no network egress and ships no pretrained weights,
so these tests SKIP unless the official asset set is present under
$GSVT_PRETRAINED_DIR (default: pretrained_models/ at the repo root, the
reference's own layout — GPT_SoVITS/pretrained_models). Where assets
exist they run the BASELINE.json north star: same ref clip + text +
seeds through this framework, asserting checkpoint identity (the
reference's own MD5-of-first-8KB fingerprints,
process_ckpt.py:81-88), successful weight import, finite audio out, and
mel parity of our S2 decode against the live PyTorch reference.

Asset layout expected (utils/download.py PRETRAINED):
  s2G2333k.pth / gsv-v2final-pretrained/s2G2333k.pth    SoVITS v2
  s1bert25hz-5kh-longer-*.ckpt                          GPT v2
  chinese-hubert-base/{pytorch_model.bin,config.json}
  chinese-roberta-wwm-ext-large/{pytorch_model.bin,config.json,tokenizer.json}
  G2PWModel/ (onnx polyphone model)
"""

import hashlib
import os

import numpy as np
import pytest

ASSETS = os.environ.get("GSVT_PRETRAINED_DIR", os.path.join(os.path.dirname(__file__), "..", "pretrained_models"))

# reference fingerprints (md5 of first 8KB — process_ckpt.py:81-88)
S2G_HASHES = {
    "dc3c97e17592963677a4a1681f30c653": "v1",
    "6642b37f3dbb1f76882b69937c95a5f3": "v2",
    "43797be674a37c1c83ee81081941ed0f": "v3",
    "4f26b9476d0c5033e04162c486074374": "v4",
    "c7e9fce2223f3db685cdfa1e6368728a": "v2Pro",
    "66b313e39455b57ab1b0bc0b239c9d0a": "v2ProPlus",
}


def _find(*cands):
    for c in cands:
        p = os.path.join(ASSETS, c)
        if os.path.exists(p):
            return p
    return None


def _md5_8k(path):
    with open(path, "rb") as f:
        return hashlib.md5(f.read(8192)).hexdigest()


s2g = _find("gsv-v2final-pretrained/s2G2333k.pth", "s2G2333k.pth")
s1 = _find(
    "gsv-v2final-pretrained/s1bert25hz-5kh-longer-epoch=12-step=369668.ckpt",
    "s1bert25hz-5kh-longer-epoch=12-step=369668.ckpt",
)
hubert = _find("chinese-hubert-base/pytorch_model.bin")
bert = _find("chinese-roberta-wwm-ext-large/pytorch_model.bin")
g2pw = _find("G2PWModel", "G2PWModel_1.1")

needs_assets = pytest.mark.skipif(
    not (s2g and s1 and hubert),
    reason=f"pretrained assets not present under {ASSETS} (no network egress in CI env); "
    "set GSVT_PRETRAINED_DIR or run gpt_sovits_tpu cli download",
)


@needs_assets
def test_pretrained_fingerprints():
    """The s2G file is the official pretrained (reference md5 table)."""
    h = _md5_8k(s2g)
    assert h in S2G_HASHES, f"unrecognized s2G checkpoint (md5-8k {h}) — not an official pretrained"
    assert S2G_HASHES[h] == "v2"


@needs_assets
def test_real_weight_import_and_synthesis(tmp_path):
    """Full pipeline on real weights: ref clip -> zero-shot synthesis."""
    from gpt_sovits_tpu.utils.loaders import build_pipeline

    pipe = build_pipeline(s1_path=s1, s2_path=s2g, version="v2", hubert_path=os.path.dirname(hubert),
                          bert_path=os.path.dirname(bert) if bert else None)
    sr0 = 16000
    rng = np.random.default_rng(0)
    # a synthetic-but-speechlike 5 s reference (harmonic stack + noise);
    # real deployments pass an actual clip, the contract is the same
    t = np.arange(sr0 * 5) / sr0
    wav = sum(0.2 / (i + 1) * np.sin(2 * np.pi * 120 * (i + 1) * t) for i in range(6))
    wav = (wav * (0.6 + 0.4 * np.sin(2 * np.pi * 2.3 * t))).astype(np.float32)
    wav += rng.standard_normal(len(wav)).astype(np.float32) * 0.01
    pipe.set_ref_audio(wav, sr=sr0, ref_text="这是一个测试参考音频。", ref_lang="zh")
    sr, audio = pipe.run("你好，这是一条端到端真实权重合成测试。", "zh", seed=42)
    assert sr == 32000 and audio.dtype == np.int16
    assert len(audio) > sr  # at least a second of speech
    f = audio.astype(np.float32) / 32768.0
    assert np.isfinite(f).all() and 0.001 < np.abs(f).max() <= 1.0


@needs_assets
def test_s2_decode_mel_parity_vs_reference():
    """Same codes + same seeds through our S2 and the live torch reference:
    mel-L1 closeness (BASELINE.json north star)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from reference_oracle import load_reference

    from gpt_sovits_tpu.dsp.mel import mel_spectrogram
    from gpt_sovits_tpu.models.vits import SynthesizerTrn
    from gpt_sovits_tpu.utils.checkpoint_compat import load_torch_checkpoint
    from gpt_sovits_tpu.utils.config import MelConfig
    from gpt_sovits_tpu.utils.loaders import load_s2

    ref_models, _ = load_reference()
    model, params, version = load_s2(s2g)
    assert isinstance(model, SynthesizerTrn) and version == "v2"
    cfg = model.cfg

    ckpt = load_torch_checkpoint(s2g)
    hps = ckpt["config"]
    tm = ref_models.SynthesizerTrn(
        hps["data"]["filter_length"] // 2 + 1,
        hps["train"]["segment_size"] // hps["data"]["hop_length"],
        n_speakers=hps["data"].get("n_speakers", 0),
        version="v2",
        **hps["model"],
    )
    tm.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in ckpt["weight"].items()}, strict=False
    )
    tm.eval()

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 1024, (1, 120)).astype(np.int64)
    text = rng.integers(10, 300, (1, 40)).astype(np.int64)
    spec = np.abs(rng.standard_normal((1, cfg.spec_channels, 200))).astype(np.float32)

    with torch.no_grad():
        ref_wav = tm.decode(
            torch.from_numpy(codes[None]), torch.from_numpy(text),
            torch.from_numpy(spec), noise_scale=0.0,
        )[0, 0].numpy()
    our_wav = np.asarray(
        model.apply(
            params, jnp.asarray(codes.astype(np.int32)), jnp.asarray([codes.shape[1]]),
            jnp.asarray(text.astype(np.int32)), jnp.asarray([text.shape[1]]),
            jnp.asarray(spec.transpose(0, 2, 1)), jnp.asarray([spec.shape[2]]),
            noise_scale=0.0, method=SynthesizerTrn.decode,
        )
    )[0, :, 0]

    n = min(len(ref_wav), len(our_wav))
    mc = MelConfig(sampling_rate=32000, n_fft=2048, win_size=2048, hop_size=640, num_mels=128)
    mel_ref = np.asarray(mel_spectrogram(jnp.asarray(ref_wav[None, :n]), mc))
    mel_our = np.asarray(mel_spectrogram(jnp.asarray(our_wav[None, :n]), mc))
    l1 = np.abs(mel_ref - mel_our).mean()
    assert l1 < 0.1, f"mel L1 {l1} vs live reference on real weights"


@needs_assets
def test_real_g2pw_onnx():
    """The actual G2PW polyphone ONNX through onnx_lite (never exercised
    with synthetic bundles — text/g2pw/onnx_api.py:82)."""
    if not g2pw:
        pytest.skip("G2PWModel assets not present")
    if not bert:
        pytest.skip("bert tokenizer assets not present")
    from transformers import AutoTokenizer

    from gpt_sovits_tpu.text.g2pw import G2PW

    tok = AutoTokenizer.from_pretrained(os.path.dirname(bert))
    model = G2PW(g2pw, tok)
    # 行 is polyphonic: hang2 in 银行 (xing2 would be wrong)
    (res,) = model(["银行在哪里"])
    assert res[1] is not None and res[1].startswith("hang"), res
