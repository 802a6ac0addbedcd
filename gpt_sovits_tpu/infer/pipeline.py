"""Zero/few-shot TTS serving pipeline.

Re-design of the reference `TTS` class (GPT_SoVITS/TTS_infer_pack/TTS.py:412)
as a single-controller driver over jitted TPU functions:

  * set_ref_audio (TTS.py:737): reference wav -> 16 kHz HuBERT features ->
    VQ prompt semantic tokens (TTS.py:795), 32 kHz linear spec for timbre,
    duration guard 3-10 s (TTS.py:802-803); cached per reference
  * preprocess (TextPreprocessor.py:59): cut method -> per-segment language
    split -> g2p (+BERT features for zh) -> phone ids
  * run (TTS.py:984): length-sorted greedy bucketing (to_batch TTS.py:842),
    batched S1 AR decode, one S2 decode per bucket, inter-fragment silence,
    original-order restore, int16 (audio_postprocess TTS.py:1377)

TPU-first: every padded shape is drawn from a small set of buckets so the
XLA compile cache stays small; eviction-by-EOS happens inside the compiled
while_loop (masking), not by rebatching.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import re
from typing import Any, Generator, Optional

import jax
import jax.numpy as jnp
import time

import numpy as np

from gpt_sovits_tpu.dsp.audio_io import load_wav, resample
from gpt_sovits_tpu.dsp.mel import denorm_spec, mel_spectrogram, norm_spec, spectrogram
from gpt_sovits_tpu.models.hubert import HubertEncoder
from gpt_sovits_tpu.models.t2s import T2SDecoder, generate
from gpt_sovits_tpu.models.vits import SynthesizerTrn
from gpt_sovits_tpu.text import cleaned_text_to_sequence
from gpt_sovits_tpu.text.cleaner import clean_text
from gpt_sovits_tpu.text.lang_segmenter import runs_for_language
from gpt_sovits_tpu.text.segmentation import get_method, split_big_text
from gpt_sovits_tpu.utils.config import InferenceConfig, MelConfig


def _split_batches(sorted_lens: list, batch_size: int, threshold: float) -> list[list[int]]:
    """Greedy batch splitting over length-sorted items (to_batch,
    TTS.py:858-879): a candidate batch is shrunk from the tail until its
    median/mean length ratio reaches `threshold`, bounding padding waste.
    Returns groups of positions into the sorted order."""
    groups: list[list[int]] = []
    pos, n = 0, len(sorted_lens)
    while pos < n:
        pos_end = min(pos + batch_size, n)
        while pos < pos_end:
            lens = sorted_lens[pos:pos_end]
            score = lens[(pos_end - pos) // 2] / (sum(lens) / len(lens) + 1e-8)
            if score >= threshold or pos_end - pos == 1:
                groups.append(list(range(pos, pos_end)))
                pos = pos_end
                break
            pos_end -= 1
    return groups


def snap_speed(speed: float) -> float:
    """Snap a continuous speed_factor to a 0.05 grid in [0.5, 2.0].

    `speed` is a trace-time constant (it changes output shapes via the
    text-encoder resize, models.py:227), so every distinct value compiles a
    new XLA program per shape bucket; an API exposing a float slider could
    thrash the compile cache. The 0.05 grid is inaudible (<2.5% tempo) and
    bounds the cache at 31 entries per bucket."""
    s = min(max(float(speed), 0.5), 2.0)
    return round(round(s / 0.05) * 0.05, 2)


def _next_bucket(n: int, buckets=(32, 64, 128, 256, 512)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 127) // 128) * 128


# chunk-batch buckets for the batched v3/v4 CFM+vocoder path. CFM cost is
# linear in the batch, so pow2 bucketing wasted up to 60% (bs=5 -> 8); this
# set caps pad waste at <=33% (typically <=20%, and 0 for the common ~20 s
# utterance at bs=5) while keeping the compile cache bounded at 11 shapes
_BS_BUCKETS = (1, 2, 3, 4, 5, 6, 8, 12, 16, 24, 32)


def _next_bs_bucket(n: int) -> int:
    for b in _BS_BUCKETS:
        if n <= b:
            return b
    return -(-n // 8) * 8


def _wav_to_i16(wav):
    """Quantize the vocoder output to int16 ON DEVICE. Serving's wire
    format is int16 PCM (audio_postprocess, TTS.py:1377), so converting
    before the device->host fetch halves the transferred bytes — the fetch
    is a measurable phase over slow host links. Clipping beats the host
    path's wraparound on |x|>1."""
    return (jnp.clip(wav, -1.0, 1.0).astype(jnp.float32) * 32767.0).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("bs", "bs_pad", "overlap", "chunk_len"))
def _v3_assemble_chunks(feats, fea_ref0, *, bs, bs_pad, overlap, chunk_len):
    """Front-pad the conditioning stream by the SOLA overlap, slice `bs`
    overlapping `chunk_len` windows, pad the batch to the `bs_pad` bucket,
    and prepend the reference window to every row — all on device
    (TTS.py:1553-1575 expressed as one XLA program)."""
    stride = chunk_len - overlap
    f = jnp.pad(feats[0], ((overlap, 0), (0, 0)))
    need = (bs - 1) * stride + chunk_len
    if need > f.shape[0]:
        f = jnp.pad(f, ((0, need - f.shape[0]), (0, 0)))
    chunks = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(f, i * stride, chunk_len, axis=0) for i in range(bs)]
    )
    if bs_pad > bs:
        chunks = jnp.pad(chunks, ((0, bs_pad - bs), (0, 0), (0, 0)))
    ref = jnp.repeat(fea_ref0, bs_pad, axis=0)
    return jnp.concatenate([ref, chunks], axis=1)


@dataclasses.dataclass
class RefCache:
    """Cached per-reference features (prompt cache, TTS.py:443-453)."""

    prompt_semantic: np.ndarray  # (Tp,) int32
    refer_spec: np.ndarray  # (Tr, spec_channels)
    sv_emb: Optional[np.ndarray] = None  # (sv_dim,) for v2Pro
    prompt_phones: Optional[list] = None
    prompt_norm_text: str = ""
    raw_wav: Optional[np.ndarray] = None  # original wav for v3/v4 ref mel
    raw_sr: int = 0
    # multi-reference tone fusion (aux_ref_audio_paths, TTS.py:1098-1109):
    # extra reference specs (+ per-ref sv embs for v2Pro). ge is the mean of
    # per-ref timbre vectors, precomputed at set_ref_audio time — each ref
    # encoded at its own length, exactly like the reference's list handling.
    aux_specs: Optional[list] = None  # list of (Tr_i, spec_channels)
    aux_sv_embs: Optional[list] = None
    ge: Optional[np.ndarray] = None  # (1, 1, gin) fused timbre vector


@dataclasses.dataclass
class V3Bundle:
    """Models + constants for the v3/v4 CFM path (TTS.py init_vocoder
    vocoder_configs, :601-660)."""

    model: Any  # SynthesizerTrnV3
    params: Any
    vocoder: Any  # flax BigVGAN (v3) or Generator (v4)
    vocoder_params: Any
    mel_cfg: MelConfig  # MEL_V3 or MEL_V4
    t_ref: int  # 468 (v3) / 500 (v4)
    t_chunk: int  # 934 (v3) / 1000 (v4)
    out_sr: int  # 24000 (v3) / 48000 (v4)
    sample_steps: int = 32
    overlapped_len: int = 12  # SOLA overlap frames (TTS.py:621,654)
    # optional AP-BWE super-resolution (v3 24k->48k, TTS.py:1407-1417)
    sr_model: Any = None
    sr_params: Any = None


class TTSPipeline:
    def __init__(
        self,
        *,
        s1_model: T2SDecoder,
        s1_params,
        s2_model: SynthesizerTrn,
        s2_params,
        hubert_model: Optional[HubertEncoder] = None,
        hubert_params=None,
        bert_model=None,
        bert_params=None,
        bert_tokenizer=None,
        sv_model=None,
        sv_params=None,
        mel_cfg: MelConfig = MelConfig(),
        infer_cfg: InferenceConfig = InferenceConfig(),
        v3_bundle: Optional[V3Bundle] = None,
        use_fused_s1: Optional[bool] = None,  # default: True on TPU
        s1_weight_quant: Optional[str] = None,  # "int8": weight-quantized decode (halves weight HBM traffic); None: int8 on TPU, bf16 elsewhere
        s1_kv_quant: Optional[str] = None,  # "int8": quantized KV cache (halves the decode's dominant KV sweep, TRIAGE_s1_r04); None: int8 on TPU
        half: Optional[bool] = None,  # bf16 vocoder (reference is_half default); None: True on TPU
        mesh=None,  # jax.sharding.Mesh: dp-shard synthesis batches over 'data'
    ):
        self.s1 = s1_model
        self.s1_params = s1_params
        self.s2 = s2_model
        self.s2_params = s2_params
        self.hubert = hubert_model
        self.hubert_params = hubert_params
        self.bert = bert_model
        self.bert_params = bert_params
        self.bert_tokenizer = bert_tokenizer
        self.sv = sv_model
        self.sv_params = sv_params
        self.mel_cfg = mel_cfg
        self.cfg = infer_cfg
        self.ref: Optional[RefCache] = None
        self.version = s2_model.cfg.version
        self.v3 = v3_bundle
        if use_fused_s1 is None:
            use_fused_s1 = jax.default_backend() not in ("cpu",)
        if half is None:
            half = jax.default_backend() not in ("cpu",)
        self.half = half
        _voc_dtype = jnp.bfloat16 if half else jnp.float32
        self.use_fused_s1 = use_fused_s1
        # env vars fill in unset arguments only (explicit caller arguments
        # win — ADVICE r4 flagged the old env-always-wins precedence).
        # TPU serving default is int8 weights AND int8 KV: faster at every
        # batch size on device-trace timing (benchmarks/TRIAGE_s1_r04.json)
        # with mel drift below bf16 rounding noise at production size
        # (benchmarks/QUALITY_kv_r05.json); "bf16" reverts.
        on_tpu = jax.default_backend() == "tpu"
        if s1_weight_quant is None:
            s1_weight_quant = os.environ.get("GSVT_S1_WEIGHT_QUANT") or ("int8" if on_tpu else "bf16")
        if s1_kv_quant is None:
            s1_kv_quant = os.environ.get("GSVT_S1_KV_QUANT") or ("int8" if on_tpu else "bf16")
        self.s1_weight_quant = s1_weight_quant
        self.s1_kv_quant = s1_kv_quant
        self.mesh = mesh
        from gpt_sovits_tpu.utils.metrics import ThroughputMeter

        self.meter = ThroughputMeter()  # cumulative serving counters
        self.last_timing: dict = {}
        self.last_ttfb: Optional[float] = None  # streaming time-to-first-fragment
        # S2 decode runs as decode_latent (flax) + the lane-folded generator
        # (ops/folded_conv.py) — exact same waveform, ~1.8x faster vocoder.
        # (v3/v4 pipelines pass s2_params=None; the CFM path replaces S2.)
        if s2_params is not None:
            from gpt_sovits_tpu.ops.folded_conv import fold_generator_params, generator_apply

            # folded decoder WEIGHTS ride in the params pytree ARGUMENT
            # (closure arrays would serialize into the compiled HLO; over the
            # remote-compile tunnel that hard-fails for big models). Only the
            # static pad/meta plan stays in the closure.
            _folded_dec = fold_generator_params(s2_params["params"]["dec"], s2_model.cfg, dtype=_voc_dtype)
            _dec_static = {k: v for k, v in _folded_dec.items() if k != "arrays"}
            self._s2_call_params = {"flax": s2_params, "folded_dec": _folded_dec["arrays"]}
            _decode_latent = functools.partial(s2_model.apply, method=SynthesizerTrn.decode_latent)

            @functools.partial(jax.jit, static_argnames=("speed",))
            def _s2_decode(call_params, codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths, *, speed=1.0, sv_emb=None, ge=None):
                z, ge = _decode_latent(
                    call_params["flax"], codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths,
                    speed=speed, sv_emb=sv_emb, ge=ge,
                )
                wav = generator_apply(
                    {"arrays": call_params["folded_dec"], **_dec_static},
                    z.astype(_voc_dtype), ge.astype(_voc_dtype),
                )
                # int16 ON DEVICE: serving's wire format, and the fetch is
                # half the bytes (the v3 path has done this since r3)
                return _wav_to_i16(wav)

            self._s2_decode = _s2_decode
        elif s2_model is not None:
            _plain_decode = functools.partial(s2_model.apply, method=SynthesizerTrn.decode)

            @functools.partial(jax.jit, static_argnames=("speed",))
            def _s2_decode_plain(params, codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths, *, speed=1.0, sv_emb=None, ge=None):
                return _wav_to_i16(
                    _plain_decode(
                        params, codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths,
                        speed=speed, sv_emb=sv_emb, ge=ge,
                    )
                )

            self._s2_decode = _s2_decode_plain
        else:
            self._s2_decode = None
        self._extract_latent = jax.jit(functools.partial(s2_model.apply, method=SynthesizerTrn.extract_latent))
        if hubert_model is not None:
            self._hubert_fwd = jax.jit(hubert_model.apply)
        if v3_bundle is not None:
            from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3

            self.version = v3_bundle.model.cfg.version
            self._extract_latent = jax.jit(
                functools.partial(v3_bundle.model.apply, method=SynthesizerTrnV3.extract_latent)
            )
            self._decode_encp = jax.jit(
                functools.partial(v3_bundle.model.apply, method=SynthesizerTrnV3.decode_encp),
                static_argnames=("speed",),
            )
            from gpt_sovits_tpu.models.vits import Generator as _Generator

            if isinstance(v3_bundle.vocoder, _Generator) and v3_bundle.vocoder_params is not None:
                # v4 vocoder: same lane-folded fast path as the v2 decoder
                import types as _types

                from gpt_sovits_tpu.ops.folded_conv import fold_generator_params, generator_apply

                voc = v3_bundle.vocoder
                eff = _types.SimpleNamespace(
                    upsample_rates=voc.upsample_rates or voc.cfg.upsample_rates,
                    upsample_kernel_sizes=voc.upsample_kernel_sizes or voc.cfg.upsample_kernel_sizes,
                    upsample_initial_channel=voc.cfg.upsample_initial_channel,
                    resblock_kernel_sizes=voc.cfg.resblock_kernel_sizes,
                    resblock_dilation_sizes=voc.cfg.resblock_dilation_sizes,
                )
                # folded weights travel as jit ARGUMENTS, not closure
                # constants: baked-in weights bloat the serialized HLO past
                # remote-compile limits and defeat donation/sharding
                _folded_voc = fold_generator_params(v3_bundle.vocoder_params["params"], eff, dtype=_voc_dtype)
                _voc_static = {k: v for k, v in _folded_voc.items() if k != "arrays"}
                self._voc_call_params = _folded_voc["arrays"]
                self._vocoder_fwd = jax.jit(
                    lambda arrs, mel: _wav_to_i16(
                        generator_apply({"arrays": arrs, **_voc_static}, mel.astype(_voc_dtype))
                    )
                )
            else:
                from gpt_sovits_tpu.models.bigvgan import BigVGAN as _BigVGAN

                if isinstance(v3_bundle.vocoder, _BigVGAN) and v3_bundle.vocoder_params is not None:
                    # v3 BigVGAN: lane-folded fast path (ops/folded_bigvgan.py,
                    # exact), bf16 when half; output back in f32
                    from gpt_sovits_tpu.ops.folded_bigvgan import bigvgan_apply, fold_bigvgan_params

                    _folded_bv = fold_bigvgan_params(
                        v3_bundle.vocoder_params["params"], v3_bundle.vocoder.cfg, dtype=_voc_dtype
                    )
                    _bv_static = {k: v for k, v in _folded_bv.items() if k != "arrays"}
                    self._voc_call_params = _folded_bv["arrays"]
                    self._vocoder_fwd = jax.jit(
                        lambda arrs, mel: _wav_to_i16(
                            bigvgan_apply({"arrays": arrs, **_bv_static}, mel.astype(_voc_dtype))
                        )
                    )
                else:
                    self._voc_call_params = v3_bundle.vocoder_params
                    self._vocoder_fwd = jax.jit(
                        lambda p, mel: _wav_to_i16(v3_bundle.vocoder.apply(p, mel))
                    )

            from gpt_sovits_tpu.models.dit import DiT, quantize_dit_params
            from gpt_sovits_tpu.models.v3 import cfm_inference

            # bf16 CFM sampling when half (the reference's is_half runs the
            # DiT in fp16 — TTS.py init, inference_webui); DiT matmuls hit
            # the MXU at the bf16 rate, timestep embeddings stay f32 inside
            # the model, and the sampled mel returns in f32.
            # GSVT_DIT_QUANT serves the six big per-block matmuls
            # weight+activation int8. Accuracy is fine (CFM mel drift
            # ~0.2%, below bf16 rounding noise — tests/test_dit_quant).
            # Round 3 defaulted to bf16 because XLA's unfused s8xs8->s32
            # dot ran at ~1.0x bf16; round 4's fused Pallas qdense
            # (ops/pallas/qmatmul.py — quantize+dot+rescale in one VMEM
            # pass) measures 260 T/s vs 175 bf16 on the DiT ff shapes and
            # 1.12x end-to-end CFM (benchmarks/BENCH_v3_r04.json), so int8
            # is now the TPU serving default; GSVT_DIT_QUANT=bf16 reverts.
            _default_quant = "int8" if jax.default_backend() == "tpu" else "bf16"
            _dit_quant = os.environ.get("GSVT_DIT_QUANT", _default_quant) if half else "bf16"
            dit_cfg = v3_bundle.model.dit_config
            if _dit_quant == "int8":
                import dataclasses as _dc

                dit_cfg = _dc.replace(dit_cfg, quant="int8")
            dit = DiT(dit_cfg)
            dit_params = {"params": v3_bundle.params["params"]["cfm"]["estimator"]}
            _cfm_dtype = jnp.bfloat16 if half else jnp.float32
            if half:
                dit_params = jax.tree.map(lambda p: p.astype(_cfm_dtype), dit_params)
            if _dit_quant == "int8":
                # after the bf16 cast: quantize emits int8 kernels + f32
                # scales (scales must not round to bf16)
                dit_params = quantize_dit_params(dit_params)
            steps = v3_bundle.sample_steps

            @functools.partial(jax.jit, static_argnames=("n_steps",))
            def _cfm(params, mu, x_lens, prompt, key, n_steps=steps):
                mel = cfm_inference(
                    dit, params, mu.astype(_cfm_dtype), x_lens,
                    prompt.astype(_cfm_dtype), key, n_steps=n_steps,
                )
                return mel.astype(jnp.float32)

            # params threaded as an argument (see vocoder note above)
            self._dit_params = dit_params
            self._cfm_infer = _cfm
            self._fea_ref_cache = None

    def recover(self):
        """Error recovery (TTS.py:1352-1363 empty_cache + model reload
        equivalent): drop cached reference features and jit executables so a
        poisoned compilation or OOM'd buffer can't wedge the service."""
        self.ref = None
        if getattr(self, "_fea_ref_cache", None) is not None:
            self._fea_ref_cache = None
        self._ref_dev_cache = None
        jax.clear_caches()

    # ------------------------------------------------------------------
    # reference audio
    # ------------------------------------------------------------------

    def _ref_spec_sv(self, wav, sr: int):
        """spec (+ v2Pro sv emb) for ONE reference clip (_get_ref_spec,
        TTS.py:758-793: mono, max-normalize to <=1, spectrogram; v2Pro also
        16 kHz audio -> ERes2NetV2 embedding)."""
        sr_native = self.mel_cfg.sampling_rate
        wav_native = resample(np.asarray(wav, np.float32), sr, sr_native)
        maxx = float(np.abs(wav_native).max()) if wav_native.size else 0.0
        if maxx > 1.0:
            wav_native = wav_native / min(2.0, maxx)
        spec = np.asarray(spectrogram(wav_native[None, :], self.mel_cfg))[0].T  # (T, bins)
        sv_emb = None
        if self.s2 is not None and self.s2.cfg.is_pro and self.sv is not None:
            from gpt_sovits_tpu.models.eres2net import kaldi_fbank

            wav16 = resample(wav_native, sr_native, 16000)
            feat = kaldi_fbank(jnp.asarray(wav16[None, :]))
            sv_emb = np.asarray(self.sv.apply(self.sv_params, feat))[0]
        return spec.astype(np.float32), sv_emb

    def set_ref_audio(self, wav, sr: Optional[int] = None, ref_text: Optional[str] = None, aux_wavs=None, ref_lang: str = "auto"):
        """wav: path or float array. Extracts and caches prompt features.

        aux_wavs: optional list of paths or (wav, sr) pairs — auxiliary
        references for multi-speaker tone fusion (aux_ref_audio_paths,
        TTS.py:1098-1109); missing paths are skipped like the reference.
        ref_lang: language mode for the prompt transcript (the reference
        runs prompt text through the same get_phones_and_bert with
        prompt_lang, TTS.py:1120-1127)."""
        if isinstance(wav, str):
            wav, sr = load_wav(wav)
        assert sr is not None, "sr required for array input"
        dur = len(wav) / sr
        if not (self.cfg.min_ref_sec <= dur <= self.cfg.max_ref_sec):
            raise ValueError(
                f"reference audio must be {self.cfg.min_ref_sec:.0f}-{self.cfg.max_ref_sec:.0f} s, got {dur:.1f} s"
            )
        wav16 = resample(np.asarray(wav, np.float32), sr, 16000)
        # pad tail like the reference (zero_wav 0.3 s, inference_webui.py)
        wav16 = np.concatenate([wav16, np.zeros(int(16000 * 0.3), np.float32)])

        if self.hubert is None:
            raise RuntimeError("hubert model required for reference encoding")
        ssl = self._hubert_fwd(self.hubert_params, wav16[None, :])  # (1,T,768)
        latent_params = self.v3.params if self.v3 is not None else self.s2_params
        codes = self._extract_latent(latent_params, ssl)  # (1, T//2)
        spec, sv_emb = self._ref_spec_sv(wav, sr)

        aux_specs: list = []
        aux_svs: list = []
        for aux in aux_wavs or []:
            if isinstance(aux, str):
                if not aux or not os.path.exists(aux):
                    continue  # reference skips missing aux files (TTS.py:1106)
                a_wav, a_sr = load_wav(aux)
            else:
                a_wav, a_sr = aux
            a_spec, a_sv = self._ref_spec_sv(a_wav, a_sr)
            aux_specs.append(a_spec)
            aux_svs.append(a_sv)

        ge = None
        if aux_specs and self.s2 is not None:
            # fused timbre: mean of per-ref ge, each ref at its own length
            # (models.py:977-984); precomputed once per reference set
            ges = []
            for s, e in zip([spec] + aux_specs, [sv_emb] + aux_svs):
                ges.append(
                    np.asarray(
                        self.s2.apply(
                            self.s2_params, jnp.asarray(s[None]),
                            jnp.asarray([s.shape[0]], jnp.int32),
                            jnp.asarray(e[None]) if e is not None else None,
                            method=SynthesizerTrn.compute_ge_masked,
                        )
                    )
                )
            ge = np.mean(ges, axis=0, dtype=np.float32)

        self.ref = RefCache(
            prompt_semantic=np.asarray(codes[0], np.int32),
            refer_spec=spec,
            sv_emb=sv_emb,
            raw_wav=np.asarray(wav, np.float32),
            raw_sr=sr,
            aux_specs=aux_specs or None,
            aux_sv_embs=aux_svs or None,
            ge=ge,
        )
        if ref_text:
            phones, _, norm = self._g2p_segment(ref_text, ref_lang)
            self.ref.prompt_phones = phones
            self.ref.prompt_norm_text = norm
        return self.ref

    # ------------------------------------------------------------------
    # text preprocessing
    # ------------------------------------------------------------------

    def _g2p_segment(self, text: str, language: str):
        """One text segment -> (phone ids, bert features (T,1024), norm).

        Language-mode routing follows the reference exactly
        (TextPreprocessor.py:122-170): named CJK modes mean *mixed with
        English* (latin runs peel out to the en g2p, CJK runs take the
        user-declared language), ``all_*`` modes still peel latin, and
        ``en`` sends the whole text through English g2p."""
        text = re.sub(r" {2,}", " ", text)
        runs = runs_for_language(text, language)
        phones_all: list[int] = []
        bert_chunks: list[np.ndarray] = []
        norm_all: list[str] = []
        for run in runs:
            phones, word2ph, norm = clean_text(run["text"], run["lang"], self.version)
            ids = cleaned_text_to_sequence(phones, self.version)
            bert = self._bert_features(norm, word2ph, len(ids), run["lang"])
            phones_all.extend(ids)
            bert_chunks.append(bert)
            norm_all.append(norm)
        bert_feat = (
            np.concatenate(bert_chunks, axis=0) if bert_chunks else np.zeros((0, 1024), np.float32)
        )
        return phones_all, bert_feat, "".join(norm_all)

    def _bert_features(self, norm_text: str, word2ph, n_phones: int, lang: str) -> np.ndarray:
        """Phone-level BERT features; zeros for non-zh (TextPreprocessor:191)."""
        if lang == "zh" and self.bert is not None and word2ph is not None:
            toks = self.bert_tokenizer(norm_text, return_tensors="np")
            hidden = self.bert.apply(self.bert_params, jnp.asarray(toks["input_ids"]))[-3]
            hidden = np.asarray(hidden)[0, 1:-1]  # drop [CLS]/[SEP]
            if len(word2ph) != hidden.shape[0]:  # tokenizer/char mismatch guard
                return np.zeros((n_phones, 1024), np.float32)
            return np.repeat(hidden, word2ph, axis=0).astype(np.float32)
        return np.zeros((n_phones, 1024), np.float32)

    def preprocess(self, text: str, language: str, cut_method: str = "cut5"):
        """-> list of {"phones": ids, "bert": (T,1024)} segments."""
        pieces = []
        for chunk in get_method(cut_method)(text.strip()):
            pieces.extend(split_big_text(chunk))
        out = []
        for piece in pieces:
            phones, bert, norm = self._g2p_segment(piece, language)
            if len(phones) < 2:
                continue
            # reference retries <6-phoneme fragments by merging; here short
            # fragments merge into the previous segment
            if out and len(phones) < 6:
                prev = out[-1]
                prev["phones"] = prev["phones"] + phones
                prev["bert"] = np.concatenate([prev["bert"], bert], axis=0)
                prev["norm_text"] += norm
                continue
            out.append({"phones": phones, "bert": bert, "norm_text": norm})
        return out

    # ------------------------------------------------------------------
    # synthesis
    # ------------------------------------------------------------------

    def run(
        self,
        text: str,
        language: str = "auto",
        *,
        seed: int = 0,
        cut_method: Optional[str] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        temperature: Optional[float] = None,
        repetition_penalty: Optional[float] = None,
        speed: float = 1.0,
        fragment_interval: Optional[float] = None,
        max_sec: int = 30,
        batch_size: Optional[int] = None,
        batch_threshold: float = 0.75,
        split_bucket: bool = True,
        parallel_infer: bool = True,
        sample_steps: Optional[int] = None,  # v3/v4 CFM Euler steps
        super_sampling: Optional[bool] = None,  # v3 AP-BWE 24k->48k
        early_stop_num: Optional[int] = None,  # benchmark aid: fixed-length decode (generate early_stop_num)
    ) -> tuple[int, np.ndarray]:
        """Synthesize. Returns (sample_rate, int16 waveform)."""
        assert self.ref is not None, "call set_ref_audio first"
        cfg = self.cfg
        top_k = cfg.top_k if top_k is None else top_k
        top_p = cfg.top_p if top_p is None else top_p
        temperature = cfg.temperature if temperature is None else temperature
        repetition_penalty = cfg.repetition_penalty if repetition_penalty is None else repetition_penalty
        fragment_interval = cfg.fragment_interval if fragment_interval is None else fragment_interval
        cut_method = cut_method or cfg.text_split_method
        speed = snap_speed(speed)

        # per-request phase breakdown + throughput counters (the reference's
        # hand-rolled t0..t5 line, TTS.py:1317-1338)
        from gpt_sovits_tpu.utils.metrics import PhaseTimer

        timer = PhaseTimer()
        with timer.phase("preprocess"):
            segments = self.preprocess(text, language, cut_method)
        if not segments:
            raise ValueError("no synthesizable text")

        # length-sorted bucketing (to_batch, TTS.py:842); split_bucket=False
        # keeps reading order, parallel_infer=False decodes one at a time
        order = (
            sorted(range(len(segments)), key=lambda i: len(segments[i]["phones"]))
            if split_bucket and parallel_infer
            else list(range(len(segments)))
        )
        key = jax.random.PRNGKey(seed)
        sr = self.mel_cfg.sampling_rate
        hop = self.mel_cfg.hop_size
        frame_rate = self.s1.cfg.semantic_frame_rate
        wavs: dict[int, np.ndarray] = {}

        bs = (batch_size or cfg.batch_size) if parallel_infer else 1
        v3_kw = {} if self.v3 is None else {"sample_steps": sample_steps, "super_sampling": super_sampling}
        if split_bucket and parallel_infer:
            groups = _split_batches([len(segments[i]["phones"]) for i in order], bs, batch_threshold)
        else:
            groups = [list(range(s, min(s + bs, len(order)))) for s in range(0, len(order), bs)]
        # Cross-group software pipeline (VERDICT r4 #1b — previously only
        # scripts/bench_v3.py had this loop): group i's device->host fetch
        # and host-side glue run while group i+1 computes on device. The
        # launch stages themselves only block on the tiny S1 lengths
        # vector, whose async copy starts at dispatch time.
        s1_kw = dict(
            top_k=top_k, top_p=top_p, temperature=temperature,
            repetition_penalty=repetition_penalty, max_sec=max_sec,
            early_stop_num=early_stop_num,
        )
        use_staged = self.v3 is None or parallel_infer
        prev = None  # (idx, fetch-state)
        with timer.phase("synthesize"):
            for group in groups:
                idx = [order[g] for g in group]
                batch = [segments[i] for i in idx]
                key, sub = jax.random.split(key)
                if use_staged:
                    s1 = self._s1_launch(batch, sub, **s1_kw)
                    eager_s2 = len(groups) == 1 and os.environ.get("GSVT_S2_EAGER", "1") != "0"
                    if prev is not None:
                        pidx, pstate, pfetch = prev
                        for i, w in zip(pidx, pfetch(pstate)):
                            wavs[i] = w
                        prev = None
                    if self.v3 is not None:
                        state = self._v3_launch(
                            batch, s1, sub, speed=speed,
                            sample_steps=v3_kw.get("sample_steps"),
                        )
                        prev = (idx, state, functools.partial(
                            self._v3_fetch, super_sampling=v3_kw.get("super_sampling")))
                    else:
                        state = self._s2_launch(batch, s1, speed=speed, eager=eager_s2)
                        prev = (idx, state, self._s2_fetch)
                else:
                    wav_list = self._synthesize_v3_batch(
                        batch, sub, speed=speed, **s1_kw, **v3_kw,
                    )
                    for i, w in zip(idx, wav_list):
                        wavs[i] = w
            if prev is not None:
                pidx, pstate, pfetch = prev
                for i, w in zip(pidx, pfetch(pstate)):
                    wavs[i] = w

        if self.v3 is not None:
            sr = self.v3.out_sr
            if self.v3.sr_model is not None and self.v3.sr_params is not None and super_sampling is not False:
                sr = self.v3.sr_model.cfg.hr_sampling_rate
        silence = np.zeros(int(sr * fragment_interval), np.float32)
        pieces = []
        for i in range(len(segments)):
            pieces.append(wavs[i])
            pieces.append(silence)
        audio = np.concatenate(pieces[:-1]) if pieces else np.zeros(0, np.float32)
        audio = np.clip(audio, -1.0, 1.0)
        self.meter.measure_done(len(audio) / sr, sum(timer.phases.values()))
        self.last_timing = dict(timer.phases, rtf=self.meter.rtf)
        if self.cfg.report_timing:
            print(timer.report(), f"audio:{len(audio) / sr:.2f}s rtf:{self.meter.rtf:.4f}")
        return sr, (audio * 32767.0).astype(np.int16)

    def run_streaming(
        self, text: str, language: str = "auto", **kwargs
    ):
        """Generator of (sr, int16 fragment) per text segment, in reading
        order (ref TTS.run return_fragment=True streaming mode). Segments
        are synthesized in batches but yielded as each becomes available
        in order."""
        assert self.ref is not None, "call set_ref_audio first"
        cfg = self.cfg
        seed = kwargs.pop("seed", 0)
        cut_method = kwargs.pop("cut_method", None) or cfg.text_split_method
        fragment_interval = kwargs.pop("fragment_interval", None)
        fragment_interval = cfg.fragment_interval if fragment_interval is None else fragment_interval
        synth_kw = dict(
            top_k=kwargs.pop("top_k", None) or cfg.top_k,
            top_p=kwargs.pop("top_p", None) or cfg.top_p,
            temperature=kwargs.pop("temperature", None) or cfg.temperature,
            repetition_penalty=kwargs.pop("repetition_penalty", None) or cfg.repetition_penalty,
            speed=snap_speed(kwargs.pop("speed", 1.0)),
            max_sec=kwargs.pop("max_sec", 30),
        )
        kwargs.pop("split_bucket", None)  # streaming always yields in reading order
        bs = (kwargs.pop("batch_size", None) or cfg.batch_size) if kwargs.pop("parallel_infer", True) else 1
        sample_steps = kwargs.pop("sample_steps", None)
        super_sampling = kwargs.pop("super_sampling", None)
        if self.v3 is not None:
            synth_kw.update(sample_steps=sample_steps, super_sampling=super_sampling)
        segments = self.preprocess(text, language, cut_method)
        if not segments:
            return
        sr = self.v3.out_sr if self.v3 is not None else self.mel_cfg.sampling_rate
        if (
            self.v3 is not None and self.v3.sr_model is not None
            and self.v3.sr_params is not None and super_sampling is not False
        ):
            sr = self.v3.sr_model.cfg.hr_sampling_rate
        key = jax.random.PRNGKey(seed)
        silence = np.zeros(int(sr * fragment_interval), np.float32)
        t_start = time.perf_counter()
        first = True

        def emit(wav):
            nonlocal first
            if first:
                # time-to-first-fragment, the streaming latency metric
                self.last_ttfb = time.perf_counter() - t_start
                first = False
            frag = np.concatenate([np.clip(wav, -1.0, 1.0), silence])
            return sr, (frag * 32767.0).astype(np.int16)

        if self.v3 is not None:
            # v3 streams through the serial rolling-reference path: each
            # segment's audio is available as soon as its chunks decode
            for start in range(0, len(segments), bs):
                batch = segments[start : start + bs]
                key, sub = jax.random.split(key)
                for wav in self._synthesize_v3_batch(batch, sub, **synth_kw):
                    yield emit(wav)
            return
        # v2: staged launch/fetch with cross-batch overlap — batch i's
        # fetch + encode happen while batch i+1 decodes on device
        speed = synth_kw.pop("speed")
        prev = None
        for start in range(0, len(segments), bs):
            batch = segments[start : start + bs]
            key, sub = jax.random.split(key)
            s1 = self._s1_launch(batch, sub, **synth_kw)
            if prev is not None:
                for wav in self._s2_fetch(prev):
                    yield emit(wav)
            prev = self._s2_launch(batch, s1, speed=speed)
        if prev is not None:
            for wav in self._s2_fetch(prev):
                yield emit(wav)

    # ------------------------------------------------------------------
    # v1/v2 synthesis, staged for cross-group overlap (round 5):
    #   _s1_launch   dispatch the AR decode, start the async lengths copy
    #   _s2_launch   block on lengths (bucket choice), dispatch S2; tokens
    #                stay ON DEVICE between the stages (VERDICT r4 #1a —
    #                the old path fetched the full token matrix to host
    #                and re-uploaded it)
    #   _s2_fetch    fetch the int16 waveform, trim per row
    # run() interleaves groups so group i's fetch + host glue overlap
    # group i+1's device compute (the bench_pipelined loop, now shipped).
    # ------------------------------------------------------------------

    def _ref_dev(self, b: int):
        """Device-resident per-batch-size reference tensors (spec, spec
        lens, sv emb, fused ge, prompt) — uploaded once per (reference,
        batch size) instead of once per group."""
        cache = getattr(self, "_ref_dev_cache", None)
        if cache is None or cache.get("ref") is not self.ref:
            cache = {"ref": self.ref}
            self._ref_dev_cache = cache
        ent = cache.get(b)
        if ent is None:
            ref = self.ref
            refer_spec = jnp.asarray(ref.refer_spec[None].repeat(b, axis=0))
            refer_lens = jnp.full((b,), ref.refer_spec.shape[0], jnp.int32)
            sv = jnp.asarray(ref.sv_emb[None].repeat(b, axis=0)) if ref.sv_emb is not None else None
            # multi-reference: the fused ge (precomputed in set_ref_audio)
            # short-circuits the in-graph reference encoder
            ge = jnp.asarray(ref.ge.repeat(b, axis=0)) if ref.ge is not None else None
            prompts = jnp.asarray(
                np.broadcast_to(ref.prompt_semantic, (b, len(ref.prompt_semantic))).copy()
            )
            ent = (refer_spec, refer_lens, sv, ge, prompts)
            cache[b] = ent
        return ent

    def _s1_launch(self, batch, key, *, top_k, top_p, temperature, repetition_penalty, max_sec, early_stop_num=None):
        b = len(batch)
        ref = self.ref
        tp = len(ref.prompt_semantic)
        tx_max = _next_bucket(max(len(s["phones"]) for s in batch))
        phones = np.zeros((b, tx_max), np.int32)
        bert = np.zeros((b, tx_max, 1024), np.float32)
        x_lens = np.zeros((b,), np.int32)
        for i, s in enumerate(batch):
            n = len(s["phones"])
            phones[i, tx_max - n :] = s["phones"]  # LEFT pad
            bert[i, tx_max - n :] = s["bert"][:n]
            x_lens[i] = n
        max_new = int(self.s1.cfg.semantic_frame_rate * max_sec)
        prompts_d = self._ref_dev(b)[4]
        phones_d, bert_d = self._dp(phones, bert)
        out = generate(
            self.s1, self.s1_params,
            jnp.asarray(phones_d), jnp.asarray(x_lens), jnp.asarray(bert_d),
            prompts_d, jnp.full((b,), tp, jnp.int32), key,
            max_new_tokens=max_new, top_k=top_k, top_p=top_p,
            temperature=temperature, repetition_penalty=repetition_penalty,
            early_stop_num=-1 if early_stop_num is None else early_stop_num,
            use_fused_kernel=self.use_fused_s1,
            weight_quant=self.s1_weight_quant,
            kv_cache_quant=self.s1_kv_quant,
        )
        # the ONLY host-bound S1 data is the tiny lengths vector (bucket
        # choice); start its copy now so the blocking read in _s2_launch
        # overlaps the previous group's fetch/glue
        if hasattr(out.lengths, "copy_to_host_async"):
            out.lengths.copy_to_host_async()
        return out, tx_max

    def _s2_launch(self, batch, s1_state, *, speed, eager: bool = False):
        out, tx_max = s1_state
        b = len(batch)
        if eager:
            # no host read between S1 and S2: dispatch S2 at the full
            # decode-cap width. Used when there is nothing to overlap the
            # lengths read with (a single group) — the read would sit a
            # whole link RTT on the latency path, which costs more than
            # the extra padded S2 frames (bench.py chains the stages the
            # same way). GSVT_S2_EAGER=0 restores bucketing (e.g. for a
            # locally attached chip, where RTT ~0.1 ms).
            tc = min(_next_bucket(out.tokens.shape[1]), out.tokens.shape[1])
        else:
            tc = _next_bucket(int(np.asarray(out.lengths).max()))
        codes = out.tokens[:, :tc]  # device-resident slice
        refer_spec, refer_lens, sv, ge, _ = self._ref_dev(b)
        wav_dev = self._s2_decode(
            getattr(self, "_s2_call_params", self.s2_params),
            codes, out.lengths, jnp.asarray(phones_right(batch, tx_max)),
            jnp.asarray([len(s["phones"]) for s in batch], dtype=jnp.int32),
            refer_spec, refer_lens,
            speed=speed, sv_emb=sv, ge=ge,
        )
        return wav_dev, out.lengths

    def _s2_fetch(self, state):
        wav_dev, lengths_dev = state
        wav = np.asarray(wav_dev)[..., 0]  # int16 on the wire (_wav_to_i16)
        lengths = np.asarray(lengths_dev)  # ready long before the wav
        hop_up = int(np.prod(self.s2.cfg.upsample_rates))
        return [
            wav[i, : int(lengths[i]) * 2 * hop_up].astype(np.float32) / 32767.0
            for i in range(wav.shape[0])
        ]

    def _synthesize_batch(self, batch, key, *, top_k, top_p, temperature, repetition_penalty, speed, max_sec, early_stop_num=None):
        s1 = self._s1_launch(
            batch, key, top_k=top_k, top_p=top_p, temperature=temperature,
            repetition_penalty=repetition_penalty, max_sec=max_sec,
            early_stop_num=early_stop_num,
        )
        return self._s2_fetch(self._s2_launch(batch, s1, speed=speed))


    def _dp(self, *arrays):
        """Device-put arrays with batch-dim DP sharding when a mesh is set
        (multi-host/multi-chip serving: utterances spread over 'data')."""
        if self.mesh is None:
            return arrays
        n_data = self.mesh.shape.get("data", 1)
        if arrays[0].shape[0] % n_data != 0:
            return arrays  # uneven tail batch: let XLA replicate
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("data"))
        return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)

    # ------------------------------------------------------------------
    # v3/v4: chunked CFM with rolling reference + vocoder (TTS.py:1440-1495)
    # ------------------------------------------------------------------

    def _s1_generate(self, batch, key, *, top_k, top_p, temperature, repetition_penalty, max_sec):
        b = len(batch)
        ref = self.ref
        tp = len(ref.prompt_semantic)
        tx_max = _next_bucket(max(len(s["phones"]) for s in batch))
        phones = np.zeros((b, tx_max), np.int32)
        bert = np.zeros((b, tx_max, 1024), np.float32)
        x_lens = np.zeros((b,), np.int32)
        for i, s in enumerate(batch):
            n = len(s["phones"])
            phones[i, tx_max - n :] = s["phones"]
            bert[i, tx_max - n :] = s["bert"][:n]
            x_lens[i] = n
        prompts = np.broadcast_to(ref.prompt_semantic, (b, tp)).copy()
        max_new = int(self.s1.cfg.semantic_frame_rate * max_sec)
        phones_d, bert_d, prompts_d = self._dp(phones, bert, prompts)
        out = generate(
            self.s1, self.s1_params,
            jnp.asarray(phones_d), jnp.asarray(x_lens), jnp.asarray(bert_d),
            jnp.asarray(prompts_d), jnp.full((b,), tp, jnp.int32), key,
            max_new_tokens=max_new, top_k=top_k, top_p=top_p,
            temperature=temperature, repetition_penalty=repetition_penalty,
            use_fused_kernel=self.use_fused_s1,
            weight_quant=self.s1_weight_quant,
            kv_cache_quant=self.s1_kv_quant,
        )
        return np.asarray(out.tokens), np.asarray(out.lengths)

    def _v3_ref_features(self):
        """fea_ref (1,T,512), ge, mel2 (1,T,100) — cached per reference."""
        if self._fea_ref_cache is not None:
            return self._fea_ref_cache
        ref = self.ref
        v3 = self.v3
        if not ref.prompt_phones:
            raise ValueError("v3/v4 synthesis requires reference text (set_ref_audio(..., ref_text=...))")
        prompt_ids = cleaned_text_to_sequence(ref.prompt_phones, self.version)
        codes = jnp.asarray(ref.prompt_semantic[None])
        fea_ref, ge, _ = self._decode_encp(
            v3.params, codes, jnp.asarray([codes.shape[1]]),
            jnp.asarray([prompt_ids]), jnp.asarray([len(prompt_ids)]),
            jnp.asarray(ref.refer_spec[None]), jnp.asarray([ref.refer_spec.shape[0]]),
        )
        wav_t = resample(ref.raw_wav, ref.raw_sr, v3.mel_cfg.sampling_rate)
        mel2 = norm_spec(mel_spectrogram(jnp.asarray(wav_t[None]), v3.mel_cfg))  # (1, M, T)
        mel2 = jnp.swapaxes(mel2, 1, 2)  # (1, T, M)
        t_min = min(mel2.shape[1], fea_ref.shape[1])
        mel2 = mel2[:, :t_min]
        fea_ref = fea_ref[:, :t_min]
        if t_min > v3.t_ref:
            mel2 = mel2[:, -v3.t_ref :]
            fea_ref = fea_ref[:, -v3.t_ref :]
            t_min = v3.t_ref
        # cached as DEVICE arrays: both v3 paths feed them straight into
        # jitted calls; host copies would round-trip per request
        self._fea_ref_cache = (fea_ref, ge, mel2, t_min)
        return self._fea_ref_cache

    def _synthesize_v3_batch(
        self, batch, key, *, top_k, top_p, temperature, repetition_penalty, speed, max_sec,
        sample_steps=None, super_sampling=None,
    ):
        v3 = self.v3
        tokens, lengths = self._s1_generate(
            batch, key, top_k=top_k, top_p=top_p, temperature=temperature,
            repetition_penalty=repetition_penalty, max_sec=max_sec,
        )
        fea_ref0, ge, mel2_0, t_min = self._v3_ref_features()
        upsample = v3.out_sr * v3.mel_cfg.hop_size // v3.mel_cfg.sampling_rate
        chunk_len = v3.t_chunk - t_min

        out_wavs = []
        for i, seg in enumerate(batch):
            n = int(lengths[i])
            codes = jnp.asarray(tokens[i : i + 1, : _next_bucket(n)])
            pids = np.asarray(seg["phones"], np.int32)
            fea_todo, _, mel_len = self._decode_encp(
                v3.params, codes, jnp.asarray([n]),
                jnp.asarray(pids[None]), jnp.asarray([len(pids)]),
                jnp.asarray(self.ref.refer_spec[None]), jnp.asarray([self.ref.refer_spec.shape[0]]),
                speed=speed,
            )
            total = int(mel_len[0])
            # rolling-reference loop with DEVICE-resident glue: the chunk
            # slicing/concat/pad are eager jnp ops so conditioning features
            # and mel never round-trip through the host between stages
            fea_todo = fea_todo[:, :total]
            fea_ref, mel2 = fea_ref0, mel2_0
            mel_chunks = []
            idx = 0
            key2 = key
            while idx < total:
                ln = min(chunk_len, total - idx)
                chunk = fea_todo[:, idx : idx + ln]
                fea = jnp.concatenate([fea_ref, chunk], axis=1)
                pad = v3.t_chunk - fea.shape[1]
                if pad > 0:
                    fea = jnp.pad(fea, ((0, 0), (0, pad), (0, 0)))
                key2, sub = jax.random.split(key2)
                mel_out = self._cfm_infer(
                    self._dit_params, fea, jnp.asarray([t_min + ln]), mel2, sub,
                    n_steps=int(sample_steps or v3.sample_steps),
                )
                mel_out = mel_out[:, t_min : t_min + ln]
                mel_chunks.append(mel_out)
                mel2 = mel_out[:, -t_min:] if ln >= t_min else jnp.concatenate([mel2, mel_out], 1)[:, -t_min:]
                fea_ref = chunk[:, -t_min:] if ln >= t_min else jnp.concatenate([fea_ref, chunk], 1)[:, -t_min:]
                idx += ln
            mel_full = denorm_spec(jnp.concatenate(mel_chunks, axis=1))
            # bucket the vocoder's time axis (multiples of 256 frames, edge
            # pad): every distinct utterance length would otherwise compile
            # a fresh vocoder program
            t_pad = -mel_full.shape[1] % 256
            if t_pad:
                mel_full = jnp.pad(mel_full, ((0, 0), (0, t_pad), (0, 0)), mode="edge")
            wav = np.asarray(self._vocoder_fwd(self._voc_call_params, mel_full))[0, :, 0]
            wav = wav.astype(np.float32) / 32767.0  # device fetch is int16 (_wav_to_i16)
            wav = wav[: total * upsample]
            if v3.sr_model is not None and v3.sr_params is not None and super_sampling is not False:
                from gpt_sovits_tpu.models.apbwe import super_resolve

                up, _ = super_resolve(v3.sr_model, v3.sr_params, jnp.asarray(wav[None]), v3.out_sr)
                wav = np.asarray(up)[0]
            out_wavs.append(wav)
        return out_wavs

    def _mel_len_for(self, n_tokens: int, speed: float) -> int:
        """Host-side twin of decode_encp's mel_len (models/v3.py:118-128:
        nominal frames clamped to the interpolated content length) — a
        closed-form function of the token count, so the launch path never
        syncs on the device-computed value (parity:
        tests/test_pipeline_v3.py::test_mel_len_host_formula_matches_device)."""
        v3 = self.v3.model.cfg.version == "v3"
        f = np.float32(3.875 if v3 else 4)
        interp = np.float32(1.875 if v3 else 2.0)
        if speed != 1.0:
            ml = int(np.float32(n_tokens) * f / np.float32(speed)) + 1
        else:
            ml = int(np.float32(n_tokens) * f)
        content = int(np.floor(np.float32(n_tokens * 2) * interp))
        return min(ml, content)

    def _v3_launch(self, batch, s1_state, key, *, speed, sample_steps=None):
        """Batched v3/v4 path, launch stage: all segments' conditioning
        features are concatenated, sliced into overlapping T_chunk
        windows, pushed through ONE batched CFM call + ONE vocoder call
        (the reference's using_vocoder_synthesis_batched_infer,
        TTS.py:1496-1635). Everything stays on device; the only blocking
        read is the S1 lengths vector whose copy began at dispatch.

        TPU notes: the chunk batch is padded to a small bucket so the
        (bs, T_chunk) DiT shapes stay in a bounded compile cache, and the
        batched CFM is the MXU-dense formulation of the serial loop."""
        v3 = self.v3
        out, _tx = s1_state
        lengths = np.asarray(out.lengths)
        fea_ref0, ge, mel2_0, t_min = self._v3_ref_features()
        upsample = v3.out_sr * v3.mel_cfg.hop_size // v3.mel_cfg.sampling_rate
        chunk_len = v3.t_chunk - t_min
        overlap = v3.overlapped_len

        # per-segment conditioning features (cheap relative to CFM) —
        # kept on DEVICE: only the final waveform leaves the chip. The
        # cached fused `ge` short-circuits per-segment reference encoding.
        feat_list, feat_lens = [], []
        for i, seg in enumerate(batch):
            n = int(lengths[i])
            codes = out.tokens[i : i + 1, : _next_bucket(n)]  # device slice
            pids = np.asarray(seg["phones"], np.int32)
            fea, _, _ = self._decode_encp(
                v3.params, codes, jnp.asarray([n]),
                jnp.asarray(pids[None]), jnp.asarray([len(pids)]),
                jnp.asarray(self.ref.refer_spec[None]), jnp.asarray([self.ref.refer_spec.shape[0]]),
                speed=speed, ge=ge,
            )
            total = self._mel_len_for(n, speed)
            feat_list.append(fea[:, :total])
            feat_lens.append(total)

        # one stream, front-padded by the SOLA overlap, cut into overlapping
        # chunks (TTS.py:1553-1575) — assembled in ONE jitted program
        feats = feat_list[0] if len(feat_list) == 1 else jnp.concatenate(feat_list, axis=1)
        total_frames = sum(feat_lens)
        stride = chunk_len - overlap
        # closed-form chunk count. DELIBERATE deviation from the reference
        # loop (TTS.py:1553-1575): when total_frames lands within `overlap`
        # of a stride boundary the reference emits one extra chunk holding
        # only the duplicated overlap tail (its last overlap region gets a
        # SOLA crossfade; ours comes from the previous chunk alone). Output
        # sample count and real-frame coverage are identical — verified by
        # simulation over T=1..4000 — and the closed form saves one full
        # CFM+vocoder chunk at those boundaries.
        bs = max(1, -(-(total_frames + overlap - chunk_len) // stride) + 1)
        padding_len = (bs - 1) * stride + chunk_len - (total_frames + overlap)
        bs_pad = _next_bs_bucket(bs)  # bucket the batch dim
        fea = _v3_assemble_chunks(
            feats, fea_ref0, bs=bs, bs_pad=bs_pad, overlap=overlap, chunk_len=chunk_len
        )
        mel2 = jnp.repeat(mel2_0, bs_pad, axis=0)
        key, sub = jax.random.split(key)
        mel_out = self._cfm_infer(
            self._dit_params, fea, jnp.full((bs_pad,), t_min + chunk_len, jnp.int32),
            mel2, sub, n_steps=int(sample_steps or v3.sample_steps),
        )
        # (bs_pad, t_min+chunk_len, M) -> one long mel; bucket rows beyond
        # bs hold the last real frame (mode="edge") so the vocoder compile
        # cache stays bounded without contaminating the last real chunk
        mel_long = mel_out[:bs, t_min:].reshape(1, bs * chunk_len, -1)
        if bs_pad > bs:
            mel_long = jnp.pad(mel_long, ((0, 0), (0, (bs_pad - bs) * chunk_len), (0, 0)), mode="edge")
        wav_dev = self._vocoder_fwd(self._voc_call_params, denorm_spec(mel_long))
        # slice ON DEVICE to the real chunks before the int16 fetch — the
        # bucket's pad rows never cross the wire (up to ~2x fewer bytes)
        wav_dev = wav_dev[0, : bs * chunk_len * upsample, 0]
        if hasattr(wav_dev, "copy_to_host_async"):
            wav_dev.copy_to_host_async()
        return wav_dev, feat_lens, bs, padding_len, chunk_len, overlap, upsample

    def _v3_fetch(self, state, *, super_sampling=None):
        """Fetch stage: int16 waveform off device, SOLA crossfade, split
        back into per-segment clips (+ optional AP-BWE super-resolution)."""
        from gpt_sovits_tpu.dsp.sola import sola_stitch

        wav_dev, feat_lens, bs, padding_len, chunk_len, overlap, upsample = state
        v3 = self.v3
        wav = np.asarray(wav_dev).astype(np.float32) / 32767.0  # int16 on the wire

        frag_len = chunk_len * upsample
        fragments = [wav[k * frag_len : (k + 1) * frag_len] for k in range(bs)]
        audio = sola_stitch(fragments, overlap * upsample)
        audio = audio[overlap * upsample : len(audio) - padding_len * upsample or None]

        out_wavs = []
        off = 0
        for total in feat_lens:
            w = audio[off : off + total * upsample]
            off += total * upsample
            if v3.sr_model is not None and v3.sr_params is not None and super_sampling is not False:
                from gpt_sovits_tpu.models.apbwe import super_resolve

                up, _ = super_resolve(v3.sr_model, v3.sr_params, jnp.asarray(np.asarray(w)[None]), v3.out_sr)
                w = np.asarray(up)[0]
            out_wavs.append(np.asarray(w))
        return out_wavs

    def _synthesize_v3_batch_parallel(
        self, batch, key, *, top_k, top_p, temperature, repetition_penalty, speed, max_sec,
        sample_steps=None, super_sampling=None,
    ):
        s1 = self._s1_launch(
            batch, key, top_k=top_k, top_p=top_p, temperature=temperature,
            repetition_penalty=repetition_penalty, max_sec=max_sec,
        )
        state = self._v3_launch(batch, s1, key, speed=speed, sample_steps=sample_steps)
        return self._v3_fetch(state, super_sampling=super_sampling)


def phones_right(batch, tx_max) -> np.ndarray:
    """RIGHT-padded phone ids for the S2 text encoder."""
    b = len(batch)
    out = np.zeros((b, tx_max), np.int32)
    for i, s in enumerate(batch):
        n = len(s["phones"])
        out[i, :n] = s["phones"]
    return out
