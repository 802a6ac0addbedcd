"""Model factories: build flax models + params from checkpoints.

Sources supported:
  * reference PyTorch .pth/.ckpt (GPT weights, SoVITS weights, HuBERT/BERT
    HF dirs, SV ckpt) via utils/checkpoint_compat mappings
  * this framework's .npz distribution exports (train/ckpt.py)
  * random init (smoke tests / from-scratch training)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.utils.config import S1Config, s2_config_for_version


def load_s1(path: Optional[str] = None, cfg: S1Config = S1Config(), *, dtype=jnp.bfloat16):
    """S1 AR model from a reference GPT .ckpt/.pth or our .npz."""
    from gpt_sovits_tpu.models.t2s import T2SDecoder

    model = T2SDecoder(cfg, dtype=dtype)
    if path is None:
        params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
        return model, params
    if path.endswith(".npz"):
        from gpt_sovits_tpu.train.ckpt import load_weights

        tree, _ = load_weights(path)
        return model, {"params": tree}
    from gpt_sovits_tpu.utils.checkpoint_compat import load_torch_checkpoint, s1_params_from_torch

    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("weight", ckpt.get("state_dict", ckpt))
    return model, s1_params_from_torch(sd, cfg)


def load_s2(path: Optional[str] = None, version: Optional[str] = None, *, lora_base_path: Optional[str] = None):
    """S2 synthesizer (any version) from a reference SoVITS .pth or random.

    LoRA distribution ckpts (v3/v4 fine-tunes) need `lora_base_path` — the
    stock pretrained SoVITS file the LoRA was trained from; the deltas are
    merged at load (TTS.py:552-572)."""
    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3
    from gpt_sovits_tpu.models.vits import SynthesizerTrn

    is_lora = False
    if path is not None:
        from gpt_sovits_tpu.utils.checkpoint_compat import sniff_sovits_version

        _, sniffed, is_lora = sniff_sovits_version(path)
        version = version or sniffed
    version = version or "v2"
    cfg = s2_config_for_version(version)
    model = SynthesizerTrnV3(cfg) if cfg.is_cfm else SynthesizerTrn(cfg)
    if path is None:
        return model, None, version
    from gpt_sovits_tpu.utils.checkpoint_compat import (
        load_torch_checkpoint,
        merge_lora_state_dict,
        s2_params_from_torch,
        s2v3_params_from_torch,
    )

    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("weight", ckpt)
    if is_lora:
        if lora_base_path is None:
            raise ValueError(
                f"{path} is a LoRA fine-tune export; pass lora_base_path= the "
                "pretrained SoVITS file it was trained from (the reference "
                "merges onto pretrained_models/..., TTS.py:552-572)"
            )
        base = load_torch_checkpoint(lora_base_path)
        sd = merge_lora_state_dict(sd, base.get("weight", base))
    params = s2v3_params_from_torch(sd, cfg) if cfg.is_cfm else s2_params_from_torch(sd, cfg)
    return model, params, version


def load_hubert(path: Optional[str] = None):
    """CNHuBERT from an HF model dir (chinese-hubert-base) or random tiny."""
    from gpt_sovits_tpu.models.hubert import HubertConfig, HubertEncoder, params_from_torch

    model = HubertEncoder(HubertConfig())
    if path is None:
        return model, None
    import torch

    bin_path = None
    for name in ("pytorch_model.bin", "model.safetensors"):
        cand = os.path.join(path, name)
        if os.path.exists(cand):
            bin_path = cand
            break
    if bin_path is None:
        raise FileNotFoundError(f"no weights found under {path}")
    if bin_path.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(bin_path)
    else:
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    sd = {k.removeprefix("hubert."): v for k, v in sd.items()}
    return model, params_from_torch(sd)


def load_bert(path: Optional[str] = None):
    """chinese-roberta-wwm-ext-large from an HF dir, with tokenizer."""
    if path is None:
        return None, None, None
    from transformers import AutoTokenizer

    from gpt_sovits_tpu.models.bert import BertConfig, BertEncoder, params_from_torch

    import torch

    tokenizer = AutoTokenizer.from_pretrained(path)
    model = BertEncoder(BertConfig())
    bin_path = os.path.join(path, "pytorch_model.bin")
    sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    sd = {k.removeprefix("bert."): v for k, v in sd.items()}
    return model, params_from_torch(sd), tokenizer


def load_sv(path: Optional[str] = None):
    """ERes2NetV2 speaker embedder from the reference ckpt."""
    from gpt_sovits_tpu.models.eres2net import ERes2NetConfig, ERes2NetV2, kaldi_fbank, params_from_torch

    cfg = ERes2NetConfig(base_width=24, scale=4, expansion=4)
    model = ERes2NetV2(cfg)
    if path is None:
        return model, None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return model, params_from_torch(sd, cfg)


def load_vocoder(vocoder_path: Optional[str], version: str = "v3"):
    """v3/v4 vocoder model (+params when a checkpoint is given): BigVGAN for
    v3, the x480 48 kHz Generator for v4 (reference TTS.init_vocoder
    constants, TTS.py:601-660)."""
    if version == "v3":
        from gpt_sovits_tpu.models.bigvgan import BigVGAN, BigVGANConfig, params_from_torch as bigvgan_from_torch

        voc = BigVGAN(BigVGANConfig())
        voc_params = None
        if vocoder_path:
            import torch

            sd = torch.load(vocoder_path, map_location="cpu", weights_only=False)
            sd = sd.get("generator", sd)
            voc_params = bigvgan_from_torch(sd)
        return voc, voc_params
    # v4: x480 HiFiGAN generator to 48 kHz (TTS.py:631-655)
    from gpt_sovits_tpu.models.vits import Generator
    from gpt_sovits_tpu.utils.config import replace as cfg_replace, s2_config_for_version

    vcfg = cfg_replace(
        s2_config_for_version("v4"),
        upsample_rates=(10, 6, 2, 2, 2), upsample_kernel_sizes=(20, 12, 4, 4, 4),
        upsample_initial_channel=512,
    )
    voc = Generator(vcfg, use_post_bias=True)
    voc_params = None
    if vocoder_path:
        import torch

        from gpt_sovits_tpu.utils.checkpoint_compat import _SD

        sd = _SD(torch.load(vocoder_path, map_location="cpu", weights_only=False))
        p: dict = {"conv_pre": {"Conv_0": sd.conv("conv_pre")}, "conv_post": {"Conv_0": sd.conv("conv_post")}}
        n_k = len(vcfg.resblock_kernel_sizes)
        for i in range(len(vcfg.upsample_rates)):
            p[f"up_{i}"] = sd.convtrans(f"ups.{i}")
            for j in range(n_k):
                rb = {}
                for di in range(len(vcfg.resblock_dilation_sizes[j])):
                    rb[f"c1_{di}"] = {"Conv_0": sd.conv(f"resblocks.{i * n_k + j}.convs1.{di}")}
                    rb[f"c2_{di}"] = {"Conv_0": sd.conv(f"resblocks.{i * n_k + j}.convs2.{di}")}
                p[f"resblock_{i}_{j}"] = rb
        voc_params = {"params": p}
    return voc, voc_params


def build_v3_bundle(s2_path: str, vocoder_path: Optional[str], version: str = "v3", *, sample_steps: int = 32):
    """Assemble the v3/v4 serving bundle: CFM synthesizer + vocoder
    (reference TTS.init_vocoder constants, TTS.py:601-660)."""
    from gpt_sovits_tpu.infer.pipeline import V3Bundle
    from gpt_sovits_tpu.utils.config import MEL_V3, MEL_V4

    model, params, version = load_s2(s2_path, version)
    voc, voc_params = load_vocoder(vocoder_path, version)
    t_chunk = _serving_t_chunk(934 if version == "v3" else 1000)
    if version == "v3":
        return V3Bundle(
            model=model, params=params, vocoder=voc, vocoder_params=voc_params,
            mel_cfg=MEL_V3, t_ref=468, t_chunk=t_chunk, out_sr=24000, sample_steps=sample_steps,
        )
    return V3Bundle(
        model=model, params=params, vocoder=voc, vocoder_params=voc_params,
        mel_cfg=MEL_V4, t_ref=500, t_chunk=t_chunk, out_sr=48000, sample_steps=sample_steps,
    )


def _serving_t_chunk(ref_value: int) -> int:
    """CFM window length for serving. The reference uses 934 (v3) /
    1000 (v4) (TTS.py:619,654) — but on TPU the DiT pads every chunk to
    the next 512-multiple anyway (flash-attention block + MXU tiling,
    models/v3.py cfm_inference), so a 934-frame chunk COSTS 1024 frames
    while only yielding 466 new frames. Serving therefore uses the full
    tile: t_chunk=1024 gives +19% coverage per chunk at identical
    per-chunk cost -> fewer CFM chunks per utterance. The DiT is
    length-agnostic (RoPE + convs) and the reference itself runs the same
    architecture at 1000 frames for v4. CPU keeps the reference values
    (no tile padding there). Override with GSVT_T_CHUNK."""
    env = os.environ.get("GSVT_T_CHUNK")
    if env:
        return int(env)
    if jax.default_backend() == "cpu":
        return ref_value
    return 1024


def build_pipeline(
    *,
    s1_path: Optional[str] = None,
    s2_path: Optional[str] = None,
    version: Optional[str] = None,
    hubert_path: Optional[str] = None,
    bert_path: Optional[str] = None,
    sv_path: Optional[str] = None,
    infer_cfg=None,
    s1_weight_quant: Optional[str] = None,  # None: int8 on TPU (TRIAGE_s1_r04)
    s1_kv_quant: Optional[str] = None,
):
    """Assemble a TTSPipeline from checkpoint paths (reference formats)."""
    from gpt_sovits_tpu.infer.pipeline import TTSPipeline, V3Bundle
    from gpt_sovits_tpu.utils.config import MEL_V3, MEL_V4, InferenceConfig, MelConfig

    s1_model, s1_params = load_s1(s1_path)
    s2_model, s2_params, version = load_s2(s2_path, version)
    hubert, hubert_params = load_hubert(hubert_path)
    bert, bert_params, tokenizer = load_bert(bert_path)
    sv_model = sv_params = None
    if version in ("v2Pro", "v2ProPlus"):
        sv_model, sv_params = load_sv(sv_path)

    v3_bundle = None
    if version in ("v3", "v4"):
        raise NotImplementedError(
            "v3/v4 serving via build_pipeline needs the vocoder checkpoint; "
            "use build_v3_bundle(...) and pass v3_bundle to TTSPipeline"
        )
    return TTSPipeline(
        s1_model=s1_model, s1_params=s1_params,
        s2_model=s2_model, s2_params=s2_params,
        hubert_model=hubert, hubert_params=hubert_params,
        bert_model=bert, bert_params=bert_params, bert_tokenizer=tokenizer,
        sv_model=sv_model, sv_params=sv_params,
        mel_cfg=MelConfig(), infer_cfg=infer_cfg or InferenceConfig(version=version),
        v3_bundle=v3_bundle,
        s1_weight_quant=s1_weight_quant, s1_kv_quant=s1_kv_quant,
    )
