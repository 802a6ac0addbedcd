"""Reference-checkpoint interop.

Reads the PyTorch GPT-SoVITS checkpoint formats and maps the state dicts
onto this framework's flax param trees, so pretrained reference weights run
on TPU and parity tests can compare outputs numerically.

Covers the reference's quirky container formats (process_ckpt.py):
  * 2-byte model-version header replacing the zip "PK" magic (my_save2:30,
    head2version:72-80)
  * md5-of-first-8KB pretrained recognition (:81-97)
  * fp16 "distribution" ckpts {weight, config, info[, lora_rank]} (savee:41)
and the weight-norm folding needed because the torch modules store
weight_g/weight_v (or parametrizations.*) while this framework stores plain
kernels.
"""

from __future__ import annotations

import hashlib
import io
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

HEAD2VERSION = {
    b"00": ("v1", "v1", False),
    b"01": ("v2", "v2", False),
    b"02": ("v2", "v3", False),
    b"03": ("v2", "v3", True),
    b"04": ("v2", "v4", True),
    b"05": ("v2", "v2Pro", False),
    b"06": ("v2", "v2ProPlus", False),
}

HASH_PRETRAINED = {
    "dc3c97e17592963677a4a1681f30c653": ("v2", "v2", False),
    "43797be674a37c1c83ee81081941ed0f": ("v2", "v3", False),
    "6642b37f3dbb1f76882b69937c95a5f3": ("v2", "v2", False),
    "4f26b9476d0c5033e04162c486074374": ("v2", "v4", False),
    "c7e9fce2223f3db685cdfa1e6368728a": ("v2", "v2Pro", False),
    "66b313e39455b57ab1b0bc0b239c9d0a": ("v2", "v2ProPlus", False),
}


def sniff_sovits_version(path: str) -> tuple[str, str, bool]:
    """(symbol_version, model_version, is_lora) — parity with
    get_sovits_version_from_path_fast (process_ckpt.py:100)."""
    with open(path, "rb") as f:
        head8k = f.read(8192)
    h = hashlib.md5(head8k).hexdigest()
    if h in HASH_PRETRAINED:
        return HASH_PRETRAINED[h]
    head = head8k[:2]
    if head != b"PK":
        return HEAD2VERSION[head]
    size = os.path.getsize(path)
    if size < 82978 * 1024:
        return ("v1", "v1", False)
    if size < 700 * 1024 * 1024:
        return ("v2", "v2", False)
    return ("v2", "v3", False)


def load_torch_checkpoint(path: str) -> dict:
    """torch.load that tolerates the version-byte header (load_sovits_new)."""
    import torch

    with open(path, "rb") as f:
        head = f.read(2)
        if head == b"PK":
            f.seek(0)
            return torch.load(f, map_location="cpu", weights_only=False)
        data = b"PK" + f.read()
    return torch.load(io.BytesIO(data), map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


class _SD:
    """State-dict view with weight-norm folding."""

    def __init__(self, sd: dict):
        self.sd = {k: v for k, v in sd.items()}

    def __contains__(self, k):
        return k in self.sd

    def get(self, name) -> np.ndarray:
        return _np(self.sd[name])

    def folded(self, prefix) -> np.ndarray:
        """Return `{prefix}.weight` with weight_norm folded if present.
        torch weight_norm default dim=0: w = g * v / ||v|| over dims != 0."""
        if f"{prefix}.weight" in self.sd:
            return self.get(f"{prefix}.weight")
        if f"{prefix}.weight_g" in self.sd:
            g = self.get(f"{prefix}.weight_g")
            v = self.get(f"{prefix}.weight_v")
        else:
            g = self.get(f"{prefix}.parametrizations.weight.original0")
            v = self.get(f"{prefix}.parametrizations.weight.original1")
        axes = tuple(range(1, v.ndim))
        norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
        return g * v / np.maximum(norm, 1e-12)

    def conv(self, prefix) -> dict:
        """torch Conv1d (out,in,k) -> flax nn.Conv kernel (k,in,out)."""
        w = self.folded(prefix)
        out = {"kernel": jnp.asarray(w.transpose(2, 1, 0))}
        if f"{prefix}.bias" in self.sd:
            out["bias"] = jnp.asarray(self.get(f"{prefix}.bias"))
        return out

    def convtrans(self, prefix) -> dict:
        """torch ConvTranspose1d (in,out,k) -> ConvTranspose1d kernel (k,in,out)."""
        w = self.folded(prefix)
        out = {"kernel": jnp.asarray(w.transpose(2, 0, 1))}
        if f"{prefix}.bias" in self.sd:
            out["bias"] = jnp.asarray(self.get(f"{prefix}.bias"))
        return out

    def dense(self, prefix) -> dict:
        w = self.get(f"{prefix}.weight")
        out = {"kernel": jnp.asarray(w.T)}
        if f"{prefix}.bias" in self.sd:
            out["bias"] = jnp.asarray(self.get(f"{prefix}.bias"))
        return out

    def conv1x1_as_dense(self, prefix) -> dict:
        """torch Conv1d(in,out,1) -> flax Dense."""
        w = self.folded(prefix)[:, :, 0]  # (out,in)
        out = {"kernel": jnp.asarray(w.T)}
        if f"{prefix}.bias" in self.sd:
            out["bias"] = jnp.asarray(self.get(f"{prefix}.bias"))
        return out

    def ln(self, prefix, gamma="gamma", beta="beta") -> dict:
        return {
            "scale": jnp.asarray(self.get(f"{prefix}.{gamma}")),
            "bias": jnp.asarray(self.get(f"{prefix}.{beta}")),
        }

    def embed(self, prefix) -> dict:
        return {"embedding": jnp.asarray(self.get(f"{prefix}.weight"))}


# ---------------------------------------------------------------------------
# S2 SynthesizerTrn mapping
# ---------------------------------------------------------------------------


def _map_relpos_encoder(sd: _SD, pre: str, n_layers: int) -> dict:
    out: dict[str, Any] = {}
    for i in range(n_layers):
        attn = {
            "conv_q": sd.conv1x1_as_dense(f"{pre}.attn_layers.{i}.conv_q"),
            "conv_k": sd.conv1x1_as_dense(f"{pre}.attn_layers.{i}.conv_k"),
            "conv_v": sd.conv1x1_as_dense(f"{pre}.attn_layers.{i}.conv_v"),
            "conv_o": sd.conv1x1_as_dense(f"{pre}.attn_layers.{i}.conv_o"),
            "emb_rel_k": jnp.asarray(sd.get(f"{pre}.attn_layers.{i}.emb_rel_k")),
            "emb_rel_v": jnp.asarray(sd.get(f"{pre}.attn_layers.{i}.emb_rel_v")),
        }
        out[f"attn_{i}"] = attn
        out[f"norm1_{i}"] = sd.ln(f"{pre}.norm_layers_1.{i}")
        out[f"ffn_{i}"] = {
            "conv1": {"Conv_0": sd.conv(f"{pre}.ffn_layers.{i}.conv_1")},
            "conv2": {"Conv_0": sd.conv(f"{pre}.ffn_layers.{i}.conv_2")},
        }
        out[f"norm2_{i}"] = sd.ln(f"{pre}.norm_layers_2.{i}")
    return out


def _map_wn(sd: _SD, pre: str, n_layers: int, has_cond: bool) -> dict:
    out: dict[str, Any] = {}
    cond_present = any(
        f"{pre}.cond_layer.{suffix}" in sd.sd
        for suffix in ("weight", "weight_g", "parametrizations.weight.original0")
    )
    if has_cond and cond_present:
        out["cond_layer"] = {"Conv_0": sd.conv(f"{pre}.cond_layer")}
    for i in range(n_layers):
        out[f"in_{i}"] = {"Conv_0": sd.conv(f"{pre}.in_layers.{i}")}
        out[f"res_skip_{i}"] = {"Conv_0": sd.conv(f"{pre}.res_skip_layers.{i}")}
    return out


def _map_mrte(sd: _SD, pre: str) -> dict:
    return {
        "cross_attention": {
            "conv_q": sd.conv1x1_as_dense(f"{pre}.cross_attention.conv_q"),
            "conv_k": sd.conv1x1_as_dense(f"{pre}.cross_attention.conv_k"),
            "conv_v": sd.conv1x1_as_dense(f"{pre}.cross_attention.conv_v"),
            "conv_o": sd.conv1x1_as_dense(f"{pre}.cross_attention.conv_o"),
        },
        "c_pre": {"Conv_0": sd.conv(f"{pre}.c_pre")},
        "text_pre": {"Conv_0": sd.conv(f"{pre}.text_pre")},
        "c_post": {"Conv_0": sd.conv(f"{pre}.c_post")},
    }


def _map_style_encoder(sd: _SD, pre: str) -> dict:
    return {
        "spectral1": sd.dense(f"{pre}.spectral.0.fc"),
        "spectral2": sd.dense(f"{pre}.spectral.3.fc"),
        "temporal1": {"conv1": {"Conv_0": sd.conv(f"{pre}.temporal.0.conv1.conv")}},
        "temporal2": {"conv1": {"Conv_0": sd.conv(f"{pre}.temporal.1.conv1.conv")}},
        "slf_attn": {
            "w_qs": sd.dense(f"{pre}.slf_attn.w_qs"),
            "w_ks": sd.dense(f"{pre}.slf_attn.w_ks"),
            "w_vs": sd.dense(f"{pre}.slf_attn.w_vs"),
            "fc": sd.dense(f"{pre}.slf_attn.fc"),
        },
        "fc": sd.dense(f"{pre}.fc.fc"),
    }


def s2_params_from_torch(state_dict: dict, cfg) -> dict:
    """Reference SynthesizerTrn state_dict -> SynthesizerTrn flax params."""
    sd = _SD(state_dict)
    n_layers = cfg.n_layers

    enc_p: dict[str, Any] = {
        "ssl_proj": {"Conv_0": sd.conv("enc_p.ssl_proj")},
        "encoder_ssl": _map_relpos_encoder(sd, "enc_p.encoder_ssl", n_layers // 2),
        "text_embedding": sd.embed("enc_p.text_embedding"),
        "encoder_text": _map_relpos_encoder(sd, "enc_p.encoder_text", n_layers),
        "mrte": _map_mrte(sd, "enc_p.mrte"),
        "encoder2": _map_relpos_encoder(sd, "enc_p.encoder2", n_layers // 2),
        "proj": {"Conv_0": sd.conv("enc_p.proj")},
    }

    dec: dict[str, Any] = {"conv_pre": {"Conv_0": sd.conv("dec.conv_pre")}}
    if "dec.cond.weight" in sd.sd:
        dec["cond"] = {"Conv_0": sd.conv("dec.cond")}
    n_up = len(cfg.upsample_rates)
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(n_up):
        dec[f"up_{i}"] = sd.convtrans(f"dec.ups.{i}")
        for j in range(n_k):
            rb = {}
            for d in range(len(cfg.resblock_dilation_sizes[j])):
                rb[f"c1_{d}"] = {"Conv_0": sd.conv(f"dec.resblocks.{i * n_k + j}.convs1.{d}")}
                rb[f"c2_{d}"] = {"Conv_0": sd.conv(f"dec.resblocks.{i * n_k + j}.convs2.{d}")}
            dec[f"resblock_{i}_{j}"] = rb
    dec["conv_post"] = {"Conv_0": sd.conv("dec.conv_post")}

    flow: dict[str, Any] = {}
    for i in range(4):
        flow[f"flow_{i}"] = {
            "pre": {"Conv_0": sd.conv(f"flow.flows.{i * 2}.pre")},
            "enc": _map_wn(sd, f"flow.flows.{i * 2}.enc", 4, has_cond=True),
            "post": sd.conv(f"flow.flows.{i * 2}.post"),
        }
        # 'post' in our module is a bare nn.Conv named 'post'
        flow[f"flow_{i}"]["post"] = sd.conv(f"flow.flows.{i * 2}.post")

    params: dict[str, Any] = {
        "enc_p": enc_p,
        "dec": dec,
        "flow": flow,
        "ref_enc": _map_style_encoder(sd, "ref_enc"),
        "ssl_proj": sd.conv("ssl_proj"),
        "quantizer": {"embed": jnp.asarray(sd.get("quantizer.vq.layers.0._codebook.embed"))},
    }
    if "enc_q.pre.weight" in sd.sd:  # dropped in distribution ckpts (savee)
        params["enc_q"] = {
            "pre": {"Conv_0": sd.conv("enc_q.pre")},
            "enc": _map_wn(sd, "enc_q.enc", 16, has_cond=True),
            "proj": {"Conv_0": sd.conv("enc_q.proj")},
        }
    if cfg.is_pro:
        params["sv_emb"] = sd.dense("sv_emb")
        params["ge_to512"] = sd.dense("ge_to512")
        params["prelu_alpha"] = jnp.asarray(sd.get("prelu.weight"))
    return {"params": params}


def _map_dit(sd: _SD, pre: str, depth: int, conv_layers: int = 4) -> dict:
    """Reference f5_tts DiT state dict -> models/dit.py param tree."""

    def mlp(p):
        return {
            "mlp1": sd.dense(f"{p}.time_mlp.0"),
            "mlp2": sd.dense(f"{p}.time_mlp.2"),
        }

    text_embed: dict[str, Any] = {}
    for i in range(conv_layers):
        tp = f"{pre}.text_embed.text_blocks.{i}"
        text_embed[f"block_{i}"] = {
            "dwconv": sd.conv(f"{tp}.dwconv"),
            "norm": sd.ln(f"{tp}.norm", "weight", "bias"),
            "pwconv1": sd.dense(f"{tp}.pwconv1"),
            "pwconv2": sd.dense(f"{tp}.pwconv2"),
            "grn": {
                "gamma": jnp.asarray(sd.get(f"{tp}.grn.gamma")),
                "beta": jnp.asarray(sd.get(f"{tp}.grn.beta")),
            },
        }
    out: dict[str, Any] = {
        "time_embed": mlp(f"{pre}.time_embed"),
        "d_embed": mlp(f"{pre}.d_embed"),
        "text_embed": text_embed,
        "input_embed": {
            "proj": sd.dense(f"{pre}.input_embed.proj"),
            "conv_pos_embed": {
                "conv1": sd.conv(f"{pre}.input_embed.conv_pos_embed.conv1d.0"),
                "conv2": sd.conv(f"{pre}.input_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "norm_out_linear": sd.dense(f"{pre}.norm_out.linear"),
        "proj_out": sd.dense(f"{pre}.proj_out"),
    }
    for i in range(depth):
        bp = f"{pre}.transformer_blocks.{i}"
        out[f"block_{i}"] = {
            "ada_linear": sd.dense(f"{bp}.attn_norm.linear"),
            "to_q": sd.dense(f"{bp}.attn.to_q"),
            "to_k": sd.dense(f"{bp}.attn.to_k"),
            "to_v": sd.dense(f"{bp}.attn.to_v"),
            "to_out": sd.dense(f"{bp}.attn.to_out.0"),
            "ff1": sd.dense(f"{bp}.ff.ff.0.0"),
            "ff2": sd.dense(f"{bp}.ff.ff.2"),
        }
    return out


def s2v3_params_from_torch(state_dict: dict, cfg) -> dict:
    """Reference SynthesizerTrnV3 state_dict -> models/v3.py flax params."""
    sd = _SD(state_dict)
    n_layers = cfg.n_layers
    params: dict[str, Any] = {
        "enc_p": {
            "ssl_proj": {"Conv_0": sd.conv("enc_p.ssl_proj")},
            "encoder_ssl": _map_relpos_encoder(sd, "enc_p.encoder_ssl", n_layers // 2),
            "text_embedding": sd.embed("enc_p.text_embedding"),
            "encoder_text": _map_relpos_encoder(sd, "enc_p.encoder_text", n_layers),
            "mrte": _map_mrte(sd, "enc_p.mrte"),
            "encoder2": _map_relpos_encoder(sd, "enc_p.encoder2", n_layers // 2),
            "proj": {"Conv_0": sd.conv("enc_p.proj")},
        },
        "ref_enc": _map_style_encoder(sd, "ref_enc"),
        "ssl_proj": sd.conv("ssl_proj"),
        "quantizer": {"embed": jnp.asarray(sd.get("quantizer.vq.layers.0._codebook.embed"))},
        "bridge": {"Conv_0": sd.conv("bridge.0")},
        "wns1": {
            "pre": {"Conv_0": sd.conv("wns1.pre")},
            "enc": _map_wn(sd, "wns1.enc", 8, has_cond=True),
            "proj": {"Conv_0": sd.conv("wns1.proj")},
        },
        "cfm": {"estimator": _map_dit(sd, "cfm.estimator", cfg.cfm_dit_depth)},
    }
    return {"params": params}


def d_params_from_torch(state_dict: dict, periods=(2, 3, 5, 7, 11)) -> dict:
    """Reference MultiPeriodDiscriminator state dict (pretrained s2D*.pth)
    -> models/discriminators.py flax params. v2Pro passes periods + (17, 23)
    (models.py:596-599)."""
    sd = _SD({k.removeprefix("module."): v for k, v in state_dict.items()})

    def conv2d(prefix):
        w = sd.folded(prefix)  # torch Conv2d (out, in, kh, kw)
        out = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
        if f"{prefix}.bias" in sd:
            out["bias"] = jnp.asarray(sd.get(f"{prefix}.bias"))
        return out

    params: dict[str, Any] = {"disc_s": {}}
    for i in range(6):
        params["disc_s"][f"conv_{i}"] = sd.conv(f"discriminators.0.convs.{i}")
    params["disc_s"]["conv_post"] = sd.conv("discriminators.0.conv_post")
    for di, p in enumerate(periods, start=1):
        node = {f"conv_{i}": conv2d(f"discriminators.{di}.convs.{i}") for i in range(5)}
        node["conv_post"] = conv2d(f"discriminators.{di}.conv_post")
        params[f"disc_p{p}"] = node
    return {"params": params}


def merge_lora_state_dict(lora_sd: dict, base_sd: dict) -> dict:
    """Merge a reference v3/v4 LoRA distribution ckpt onto the pretrained
    base state_dict -> plain SynthesizerTrnV3 state_dict.

    Mirrors TTS.py:552-572: load base, wrap cfm with peft
    (target to_q/to_k/to_v/to_out.0, lora_alpha == r so scale == 1), load
    the LoRA ckpt non-strictly, merge_and_unload. peft key forms handled:
    `cfm.base_model.model.<p>.base_layer.weight` (base weight override),
    `<p>.lora_A[.default].weight` / `<p>.lora_B[.default].weight` (delta
    W += B @ A)."""
    out = dict(base_sd)
    deltas: dict[str, dict] = {}
    for k, v in lora_sd.items():
        plain = k.replace("base_model.model.", "").replace(".base_layer.", ".")
        if ".lora_A." in k or ".lora_B." in k:
            which = "A" if ".lora_A." in k else "B"
            tgt = plain.split(f".lora_{which}.")[0] + ".weight"
            deltas.setdefault(tgt, {})[which] = _np(v)
            continue
        out[plain] = v  # non-frozen base params saved in the lora ckpt
    for tgt, ab in deltas.items():
        if "A" not in ab or "B" not in ab:
            raise ValueError(f"incomplete LoRA pair for {tgt}")
        if tgt not in out:
            raise KeyError(f"LoRA target {tgt} missing from base state_dict")
        out[tgt] = _np(out[tgt]) + ab["B"].astype(np.float32) @ ab["A"].astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# Inverse mapping: flax params -> reference torch state dict
# ---------------------------------------------------------------------------


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def _inv_conv(node, prefix, out, *, weight_norm=False):
    """flax Conv {kernel (k,in,out)} -> torch Conv1d weight (out,in,k)."""
    k = node["Conv_0"] if "Conv_0" in node else node
    w = np.asarray(k["kernel"]).transpose(2, 1, 0)
    if weight_norm:
        # synthesize weight_g/weight_v such that g*v/||v|| == w exactly
        axes = tuple(range(1, w.ndim))
        g = np.sqrt((w**2).sum(axis=axes, keepdims=True))
        out[f"{prefix}.weight_g"] = _t(g)
        out[f"{prefix}.weight_v"] = _t(w)
    else:
        out[f"{prefix}.weight"] = _t(w)
    if "bias" in k:
        out[f"{prefix}.bias"] = _t(k["bias"])


def _inv_dense(node, prefix, out):
    out[f"{prefix}.weight"] = _t(np.asarray(node["kernel"]).T)
    if "bias" in node:
        out[f"{prefix}.bias"] = _t(node["bias"])


def _inv_dense_as_conv1x1(node, prefix, out):
    out[f"{prefix}.weight"] = _t(np.asarray(node["kernel"]).T[:, :, None])
    if "bias" in node:
        out[f"{prefix}.bias"] = _t(node["bias"])


def _inv_ln(node, prefix, out, gamma="gamma", beta="beta"):
    out[f"{prefix}.{gamma}"] = _t(node["scale"])
    out[f"{prefix}.{beta}"] = _t(node["bias"])


def _inv_relpos_encoder(node, pre, n_layers, out):
    for i in range(n_layers):
        a = node[f"attn_{i}"]
        for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
            _inv_dense_as_conv1x1(a[nm], f"{pre}.attn_layers.{i}.{nm}", out)
        out[f"{pre}.attn_layers.{i}.emb_rel_k"] = _t(a["emb_rel_k"])
        out[f"{pre}.attn_layers.{i}.emb_rel_v"] = _t(a["emb_rel_v"])
        _inv_ln(node[f"norm1_{i}"], f"{pre}.norm_layers_1.{i}", out)
        _inv_ln(node[f"norm2_{i}"], f"{pre}.norm_layers_2.{i}", out)
        _inv_conv(node[f"ffn_{i}"]["conv1"], f"{pre}.ffn_layers.{i}.conv_1", out)
        _inv_conv(node[f"ffn_{i}"]["conv2"], f"{pre}.ffn_layers.{i}.conv_2", out)


def _inv_wn(node, pre, n_layers, out):
    if "cond_layer" in node:
        _inv_conv(node["cond_layer"], f"{pre}.cond_layer", out, weight_norm=True)
    for i in range(n_layers):
        _inv_conv(node[f"in_{i}"], f"{pre}.in_layers.{i}", out, weight_norm=True)
        _inv_conv(node[f"res_skip_{i}"], f"{pre}.res_skip_layers.{i}", out, weight_norm=True)


def _inv_enc_p(enc_p, n_layers, out):
    _inv_conv(enc_p["ssl_proj"], "enc_p.ssl_proj", out)
    _inv_relpos_encoder(enc_p["encoder_ssl"], "enc_p.encoder_ssl", n_layers // 2, out)
    out["enc_p.text_embedding.weight"] = _t(enc_p["text_embedding"]["embedding"])
    _inv_relpos_encoder(enc_p["encoder_text"], "enc_p.encoder_text", n_layers, out)
    m = enc_p["mrte"]
    for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
        _inv_dense_as_conv1x1(m["cross_attention"][nm], f"enc_p.mrte.cross_attention.{nm}", out)
    _inv_conv(m["c_pre"], "enc_p.mrte.c_pre", out)
    _inv_conv(m["text_pre"], "enc_p.mrte.text_pre", out)
    _inv_conv(m["c_post"], "enc_p.mrte.c_post", out)
    _inv_relpos_encoder(enc_p["encoder2"], "enc_p.encoder2", n_layers // 2, out)
    _inv_conv(enc_p["proj"], "enc_p.proj", out)


def _inv_style_encoder(ref, out):
    _inv_dense(ref["spectral1"], "ref_enc.spectral.0.fc", out)
    _inv_dense(ref["spectral2"], "ref_enc.spectral.3.fc", out)
    _inv_conv(ref["temporal1"]["conv1"], "ref_enc.temporal.0.conv1.conv", out)
    _inv_conv(ref["temporal2"]["conv1"], "ref_enc.temporal.1.conv1.conv", out)
    for nm in ("w_qs", "w_ks", "w_vs", "fc"):
        _inv_dense(ref["slf_attn"][nm], f"ref_enc.slf_attn.{nm}", out)
    _inv_dense(ref["fc"], "ref_enc.fc.fc", out)


def s2_params_to_torch(params: dict, cfg) -> dict:
    """Inverse of s2_params_from_torch: emit a reference-named state dict
    (weight-norm pairs synthesized) that the PyTorch SynthesizerTrn loads
    via load_state_dict to reproduce these weights exactly."""
    p = params["params"]
    out: dict[str, Any] = {}
    n_layers = cfg.n_layers
    _inv_enc_p(p["enc_p"], n_layers, out)

    dec = p["dec"]
    _inv_conv(dec["conv_pre"], "dec.conv_pre", out)
    if "cond" in dec:
        _inv_conv(dec["cond"], "dec.cond", out)
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        w = np.asarray(dec[f"up_{i}"]["kernel"]).transpose(1, 2, 0)  # (k,in,out)->(in,out,k)
        axes = (1, 2)
        g = np.sqrt((w**2).sum(axis=axes, keepdims=True))
        out[f"dec.ups.{i}.weight_g"] = _t(g)
        out[f"dec.ups.{i}.weight_v"] = _t(w)
        if "bias" in dec[f"up_{i}"]:
            out[f"dec.ups.{i}.bias"] = _t(dec[f"up_{i}"]["bias"])
        for j in range(n_k):
            rb = dec[f"resblock_{i}_{j}"]
            for d in range(len(cfg.resblock_dilation_sizes[j])):
                _inv_conv(rb[f"c1_{d}"], f"dec.resblocks.{i * n_k + j}.convs1.{d}", out, weight_norm=True)
                _inv_conv(rb[f"c2_{d}"], f"dec.resblocks.{i * n_k + j}.convs2.{d}", out, weight_norm=True)
    _inv_conv(dec["conv_post"], "dec.conv_post", out)

    for i in range(4):
        fl = p["flow"][f"flow_{i}"]
        _inv_conv(fl["pre"], f"flow.flows.{i * 2}.pre", out)
        _inv_wn(fl["enc"], f"flow.flows.{i * 2}.enc", 4, out)
        _inv_conv(fl["post"], f"flow.flows.{i * 2}.post", out)

    _inv_style_encoder(p["ref_enc"], out)

    _inv_conv(p["ssl_proj"], "ssl_proj", out)
    out["quantizer.vq.layers.0._codebook.embed"] = _t(p["quantizer"]["embed"])

    if "enc_q" in p:
        _inv_conv(p["enc_q"]["pre"], "enc_q.pre", out)
        _inv_wn(p["enc_q"]["enc"], "enc_q.enc", 16, out)
        _inv_conv(p["enc_q"]["proj"], "enc_q.proj", out)
    if cfg.is_pro:
        _inv_dense(p["sv_emb"], "sv_emb", out)
        _inv_dense(p["ge_to512"], "ge_to512", out)
        out["prelu.weight"] = _t(p["prelu_alpha"])
    return out


def _inv_dit(node, pre, depth, out, conv_layers: int = 4):
    """Inverse of _map_dit: models/dit.py params -> f5_tts DiT state dict."""
    for which in ("time_embed", "d_embed"):
        _inv_dense(node[which]["mlp1"], f"{pre}.{which}.time_mlp.0", out)
        _inv_dense(node[which]["mlp2"], f"{pre}.{which}.time_mlp.2", out)
    for i in range(conv_layers):
        tb = node["text_embed"][f"block_{i}"]
        tp = f"{pre}.text_embed.text_blocks.{i}"
        _inv_conv(tb["dwconv"], f"{tp}.dwconv", out)
        _inv_ln(tb["norm"], f"{tp}.norm", out, gamma="weight", beta="bias")
        _inv_dense(tb["pwconv1"], f"{tp}.pwconv1", out)
        _inv_dense(tb["pwconv2"], f"{tp}.pwconv2", out)
        out[f"{tp}.grn.gamma"] = _t(tb["grn"]["gamma"])
        out[f"{tp}.grn.beta"] = _t(tb["grn"]["beta"])
    _inv_dense(node["input_embed"]["proj"], f"{pre}.input_embed.proj", out)
    _inv_conv(node["input_embed"]["conv_pos_embed"]["conv1"], f"{pre}.input_embed.conv_pos_embed.conv1d.0", out)
    _inv_conv(node["input_embed"]["conv_pos_embed"]["conv2"], f"{pre}.input_embed.conv_pos_embed.conv1d.2", out)
    _inv_dense(node["norm_out_linear"], f"{pre}.norm_out.linear", out)
    _inv_dense(node["proj_out"], f"{pre}.proj_out", out)
    for i in range(depth):
        b = node[f"block_{i}"]
        bp = f"{pre}.transformer_blocks.{i}"
        _inv_dense(b["ada_linear"], f"{bp}.attn_norm.linear", out)
        for nm in ("to_q", "to_k", "to_v"):
            _inv_dense(b[nm], f"{bp}.attn.{nm}", out)
        _inv_dense(b["to_out"], f"{bp}.attn.to_out.0", out)
        _inv_dense(b["ff1"], f"{bp}.ff.ff.0.0", out)
        _inv_dense(b["ff2"], f"{bp}.ff.ff.2", out)


def s2v3_params_to_torch(params: dict, cfg) -> dict:
    """Inverse of s2v3_params_from_torch: reference SynthesizerTrnV3 state
    dict — v3/v4 fine-tunes exported here load in the PyTorch project."""
    p = params["params"]
    out: dict[str, Any] = {}
    _inv_enc_p(p["enc_p"], cfg.n_layers, out)
    _inv_style_encoder(p["ref_enc"], out)
    _inv_conv(p["ssl_proj"], "ssl_proj", out)
    out["quantizer.vq.layers.0._codebook.embed"] = _t(p["quantizer"]["embed"])
    _inv_conv(p["bridge"], "bridge.0", out)
    _inv_conv(p["wns1"]["pre"], "wns1.pre", out)
    _inv_wn(p["wns1"]["enc"], "wns1.enc", 8, out)
    _inv_conv(p["wns1"]["proj"], "wns1.proj", out)
    _inv_dit(p["cfm"]["estimator"], "cfm.estimator", cfg.cfm_dit_depth, out)
    return out


def s1_params_to_torch(params: dict, cfg) -> dict:
    """Inverse of s1_params_from_torch (no weight norm in S1)."""
    p = params["params"]
    out: dict[str, Any] = {
        "ar_text_embedding.word_embeddings.weight": _t(p["text_embedding"]["embedding"]),
        "ar_audio_embedding.word_embeddings.weight": _t(p["audio_embedding"]["embedding"]),
        "ar_text_position.alpha": _t(np.asarray(p["alpha_text"]).reshape(())),
        "ar_audio_position.alpha": _t(np.asarray(p["alpha_audio"]).reshape(())),
        "ar_predict_layer.weight": _t(np.asarray(p["predict"]["kernel"]).T),
    }
    _inv_dense(p["bert_proj"], "bert_proj", out)
    for i in range(cfg.num_layers):
        pre = f"h.layers.{i}"
        out[f"{pre}.self_attn.in_proj_weight"] = _t(np.asarray(p[f"layer_{i}"]["wqkv"]["kernel"]).T)
        out[f"{pre}.self_attn.in_proj_bias"] = _t(p[f"layer_{i}"]["wqkv"]["bias"])
        _inv_dense(p[f"layer_{i}"]["wo"], f"{pre}.self_attn.out_proj", out)
        _inv_dense(p[f"layer_{i}"]["fc1"], f"{pre}.linear1", out)
        _inv_dense(p[f"layer_{i}"]["fc2"], f"{pre}.linear2", out)
        _inv_ln(p[f"layer_{i}"]["norm1"], f"{pre}.norm1", out, gamma="weight", beta="bias")
        _inv_ln(p[f"layer_{i}"]["norm2"], f"{pre}.norm2", out, gamma="weight", beta="bias")
    return out


def save_reference_pth(state_dict: dict, path: str, *, model_version: str = "v2", config=None, info: str = "") -> str:
    """Write a reference-format distribution ckpt ({weight, config, info},
    fp16, version-byte header for Pro/v3/v4 — process_ckpt.savee/my_save2)."""
    import io as _io

    import torch

    opt = {"weight": {k: v.half() for k, v in state_dict.items()}, "config": config or {}, "info": info}
    version_bytes = {"v3": b"03", "v4": b"04", "v2Pro": b"05", "v2ProPlus": b"06"}.get(model_version)
    if version_bytes is None:
        torch.save(opt, path)
    else:
        bio = _io.BytesIO()
        torch.save(opt, bio)
        data = version_bytes + bio.getvalue()[2:]
        with open(path, "wb") as f:
            f.write(data)
    return path


# ---------------------------------------------------------------------------
# S1 Text2SemanticDecoder mapping
# ---------------------------------------------------------------------------


def s1_params_from_torch(state_dict: dict, cfg) -> dict:
    """Reference T2S ckpt weights -> T2SDecoder flax params.

    Accepts keys with or without the lightning 'model.' prefix."""
    sd = _SD({k.removeprefix("model."): v for k, v in state_dict.items()})
    p: dict[str, Any] = {
        "text_embedding": sd.embed("ar_text_embedding.word_embeddings"),
        "audio_embedding": sd.embed("ar_audio_embedding.word_embeddings"),
        "bert_proj": sd.dense("bert_proj"),
        "alpha_text": jnp.asarray(sd.get("ar_text_position.alpha")).reshape(1),
        "alpha_audio": jnp.asarray(sd.get("ar_audio_position.alpha")).reshape(1),
        "predict": {"kernel": jnp.asarray(sd.get("ar_predict_layer.weight").T)},
    }
    for i in range(cfg.num_layers):
        pre = f"h.layers.{i}"
        p[f"layer_{i}"] = {
            "wqkv": {
                "kernel": jnp.asarray(sd.get(f"{pre}.self_attn.in_proj_weight").T),
                "bias": jnp.asarray(sd.get(f"{pre}.self_attn.in_proj_bias")),
            },
            "wo": sd.dense(f"{pre}.self_attn.out_proj"),
            "fc1": sd.dense(f"{pre}.linear1"),
            "fc2": sd.dense(f"{pre}.linear2"),
            "norm1": sd.ln(f"{pre}.norm1", gamma="weight", beta="bias"),
            "norm2": sd.ln(f"{pre}.norm2", gamma="weight", beta="bias"),
        }
    return {"params": p}
