"""CNHuBERT-style SSL feature encoder, TPU-native.

Counterpart of the reference's CNHubert wrapper
(GPT_SoVITS/feature_extractor/cnhubert.py:22), which wraps HF
`HubertModel` (chinese-hubert-base): 16 kHz mono waveform -> 768-d hidden
states at 50 Hz. Re-implemented in flax (HuBERT-base layout,
do_stable_layer_norm=False / group-norm first conv), with
`params_from_torch` to import the pretrained torch checkpoint.

Architecture (HF transformers HubertModel, config hubert-base):
  * conv feature extractor: 7 layers, 512 ch, kernels (10,3,3,3,3,2,2),
    strides (5,2,2,2,2,2,2), GroupNorm(512) on layer 0, GELU
  * feature projection: LayerNorm -> Dense(512->768)
  * conv positional embedding: Conv1d(768,768,k=128,groups=16) + GELU
  * 12 post-LN transformer layers (12 heads, ffn 3072, GELU)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class HubertConfig:
    conv_dim: int = 512
    conv_kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5


class FeatureExtractor(nn.Module):
    cfg: HubertConfig

    @nn.compact
    def __call__(self, wav):
        """(B, L) -> (B, T, conv_dim); T = L // 320."""
        x = wav[..., None]  # (B, L, 1)
        for i, (k, s) in enumerate(zip(self.cfg.conv_kernels, self.cfg.conv_strides)):
            x = nn.Conv(self.cfg.conv_dim, (k,), strides=(s,), padding="VALID", use_bias=False, name=f"conv_{i}")(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=self.cfg.conv_dim, epsilon=self.cfg.layer_norm_eps, name="group_norm")(x)
            x = nn.gelu(x, approximate=False)
        return x


class EncoderLayer(nn.Module):
    cfg: HubertConfig

    @nn.compact
    def __call__(self, x, pad_mask=None):
        c = self.cfg
        h = c.num_heads
        dk = c.hidden_size // h
        b, t, _ = x.shape
        q = nn.Dense(c.hidden_size, name="q_proj")(x).reshape(b, t, h, dk)
        k = nn.Dense(c.hidden_size, name="k_proj")(x).reshape(b, t, h, dk)
        v = nn.Dense(c.hidden_size, name="v_proj")(x).reshape(b, t, h, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q / np.sqrt(dk), k, preferred_element_type=jnp.float32)
        if pad_mask is not None:
            scores = jnp.where(pad_mask[:, None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, -1)
        attn = nn.Dense(c.hidden_size, name="out_proj")(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x + attn)
        ff = nn.Dense(c.intermediate_size, name="fc1")(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(c.hidden_size, name="fc2")(ff)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x + ff)
        return x


class HubertEncoder(nn.Module):
    cfg: HubertConfig = HubertConfig()

    @nn.compact
    def __call__(self, wav, pad_mask=None):
        """wav: (B, L) 16 kHz float in [-1,1] -> (B, T, 768) @ 50 Hz."""
        c = self.cfg
        x = FeatureExtractor(c, name="feature_extractor")(wav)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(x)
        x = nn.Dense(c.hidden_size, name="fp_projection")(x)
        # conv positional embedding (HF: pad 64 both sides, drop last col for
        # even kernel). groups=16.
        pos = nn.Conv(
            c.hidden_size,
            (c.pos_conv_kernel,),
            padding=[(c.pos_conv_kernel // 2, c.pos_conv_kernel // 2)],
            feature_group_count=c.pos_conv_groups,
            name="pos_conv",
        )(x)
        if c.pos_conv_kernel % 2 == 0:
            pos = pos[:, :-1]
        pos = nn.gelu(pos, approximate=False)
        x = x + pos
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_layer_norm")(x)
        for i in range(c.num_layers):
            x = EncoderLayer(c, name=f"layer_{i}")(x, pad_mask)
        return x


# ---------------------------------------------------------------------------
# Torch checkpoint import (HF HubertModel state_dict)
# ---------------------------------------------------------------------------


def params_from_torch(state_dict: dict, cfg: HubertConfig = HubertConfig()) -> dict:
    """Map an HF `HubertModel.state_dict()` to this module's param tree."""

    def t(name):
        return jnp.asarray(np.asarray(state_dict[name]))

    p: dict[str, Any] = {}
    fe: dict[str, Any] = {}
    for i in range(len(cfg.conv_kernels)):
        w = t(f"feature_extractor.conv_layers.{i}.conv.weight")  # (out,in,k)
        fe[f"conv_{i}"] = {"kernel": jnp.transpose(w, (2, 1, 0))}
    fe["group_norm"] = {
        "scale": t("feature_extractor.conv_layers.0.layer_norm.weight"),
        "bias": t("feature_extractor.conv_layers.0.layer_norm.bias"),
    }
    p["feature_extractor"] = fe
    p["fp_layer_norm"] = {
        "scale": t("feature_projection.layer_norm.weight"),
        "bias": t("feature_projection.layer_norm.bias"),
    }
    p["fp_projection"] = {
        "kernel": t("feature_projection.projection.weight").T,
        "bias": t("feature_projection.projection.bias"),
    }
    # pos conv is weight-normed in torch: weight = g * v / ||v||
    if "encoder.pos_conv_embed.conv.weight" in state_dict:
        w = t("encoder.pos_conv_embed.conv.weight")
    else:
        g = np.asarray(state_dict["encoder.pos_conv_embed.conv.parametrizations.weight.original0"])
        v = np.asarray(state_dict["encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
        norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=None) if False else None
        # torch weight_norm(dim=2) for conv1d: normalize over dims (0,1)
        vn = v / np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        w = jnp.asarray(g * vn)
    # torch conv weight (out, in/groups, k) -> flax (k, in/groups, out)
    p["pos_conv"] = {
        "kernel": jnp.transpose(w, (2, 1, 0)),
        "bias": t("encoder.pos_conv_embed.conv.bias"),
    }
    p["encoder_layer_norm"] = {
        "scale": t("encoder.layer_norm.weight"),
        "bias": t("encoder.layer_norm.bias"),
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "q_proj": {"kernel": t(f"{pre}.attention.q_proj.weight").T, "bias": t(f"{pre}.attention.q_proj.bias")},
            "k_proj": {"kernel": t(f"{pre}.attention.k_proj.weight").T, "bias": t(f"{pre}.attention.k_proj.bias")},
            "v_proj": {"kernel": t(f"{pre}.attention.v_proj.weight").T, "bias": t(f"{pre}.attention.v_proj.bias")},
            "out_proj": {"kernel": t(f"{pre}.attention.out_proj.weight").T, "bias": t(f"{pre}.attention.out_proj.bias")},
            "layer_norm": {"scale": t(f"{pre}.layer_norm.weight"), "bias": t(f"{pre}.layer_norm.bias")},
            "fc1": {"kernel": t(f"{pre}.feed_forward.intermediate_dense.weight").T, "bias": t(f"{pre}.feed_forward.intermediate_dense.bias")},
            "fc2": {"kernel": t(f"{pre}.feed_forward.output_dense.weight").T, "bias": t(f"{pre}.feed_forward.output_dense.bias")},
            "final_layer_norm": {"scale": t(f"{pre}.final_layer_norm.weight"), "bias": t(f"{pre}.final_layer_norm.bias")},
        }
    return {"params": p}
