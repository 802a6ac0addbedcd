"""BERT text-feature encoder (chinese-roberta-wwm-ext-large), TPU-native.

The reference extracts phone-level text features from the *third-to-last*
hidden layer of chinese-roberta-wwm-ext-large, repeated per-phone via
word2ph (TTS_infer_pack/TextPreprocessor.py:191-204). This is a standard
post-LN BERT encoder re-implemented in flax with torch weight import.

Output: hidden states of all layers; callers take layer -3 and drop
[CLS]/[SEP], then repeat by word2ph.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 21128
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, pad_mask):
        c = self.cfg
        b, t, _ = x.shape
        h, dk = c.num_heads, c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, name="query")(x).reshape(b, t, h, dk)
        k = nn.Dense(c.hidden_size, name="key")(x).reshape(b, t, h, dk)
        v = nn.Dense(c.hidden_size, name="value")(x).reshape(b, t, h, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q / np.sqrt(dk), k, preferred_element_type=jnp.float32)
        scores = jnp.where(pad_mask[:, None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, -1)
        attn = nn.Dense(c.hidden_size, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_norm")(x + attn)
        ff = nn.gelu(nn.Dense(c.intermediate_size, name="inter")(x), approximate=False)
        ff = nn.Dense(c.hidden_size, name="output")(ff)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="out_norm")(x + ff)


class BertEncoder(nn.Module):
    cfg: BertConfig = BertConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        """-> list of hidden states per layer (len num_layers+1, embeddings
        first), each (B, T, H)."""
        c = self.cfg
        b, t = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, t), dtype=bool)
        else:
            attention_mask = attention_mask.astype(bool)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, t), jnp.int32)
        x = (
            nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
            + nn.Embed(c.max_position_embeddings, c.hidden_size, name="position_embeddings")(
                jnp.broadcast_to(jnp.arange(t), (b, t))
            )
            + nn.Embed(c.type_vocab_size, c.hidden_size, name="token_type_embeddings")(token_type_ids)
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_norm")(x)
        hidden_states = [x]
        for i in range(c.num_layers):
            x = BertLayer(c, name=f"layer_{i}")(x, attention_mask)
            hidden_states.append(x)
        return hidden_states


def params_from_torch(state_dict: dict, cfg: BertConfig = BertConfig()) -> dict:
    """Map an HF `BertModel.state_dict()` to this module's param tree."""

    def t(name):
        return jnp.asarray(np.asarray(state_dict[name]))

    p: dict[str, Any] = {
        "word_embeddings": {"embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": t("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": t("embeddings.token_type_embeddings.weight")},
        "emb_norm": {"scale": t("embeddings.LayerNorm.weight"), "bias": t("embeddings.LayerNorm.bias")},
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "query": {"kernel": t(f"{pre}.attention.self.query.weight").T, "bias": t(f"{pre}.attention.self.query.bias")},
            "key": {"kernel": t(f"{pre}.attention.self.key.weight").T, "bias": t(f"{pre}.attention.self.key.bias")},
            "value": {"kernel": t(f"{pre}.attention.self.value.weight").T, "bias": t(f"{pre}.attention.self.value.bias")},
            "attn_out": {"kernel": t(f"{pre}.attention.output.dense.weight").T, "bias": t(f"{pre}.attention.output.dense.bias")},
            "attn_norm": {"scale": t(f"{pre}.attention.output.LayerNorm.weight"), "bias": t(f"{pre}.attention.output.LayerNorm.bias")},
            "inter": {"kernel": t(f"{pre}.intermediate.dense.weight").T, "bias": t(f"{pre}.intermediate.dense.bias")},
            "output": {"kernel": t(f"{pre}.output.dense.weight").T, "bias": t(f"{pre}.output.dense.bias")},
            "out_norm": {"scale": t(f"{pre}.output.LayerNorm.weight"), "bias": t(f"{pre}.output.LayerNorm.bias")},
        }
    return {"params": p}


def phone_level_features(char_hidden: jnp.ndarray, word2ph: Sequence[int]) -> jnp.ndarray:
    """Repeat char-level features per phone (ref TextPreprocessor.py:196-200).

    char_hidden: (T_char, H); word2ph: phones per char -> (sum(word2ph), H)."""
    return jnp.repeat(char_hidden, np.asarray(word2ph), axis=0, total_repeat_length=int(np.sum(word2ph)))
