"""Model export for external runtimes.

Counterpart of the reference's export layer (onnx_export.py,
export_torch_script*.py — SURVEY.md §2.6): instead of ONNX/TorchScript, the
TPU-native deployment artifact is a serialized StableHLO module produced by
`jax.export`, loadable from any PJRT runtime (TPU serving stacks, IREE,
XLA-CPU/GPU) without Python model code.

The same graph split as the reference is exposed:
  * S1 encoder/prefill + single decode step (ref t2s encoder/sdec/fsdec)
  * S2 decode (codes + reference -> waveform)
  * vocoder (mel -> waveform) for v3/v4
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def export_fn(fn: Callable, example_args: Sequence[Any]) -> bytes:
    """jit + export + serialize a function at fixed example shapes."""
    exported = jax.export.export(jax.jit(fn))(*example_args)
    return bytes(exported.serialize())


def load_exported(blob: bytes) -> Callable:
    """Deserialize an exported module into a callable."""
    exported = jax.export.deserialize(blob)
    return lambda *args: exported.call(*args)


# ---------------------------------------------------------------------------
# Model-specific exporters
# ---------------------------------------------------------------------------


def export_s2_decode(model, params, *, b=1, tc=256, tt=128, tr=256) -> bytes:
    """SynthesizerTrn.decode at fixed bucket shapes."""
    from gpt_sovits_tpu.models.vits import SynthesizerTrn

    cfg = model.cfg

    def fn(codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths):
        return model.apply(
            params, codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths,
            method=SynthesizerTrn.decode,
        )

    args = (
        jnp.zeros((b, tc), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, tt), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, tr, cfg.spec_channels), jnp.float32),
        jnp.zeros((b,), jnp.int32),
    )
    return export_fn(fn, args)


def export_s1_step(model, params, *, b=1, t_cache=2048) -> bytes:
    """One KV-cached decode step of the S1 transformer."""
    from gpt_sovits_tpu.models.t2s import T2SDecoder

    cfg = model.cfg
    h, dh = cfg.num_heads, cfg.hidden_dim // cfg.num_heads

    def fn(tok_emb, k_caches, v_caches, valid, write_idx):
        return model.apply(params, tok_emb, k_caches, v_caches, valid, write_idx, method=T2SDecoder.decode_step)

    args = (
        jnp.zeros((b, 1, cfg.embedding_dim), jnp.float32),
        jnp.zeros((cfg.num_layers, b, t_cache, h, dh), jnp.float32),
        jnp.zeros((cfg.num_layers, b, t_cache, h, dh), jnp.float32),
        jnp.zeros((b, t_cache), bool),
        jnp.asarray(0, jnp.int32),
    )
    return export_fn(fn, args)


def export_vocoder(model, params, *, b=1, t=512) -> bytes:
    """BigVGAN / Generator: (B, T, mel) -> waveform."""
    mel_dim = getattr(model.cfg, "num_mels", None) or model.cfg.cfm_mel_channels
    args = (jnp.zeros((b, t, mel_dim), jnp.float32),)
    return export_fn(lambda mel: model.apply(params, mel), args)


def export_v3_decode(model, params, *, b=1, tc=256, tt=128, tr=256) -> bytes:
    """SynthesizerTrnV3.decode_encp at fixed bucket shapes (the v3/v4
    front half exported by the reference's export_torch_script_v3v4.py:
    codes + reference -> DiT conditioning fea, ge, mel_len)."""
    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3

    cfg = model.cfg

    def fn(codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths):
        return model.apply(
            params, codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths,
            method=SynthesizerTrnV3.decode_encp,
        )

    args = (
        jnp.zeros((b, tc), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, tt), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, tr, cfg.spec_channels), jnp.float32),
        jnp.zeros((b,), jnp.int32),
    )
    return export_fn(fn, args)


def export_cfm(model, params, *, b=1, t=512, tp=128, n_steps=8) -> bytes:
    """The whole CFM Euler sampling loop (n_steps DiT forwards under one
    lax.scan) as a single module: (fea, x_lens, prompt_mel, seed) -> mel."""
    from gpt_sovits_tpu.models.dit import DiT
    from gpt_sovits_tpu.models.v3 import cfm_inference

    dit = DiT(model.dit_config)
    dit_params = {"params": params["params"]["cfm"]["estimator"]}
    mel_dim = dit.cfg.mel_dim

    def fn(mu, x_lens, prompt, seed):
        return cfm_inference(dit, dit_params, mu, x_lens, prompt,
                             jax.random.PRNGKey(seed), n_steps=n_steps)

    args = (
        jnp.zeros((b, t, dit.cfg.text_dim), jnp.float32),  # decode_encp fea width
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, tp, mel_dim), jnp.float32),
        jnp.asarray(0, jnp.uint32),
    )
    return export_fn(fn, args)
