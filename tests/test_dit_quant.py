"""int8 serving path for the DiT (QDense + quantize_dit_params).

Accuracy gate for the quantized CFM: the int8 estimator must stay close to
the float one both per-forward and through the full Euler sampler (mel
distance oracle), or serving falls back to bf16.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.models.dit import DiT, DiTConfig, QDense, quantize_dit_params

CFG = DiTConfig(dim=128, depth=2, heads=4, dim_head=32, text_dim=64, conv_layers=2)


def _inputs(key, b=2, t=64):
    x = jax.random.normal(key, (b, t, CFG.mel_dim))
    cond = jnp.zeros_like(x)
    tt = jnp.full((b,), 0.4)
    text = jax.random.normal(jax.random.fold_in(key, 1), (b, t, CFG.text_dim))
    mask = jnp.ones((b, t), bool)
    return x, cond, tt, text, mask


def test_qdense_float_path_matches_dense():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 7, 16))
    import flax.linen as nn

    qd = QDense(24, 16)
    p = qd.init(key, x)
    ref = nn.Dense(24).apply(p, x)
    np.testing.assert_allclose(np.asarray(qd.apply(p, x)), np.asarray(ref), atol=1e-6)


def test_quantize_targets_only_big_matmuls():
    key = jax.random.PRNGKey(0)
    dit = DiT(CFG)
    x, cond, tt, text, mask = _inputs(key)
    p = dit.init(key, x, cond, tt, tt, text, mask)
    pq = quantize_dit_params(p)
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(pq)
    int8_parents = {path[-2] for path, leaf in flat.items() if leaf.dtype == jnp.int8}
    assert int8_parents == {"to_q", "to_k", "to_v", "to_out", "ff1", "ff2"}
    scales = [path for path in flat if path[-1] == "kernel_scale"]
    assert len(scales) == 6 * CFG.depth


def test_int8_forward_close_to_float():
    key = jax.random.PRNGKey(0)
    dit = DiT(CFG)
    x, cond, tt, text, mask = _inputs(key)
    p = dit.init(key, x, cond, tt, tt, text, mask)
    ref = np.asarray(dit.apply(p, x, cond, tt, tt, text, mask)[0])
    ditq = DiT(dataclasses.replace(CFG, quant="int8"))
    got = np.asarray(ditq.apply(quantize_dit_params(p), x, cond, tt, tt, text, mask)[0])
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.02, rel


def test_int8_cfm_mel_distance():
    """Full Euler sampler drift stays small (the serving accuracy gate)."""
    from gpt_sovits_tpu.models.v3 import cfm_inference

    key = jax.random.PRNGKey(1)
    dit = DiT(CFG)
    b, t, t_ref = 1, 48, 16
    x, cond, tt, text, mask = _inputs(key, b, t)
    p = dit.init(key, x, cond, tt, tt, text, mask)
    mu = jax.random.normal(key, (b, t, CFG.text_dim)) * 0.3
    prompt = jax.random.normal(jax.random.fold_in(key, 2), (b, t_ref, CFG.mel_dim)) * 0.2
    lens = jnp.asarray([t])
    mel_f = np.asarray(cfm_inference(dit, p, mu, lens, prompt, key, n_steps=8))
    ditq = DiT(dataclasses.replace(CFG, quant="int8"))
    mel_q = np.asarray(cfm_inference(ditq, quantize_dit_params(p), mu, lens, prompt, key, n_steps=8))
    l1 = np.abs(mel_q - mel_f).mean()
    scale = np.abs(mel_f).mean() + 1e-9
    assert l1 / scale < 0.02, (l1, scale)  # measured ~0.002
