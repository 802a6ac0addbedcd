"""Parity test: flax HubertEncoder vs HF torch HubertModel, same weights.

This is the "dual-instantiation allclose" harness of the reference's
BigVGAN tests, applied to the SSL encoder.
"""

import numpy as np
import pytest

from gpt_sovits_tpu.models.hubert import HubertConfig, HubertEncoder, params_from_torch

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SMALL = HubertConfig(
    conv_dim=32,
    conv_kernels=(10, 3, 2),
    conv_strides=(5, 2, 2),
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    intermediate_size=128,
    pos_conv_kernel=16,
    pos_conv_groups=4,
)


def _hf_config(c: HubertConfig):
    return transformers.HubertConfig(
        conv_dim=[c.conv_dim] * len(c.conv_kernels),
        conv_kernel=list(c.conv_kernels),
        conv_stride=list(c.conv_strides),
        hidden_size=c.hidden_size,
        num_hidden_layers=c.num_layers,
        num_attention_heads=c.num_heads,
        intermediate_size=c.intermediate_size,
        num_conv_pos_embeddings=c.pos_conv_kernel,
        num_conv_pos_embedding_groups=c.pos_conv_groups,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_act="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )


def test_hubert_matches_hf():
    torch.manual_seed(0)
    hf = transformers.HubertModel(_hf_config(SMALL)).eval()
    wav = np.random.default_rng(0).standard_normal((2, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()

    model = HubertEncoder(SMALL)
    params = params_from_torch(hf.state_dict(), SMALL)
    ours = np.asarray(model.apply(params, wav))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
