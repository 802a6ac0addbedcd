"""Parity: flax BertEncoder vs HF torch BertModel, same weights."""

import numpy as np
import pytest

from gpt_sovits_tpu.models.bert import BertConfig, BertEncoder, params_from_torch, phone_level_features

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SMALL = BertConfig(
    vocab_size=100,
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
)


def test_bert_matches_hf():
    hf_cfg = transformers.BertConfig(
        vocab_size=SMALL.vocab_size,
        hidden_size=SMALL.hidden_size,
        num_hidden_layers=SMALL.num_layers,
        num_attention_heads=SMALL.num_heads,
        intermediate_size=SMALL.intermediate_size,
        max_position_embeddings=SMALL.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    ids = np.random.default_rng(0).integers(0, 100, (2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[1, 9:] = 0
    with torch.no_grad():
        ref = hf(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask), output_hidden_states=True
        ).hidden_states
    model = BertEncoder(SMALL)
    params = params_from_torch(hf.state_dict(), SMALL)
    ours = model.apply(params, ids, attention_mask=mask)
    assert len(ours) == len(ref)
    # valid positions must match layer-by-layer (padding positions diverge
    # only where HF lets pads attend to pads; masked out downstream)
    for l in (0, 1, SMALL.num_layers):
        np.testing.assert_allclose(
            np.asarray(ours[l])[0], ref[l].numpy()[0], atol=2e-4, rtol=1e-3, err_msg=f"layer {l}"
        )
        np.testing.assert_allclose(
            np.asarray(ours[l])[1, :9], ref[l].numpy()[1, :9], atol=2e-4, rtol=1e-3, err_msg=f"layer {l} masked"
        )


def test_phone_level_features():
    h = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = np.asarray(phone_level_features(h, [2, 1, 3, 2]))
    assert out.shape == (8, 3)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[3], h[2])
