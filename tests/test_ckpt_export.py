"""Inverse checkpoint mapping: our params -> reference torch state dict ->
back through the forward mapping must reproduce the params exactly. Plus
container-format roundtrip (version-byte header)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gpt_sovits_tpu.models.t2s import T2SDecoder
from gpt_sovits_tpu.models.vits import SynthesizerTrn
from gpt_sovits_tpu.utils.checkpoint_compat import (
    load_torch_checkpoint,
    s1_params_from_torch,
    s1_params_to_torch,
    s2_params_from_torch,
    s2_params_to_torch,
    save_reference_pth,
    sniff_sovits_version,
)

from test_t2s import TINY as S1_TINY
from test_vits import TINY as S2_TINY


def _trees_equal(a, b, atol=1e-6):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    lb = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(b)}
    for k, v in la:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(lb[ks]), atol=atol, err_msg=ks)


def test_s2_inverse_roundtrip():
    model = SynthesizerTrn(S2_TINY)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "slice": jax.random.PRNGKey(2)},
        jnp.zeros((1, 24, S2_TINY.ssl_dim)), jnp.zeros((1, 24, S2_TINY.spec_channels)),
        jnp.asarray([24]), jnp.zeros((1, 5), jnp.int32), jnp.asarray([5]),
        method=SynthesizerTrn.init_all,
    )
    sd = s2_params_to_torch(params, S2_TINY)
    # weight-norm pairs present where the reference weight-norms
    assert any(k.endswith("weight_g") for k in sd)
    back = s2_params_from_torch(sd, S2_TINY)
    _trees_equal(back, params)


def test_s1_inverse_roundtrip():
    model = T2SDecoder(S1_TINY)
    params = model.init(jax.random.PRNGKey(0), method=T2SDecoder.init_all)
    sd = s1_params_to_torch(params, S1_TINY)
    back = s1_params_from_torch(sd, S1_TINY)
    # positional tables are non-params; compare param leaves only
    _trees_equal(back, params)


def test_reference_container_roundtrip(tmp_path):
    sd = {"x.weight": torch.ones(3, 2)}
    for version, sniffed in [("v2Pro", "v2Pro"), ("v4", "v4")]:
        p = str(tmp_path / f"m_{version}.pth")
        save_reference_pth(sd, p, model_version=version, config={"v": version}, info="1epoch")
        assert sniff_sovits_version(p)[1] == sniffed
        ckpt = load_torch_checkpoint(p)
        assert ckpt["info"] == "1epoch"
        np.testing.assert_array_equal(ckpt["weight"]["x.weight"].float().numpy(), np.ones((3, 2)))


def test_merge_lora_state_dict():
    """Reference v3/v4 LoRA export merged onto the pretrained base
    (TTS.py:552-572 peft merge_and_unload equivalence)."""
    import numpy as np

    from gpt_sovits_tpu.utils.checkpoint_compat import merge_lora_state_dict

    rng = np.random.default_rng(0)
    W = rng.standard_normal((8, 8)).astype(np.float32)
    O = rng.standard_normal((4,)).astype(np.float32)
    A = rng.standard_normal((2, 8)).astype(np.float32)  # (r, in)
    B = rng.standard_normal((8, 2)).astype(np.float32)  # (out, r)
    W2 = rng.standard_normal((8, 8)).astype(np.float32)
    O2 = rng.standard_normal((4,)).astype(np.float32)
    base = {"cfm.estimator.blk.attn.to_q.weight": W, "other.weight": O}
    lora = {
        "cfm.base_model.model.estimator.blk.attn.to_q.base_layer.weight": W2,
        "cfm.base_model.model.estimator.blk.attn.to_q.lora_A.default.weight": A,
        "cfm.base_model.model.estimator.blk.attn.to_q.lora_B.default.weight": B,
        "other.weight": O2,
    }
    out = merge_lora_state_dict(lora, base)
    np.testing.assert_allclose(out["cfm.estimator.blk.attn.to_q.weight"], W2 + B @ A, rtol=1e-6)
    np.testing.assert_array_equal(out["other.weight"], O2)
    # old peft naming (no .default) also accepted
    lora_old = {
        "cfm.base_model.model.estimator.blk.attn.to_q.lora_A.weight": A,
        "cfm.base_model.model.estimator.blk.attn.to_q.lora_B.weight": B,
    }
    out2 = merge_lora_state_dict(lora_old, base)
    np.testing.assert_allclose(out2["cfm.estimator.blk.attn.to_q.weight"], W + B @ A, rtol=1e-6)
    # incomplete pair -> error
    try:
        merge_lora_state_dict({"x.lora_A.weight": A}, {"x.weight": W})
        raise AssertionError("expected ValueError")
    except (ValueError, KeyError):
        pass


def test_s2v3_inverse_roundtrip():
    """v3 CFM synthesizer: flax -> reference state dict -> flax is exact."""
    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3
    from gpt_sovits_tpu.utils.checkpoint_compat import s2v3_params_from_torch, s2v3_params_to_torch

    import sys as _sys
    _sys.path.insert(0, "tests")
    from test_v3 import V3_TINY

    model = SynthesizerTrnV3(V3_TINY)
    import jax as _jax
    import jax.numpy as _jnp

    b, ts, tspec, tt, tmel = 1, 24, 24, 6, 45
    params = model.init(
        {"params": _jax.random.PRNGKey(0), "noise": _jax.random.PRNGKey(1)},
        _jnp.zeros((b, ts, V3_TINY.ssl_dim)), _jnp.zeros((b, tspec, V3_TINY.spec_channels)),
        _jnp.asarray([tspec]), _jnp.zeros((b, tmel, V3_TINY.cfm_mel_channels)), _jnp.asarray([tmel]),
        _jnp.zeros((b, tt), _jnp.int32), _jnp.asarray([tt]),
        method=SynthesizerTrnV3.init_all,
    )
    sd = s2v3_params_to_torch(params, V3_TINY)
    back = s2v3_params_from_torch(sd, V3_TINY)
    _trees_equal(back, params)
