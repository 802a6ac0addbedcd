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
