"""utils/onnx_lite.py: wire-format round-trip + op semantics vs torch."""

import numpy as np
import torch
import torch.nn.functional as F

from gpt_sovits_tpu.utils.onnx_lite import Graph, Node, OnnxModel, encode_model, parse_model


def _run(graph: Graph, feeds: dict):
    data = encode_model(graph)
    model = OnnxModel(data)
    return [np.asarray(o) for o in model.run(feeds)]


def test_roundtrip_graph():
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    g = Graph(
        nodes=[Node("MatMul", ["x", "w"], ["y"], {}), Node("Relu", ["y"], ["out"], {})],
        initializers={"w": w},
        inputs=["x"],
        outputs=["out"],
    )
    g2 = parse_model(encode_model(g))
    assert [n.op_type for n in g2.nodes] == ["MatMul", "Relu"]
    np.testing.assert_array_equal(g2.initializers["w"], w)
    assert g2.inputs == ["x"] and g2.outputs == ["out"]

    x = np.random.default_rng(0).standard_normal((2, 3)).astype(np.float32)
    (out,) = _run(g, {"x": x})
    np.testing.assert_allclose(out, np.maximum(x @ w, 0), rtol=1e-6)


def test_conv_stack_vs_torch():
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(2, 4, 3, stride=2, padding=1)
    bn = torch.nn.BatchNorm2d(4)
    bn.running_mean.data.uniform_(-0.2, 0.2)
    bn.running_var.data.uniform_(0.5, 1.5)
    bn.eval()
    convt = torch.nn.ConvTranspose2d(4, 3, 4, stride=2, padding=1)

    x = torch.randn(1, 2, 12, 16)
    with torch.no_grad():
        want = convt(F.relu(bn(conv(x))))
        want = F.avg_pool2d(want, 2, 2)

    g = Graph(
        nodes=[
            Node("Conv", ["x", "cw", "cb"], ["h1"], {"strides": [2, 2], "pads": [1, 1, 1, 1]}),
            Node("BatchNormalization", ["h1", "bns", "bnb", "bnm", "bnv"], ["h2"], {"epsilon": 1e-5}),
            Node("Relu", ["h2"], ["h3"], {}),
            Node("ConvTranspose", ["h3", "tw", "tb"], ["h4"], {"strides": [2, 2], "pads": [1, 1, 1, 1]}),
            Node("AveragePool", ["h4"], ["out"], {"kernel_shape": [2, 2], "strides": [2, 2]}),
        ],
        initializers={
            "cw": conv.weight.detach().numpy(),
            "cb": conv.bias.detach().numpy(),
            "bns": bn.weight.detach().numpy(),
            "bnb": bn.bias.detach().numpy(),
            "bnm": bn.running_mean.numpy(),
            "bnv": bn.running_var.numpy(),
            "tw": convt.weight.detach().numpy(),
            "tb": convt.bias.detach().numpy(),
        },
        inputs=["x"],
        outputs=["out"],
    )
    (out,) = _run(g, {"x": x.numpy()})
    np.testing.assert_allclose(out, want.numpy(), atol=1e-5)


def test_bert_block_vs_torch():
    """Embedding gather + decomposed LayerNorm + attention + erf-GELU."""
    rng = np.random.default_rng(1)
    V, D, T, H = 11, 16, 5, 2
    emb = rng.standard_normal((V, D)).astype(np.float32)
    wq = rng.standard_normal((D, D)).astype(np.float32)
    gamma = rng.standard_normal(D).astype(np.float32)
    beta = rng.standard_normal(D).astype(np.float32)
    ids = rng.integers(0, V, (1, T)).astype(np.int64)

    g = Graph(
        nodes=[
            Node("Gather", ["emb", "ids"], ["e"], {"axis": 0}),
            # decomposed LayerNorm
            Node("ReduceMean", ["e"], ["mu"], {"axes": [-1], "keepdims": 1}),
            Node("Sub", ["e", "mu"], ["c"], {}),
            Node("Pow", ["c", "two"], ["c2"], {}),
            Node("ReduceMean", ["c2"], ["var"], {"axes": [-1], "keepdims": 1}),
            Node("Add", ["var", "eps"], ["ve"], {}),
            Node("Sqrt", ["ve"], ["sd"], {}),
            Node("Div", ["c", "sd"], ["nrm"], {}),
            Node("Mul", ["nrm", "gamma"], ["sg"], {}),
            Node("Add", ["sg", "beta"], ["ln"], {}),
            # single-head self-attention (H folded out for brevity)
            Node("MatMul", ["ln", "wq"], ["q"], {}),
            Node("Transpose", ["ln", ], ["lnT"], {"perm": [0, 2, 1]}),
            Node("MatMul", ["q", "lnT"], ["scores"], {}),
            Node("Softmax", ["scores"], ["attn"], {"axis": -1}),
            Node("MatMul", ["attn", "ln"], ["ctx"], {}),
            # erf-GELU
            Node("Div", ["ctx", "sqrt2"], ["g1"], {}),
            Node("Erf", ["g1"], ["g2"], {}),
            Node("Add", ["g2", "one"], ["g3"], {}),
            Node("Mul", ["ctx", "g3"], ["g4"], {}),
            Node("Mul", ["g4", "half"], ["out"], {}),
        ],
        initializers={
            "emb": emb, "wq": wq, "gamma": gamma, "beta": beta,
            "two": np.float32(2.0), "eps": np.float32(1e-5),
            "sqrt2": np.float32(np.sqrt(2.0)), "one": np.float32(1.0), "half": np.float32(0.5),
        },
        inputs=["ids"],
        outputs=["out"],
    )
    (out,) = _run(g, {"ids": ids})

    e = torch.from_numpy(emb)[torch.from_numpy(ids)]
    ln = F.layer_norm(e, (D,), torch.from_numpy(gamma), torch.from_numpy(beta))
    q = ln @ torch.from_numpy(wq)
    attn = torch.softmax(q @ ln.transpose(1, 2), dim=-1)
    want = F.gelu(attn @ ln, approximate="none")
    np.testing.assert_allclose(out, want.numpy(), atol=1e-5)


def test_shape_slice_misc_ops():
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    g = Graph(
        nodes=[
            Node("Shape", ["x"], ["shp"], {}),
            Node("Slice", ["x", "starts", "ends", "axes", "steps"], ["sl"], {}),
            Node("Unsqueeze", ["sl", "uax"], ["un"], {}),
            Node("Squeeze", ["un", "uax"], ["sq"], {}),
            Node("Concat", ["sq", "sq"], ["cc"], {"axis": 2}),
            Node("Split", ["cc"], ["s1", "s2"], {"axis": 2, "split": [4, 4]}),
            Node("Cast", ["shp"], ["shpf"], {"to": 1}),
            Node("ReduceSum", ["shpf"], ["n"], {"keepdims": 0}),
            Node("Expand", ["n", "eshape"], ["out2"], {}),
        ],
        initializers={
            "starts": np.array([1], np.int64), "ends": np.array([3], np.int64),
            "axes": np.array([1], np.int64), "steps": np.array([1], np.int64),
            "uax": np.array([0], np.int64), "eshape": np.array([2, 2], np.int64),
        },
        inputs=["x"],
        outputs=["s1", "out2"],
    )
    s1, out2 = _run(g, {"x": x})
    np.testing.assert_array_equal(s1, x[:, 1:3, :])
    np.testing.assert_allclose(out2, np.full((2, 2), 9.0))


def test_pool_pad_resize():
    x = np.random.default_rng(3).standard_normal((1, 2, 6, 6)).astype(np.float32)
    g = Graph(
        nodes=[
            Node("Pad", ["x", "pads"], ["p"], {"mode": "reflect"}),
            Node("MaxPool", ["p"], ["m"], {"kernel_shape": [2, 2], "strides": [2, 2]}),
            Node("Resize", ["m", "", "scales"], ["r"], {"mode": "nearest"}),
        ],
        initializers={
            "pads": np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int64),
            "scales": np.array([1, 1, 2, 2], np.float32),
        },
        inputs=["x"],
        outputs=["r"],
    )
    (r,) = _run(g, {"x": x})
    xp = torch.nn.functional.pad(torch.from_numpy(x), (1, 1, 1, 1), mode="reflect")
    m = torch.nn.functional.max_pool2d(xp, 2, 2)
    want = torch.nn.functional.interpolate(m, scale_factor=2, mode="nearest")
    np.testing.assert_allclose(r, want.numpy(), atol=1e-6)
