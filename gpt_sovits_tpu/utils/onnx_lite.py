"""Dependency-free ONNX loader + JAX executor (+ minimal writer).

The reference distributes two inference artifacts as ONNX graphs executed
with onnxruntime: the MDX-Net vocal separator (tools/uvr5/mdxnet.py:80)
and the g2pW polyphone-disambiguation BERT (GPT_SoVITS/text/g2pw/
onnx_api.py:82).  Neither `onnx` nor `onnxruntime` is a dependency of
this framework; instead this module speaks the protobuf wire format
directly and executes the graph with jax.numpy, so those model files load
onto TPU with zero extra packages.

Scope: the op set used by conv/U-Net style audio models and BERT-style
encoders (see _OPS).  Execution is eager op-by-op; `OnnxModel.run` can be
wrapped in `jax.jit` as long as the graph has no data-dependent shapes —
shape-producing ops (Shape/Size) read static trace-time shapes.

The writer emits just enough of ModelProto to round-trip graphs for tests
and to export our own small models to ONNX consumers.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value += 1 << 64  # two's complement, 64-bit
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = bytes(buf[pos : pos + 8])
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = bytes(buf[pos : pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


def _packed_varints(v, wt) -> list[int]:
    if wt == 0:
        return [v]
    out = []
    pos = 0
    mv = memoryview(v)
    while pos < len(mv):
        x, pos = _read_varint(mv, pos)
        out.append(x)
    return out


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# ONNX message subset
# ---------------------------------------------------------------------------

# TensorProto.DataType -> numpy
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _parse_tensor(buf: memoryview) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype = 1
    name = ""
    raw = b""
    f32: list[float] = []
    i32: list[int] = []
    i64: list[int] = []
    f64: list[float] = []
    for fnum, wt, v in _fields(buf):
        if fnum == 1:
            dims += [_signed(x) for x in _packed_varints(v, wt)]
        elif fnum == 2:
            dtype = v
        elif fnum == 4:
            f32 += list(np.frombuffer(v, "<f4")) if wt == 2 else [struct.unpack("<f", v)[0]]
        elif fnum == 5:
            i32 += _packed_varints(v, wt)
        elif fnum == 7:
            i64 += [_signed(x) for x in _packed_varints(v, wt)]
        elif fnum == 8:
            name = bytes(v).decode()
        elif fnum == 9:
            raw = bytes(v)
        elif fnum == 10:
            f64 += list(np.frombuffer(v, "<f8")) if wt == 2 else [struct.unpack("<d", v)[0]]
    np_dtype = _DTYPES.get(dtype, np.float32)
    if raw:
        arr = np.frombuffer(raw, np_dtype)
    elif f32:
        arr = np.asarray(f32, np.float32)
    elif f64:
        arr = np.asarray(f64, np.float64)
    elif i64:
        arr = np.asarray(i64, np.int64)
    elif i32:
        arr = np.asarray(i32, np_dtype if np_dtype in (np.int32, np.int8, np.uint8, np.int16, np.uint16, np.bool_) else np.int32)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.astype(np_dtype, copy=False).reshape(dims if dims else ())


@dataclass
class Attr:
    name: str
    value: Any


def _parse_attr(buf: memoryview) -> Attr:
    name = ""
    val: Any = None
    floats: list[float] = []
    ints: list[int] = []
    strings: list[bytes] = []
    for fnum, wt, v in _fields(buf):
        if fnum == 1:
            name = bytes(v).decode()
        elif fnum == 2:
            val = struct.unpack("<f", v)[0]
        elif fnum == 3:
            val = _signed(v)
        elif fnum == 4:
            val = bytes(v)
        elif fnum == 5:
            val = _parse_tensor(v)[1]
        elif fnum == 7:
            floats += list(np.frombuffer(v, "<f4")) if wt == 2 else [struct.unpack("<f", v)[0]]
        elif fnum == 8:
            ints += [_signed(x) for x in _packed_varints(v, wt)]
        elif fnum == 9:
            strings.append(bytes(v))
    if floats:
        val = floats
    elif ints:
        val = ints
    elif strings:
        val = strings
    return Attr(name, val)


@dataclass
class Node:
    op_type: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict[str, Any]
    name: str = ""


@dataclass
class Graph:
    nodes: list[Node] = field(default_factory=list)
    initializers: dict[str, np.ndarray] = field(default_factory=dict)
    inputs: list[str] = field(default_factory=list)
    outputs: list[str] = field(default_factory=list)
    name: str = "graph"
    # name -> (numpy dtype, shape) for graph inputs/outputs; the ONNX IR spec
    # requires TypeProto on graph I/O (onnxruntime refuses models without it)
    io_types: dict = field(default_factory=dict)


def _parse_node(buf: memoryview) -> Node:
    n = Node("", [], [], {})
    for fnum, wt, v in _fields(buf):
        if fnum == 1:
            n.inputs.append(bytes(v).decode())
        elif fnum == 2:
            n.outputs.append(bytes(v).decode())
        elif fnum == 3:
            n.name = bytes(v).decode()
        elif fnum == 4:
            n.op_type = bytes(v).decode()
        elif fnum == 5:
            a = _parse_attr(v)
            n.attrs[a.name] = a.value
    return n


def _parse_value_info(buf: memoryview) -> tuple[str, Optional[tuple]]:
    """ValueInfoProto -> (name, (np dtype, shape) or None)."""
    name = ""
    ty = None
    for fnum, wt, v in _fields(buf):
        if fnum == 1:
            name = bytes(v).decode()
        elif fnum == 2:  # TypeProto
            for f2, _, v2 in _fields(v):
                if f2 != 1:  # tensor_type
                    continue
                elem, dims = None, []
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        elem = v3
                    elif f3 == 2:  # TensorShapeProto
                        for f4, _, v4 in _fields(v3):
                            if f4 == 1:  # Dimension
                                dim = -1
                                for f5, _, v5 in _fields(v4):
                                    if f5 == 1:
                                        dim = _signed(v5)
                                dims.append(dim)
                if elem in _DTYPES:
                    ty = (np.dtype(_DTYPES[elem]), tuple(dims))
    return name, ty


def _parse_graph(buf: memoryview) -> Graph:
    g = Graph()
    for fnum, wt, v in _fields(buf):
        if fnum == 1:
            g.nodes.append(_parse_node(v))
        elif fnum == 2:
            g.name = bytes(v).decode()
        elif fnum == 5:
            name, arr = _parse_tensor(v)
            g.initializers[name] = arr
        elif fnum == 11:
            name, ty = _parse_value_info(v)
            g.inputs.append(name)
            if ty is not None:
                g.io_types[name] = ty
        elif fnum == 12:
            name, ty = _parse_value_info(v)
            g.outputs.append(name)
            if ty is not None:
                g.io_types[name] = ty
    g.inputs = [i for i in g.inputs if i not in g.initializers]
    return g


def parse_model(data: bytes) -> Graph:
    mv = memoryview(data)
    for fnum, wt, v in _fields(mv):
        if fnum == 7:
            return _parse_graph(v)
    raise ValueError("no graph in ONNX model")


# ---------------------------------------------------------------------------
# writer (subset: enough to round-trip Graph)
# ---------------------------------------------------------------------------


def _tag(out: bytearray, fnum: int, wt: int) -> None:
    _write_varint(out, (fnum << 3) | wt)


def _put_bytes(out: bytearray, fnum: int, data: bytes) -> None:
    _tag(out, fnum, 2)
    _write_varint(out, len(data))
    out += data


def _put_str(out: bytearray, fnum: int, s: str) -> None:
    _put_bytes(out, fnum, s.encode())


def _encode_tensor(name: str, arr: np.ndarray) -> bytes:
    out = bytearray()
    for d in arr.shape:
        _tag(out, 1, 0)
        _write_varint(out, d)
    _tag(out, 2, 0)
    _write_varint(out, _DTYPE_CODES[np.dtype(arr.dtype)])
    _put_str(out, 8, name)
    _put_bytes(out, 9, np.ascontiguousarray(arr).tobytes())
    return bytes(out)


def _encode_attr(name: str, value: Any) -> bytes:
    out = bytearray()
    _put_str(out, 1, name)
    if isinstance(value, float):
        _tag(out, 2, 5)
        out += struct.pack("<f", value)
        t = 1
    elif isinstance(value, (bool, int, np.integer)):
        _tag(out, 3, 0)
        _write_varint(out, int(value))
        t = 2
    elif isinstance(value, (str, bytes)):
        _put_bytes(out, 4, value.encode() if isinstance(value, str) else value)
        t = 3
    elif isinstance(value, np.ndarray):
        _put_bytes(out, 5, _encode_tensor("", value))
        t = 4
    elif isinstance(value, (list, tuple)) and value and isinstance(value[0], float):
        for f in value:
            _tag(out, 7, 5)
            out += struct.pack("<f", f)
        t = 6
    elif isinstance(value, (list, tuple)):
        for i in value:
            _tag(out, 8, 0)
            _write_varint(out, int(i))
        t = 7
    else:
        raise TypeError(f"attr {name}: {type(value)}")
    _tag(out, 20, 0)
    _write_varint(out, t)
    return bytes(out)


def _encode_value_info(name: str, ty: Optional[tuple] = None) -> bytes:
    out = bytearray()
    _put_str(out, 1, name)
    if ty is not None:
        dtype, shape = ty
        tensor = bytearray()
        _tag(tensor, 1, 0)
        _write_varint(tensor, _DTYPE_CODES[np.dtype(dtype)])  # elem_type
        shp = bytearray()
        for d in shape:
            dim = bytearray()
            if int(d) >= 0:
                _tag(dim, 1, 0)
                _write_varint(dim, int(d))
            else:  # unknown dim -> dim_param
                _put_str(dim, 2, "dyn")
            _put_bytes(shp, 1, bytes(dim))
        _put_bytes(tensor, 2, bytes(shp))
        typ = bytearray()
        _put_bytes(typ, 1, bytes(tensor))  # TypeProto.tensor_type
        _put_bytes(out, 2, bytes(typ))  # ValueInfoProto.type
    return bytes(out)


def encode_model(g: Graph, opset: int = 17) -> bytes:
    gout = bytearray()
    for n in g.nodes:
        nb = bytearray()
        for i in n.inputs:
            _put_str(nb, 1, i)
        for o in n.outputs:
            _put_str(nb, 2, o)
        if n.name:
            _put_str(nb, 3, n.name)
        _put_str(nb, 4, n.op_type)
        for k, v in n.attrs.items():
            _put_bytes(nb, 5, _encode_attr(k, v))
        _put_bytes(gout, 1, bytes(nb))
    _put_str(gout, 2, g.name)
    for name, arr in g.initializers.items():
        _put_bytes(gout, 5, _encode_tensor(name, arr))
    for i in g.inputs:
        _put_bytes(gout, 11, _encode_value_info(i, g.io_types.get(i)))
    for o in g.outputs:
        _put_bytes(gout, 12, _encode_value_info(o, g.io_types.get(o)))

    out = bytearray()
    _tag(out, 1, 0)
    _write_varint(out, 8)  # ir_version
    ops = bytearray()
    _tag(ops, 2, 0)
    _write_varint(ops, opset)  # OperatorSetIdProto.version
    _put_bytes(out, 8, bytes(ops))
    _put_bytes(out, 7, bytes(gout))
    return bytes(out)


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------


def _np_dims(x) -> np.ndarray:
    return np.asarray(x, np.int64).reshape(-1)


def _conv_pads(attrs, spatial, x_shape, w_shape, strides, dilations):
    if "pads" in attrs:
        p = attrs["pads"]
        return [(int(p[i]), int(p[i + spatial])) for i in range(spatial)]
    ap = attrs.get("auto_pad", b"NOTSET")
    ap = ap.decode() if isinstance(ap, bytes) else ap
    if ap in ("NOTSET", "VALID", ""):
        return [(0, 0)] * spatial
    pads = []
    for i in range(spatial):
        in_i = x_shape[2 + i]
        k = (w_shape[2 + i] - 1) * dilations[i] + 1
        out_i = -(-in_i // strides[i])
        total = max(0, (out_i - 1) * strides[i] + k - in_i)
        if ap == "SAME_UPPER":
            pads.append((total // 2, total - total // 2))
        else:
            pads.append((total - total // 2, total // 2))
    return pads


class OnnxModel:
    """Parsed ONNX graph executable with jax.numpy.

    `run({input: array, ...})` -> list of outputs (jnp arrays). Wrap in
    jax.jit for repeated fixed-shape calls.
    """

    def __init__(self, data: bytes):
        self.graph = parse_model(data)
        self.params = {k: jnp.asarray(v) for k, v in self.graph.initializers.items()}

    @staticmethod
    def from_file(path: str) -> "OnnxModel":
        with open(path, "rb") as f:
            return OnnxModel(f.read())

    @property
    def input_names(self) -> list[str]:
        return list(self.graph.inputs)

    def __call__(self, *args, **feeds):
        named = dict(zip(self.graph.inputs, args))
        named.update(feeds)
        return self.run(named)

    def run(self, feeds: dict) -> list:
        env: dict[str, Any] = dict(self.params)
        for k, v in feeds.items():
            env[k] = jnp.asarray(v)
        for node in self.graph.nodes:
            outs = self._exec(node, env)
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return [env[o] for o in self.graph.outputs]

    # -- op dispatch --------------------------------------------------------

    def _exec(self, n: Node, env: dict) -> Sequence[Any]:
        op = n.op_type
        a = n.attrs

        def inp(i, default=None):
            if i >= len(n.inputs) or not n.inputs[i]:
                return default
            return env[n.inputs[i]]

        x = inp(0)

        if op in _ELEMENTWISE:
            return (_ELEMENTWISE[op](x),)
        if op == "Mod":
            # fmod=1 -> C semantics (sign follows dividend, matches lax.rem);
            # fmod=0 -> Python semantics (sign follows divisor)
            return ((jnp.fmod if a.get("fmod") else jnp.mod)(x, inp(1)),)
        if op in _BINARY:
            return (_BINARY[op](x, inp(1)),)

        if op == "Conv":
            w = inp(1)
            spatial = w.ndim - 2
            strides = [int(s) for s in a.get("strides", [1] * spatial)]
            dil = [int(d) for d in a.get("dilations", [1] * spatial)]
            group = int(a.get("group", 1))
            pads = _conv_pads(a, spatial, x.shape, w.shape, strides, dil)
            dn = ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCH", "OIH", "NCH")
            y = jax.lax.conv_general_dilated(
                x, w, tuple(strides), pads, rhs_dilation=tuple(dil),
                dimension_numbers=dn, feature_group_count=group,
            )
            b = inp(2)
            if b is not None:
                y = y + b.reshape((1, -1) + (1,) * spatial)
            return (y,)

        if op == "ConvTranspose":
            w = inp(1)  # (Cin, Cout/g, kH, kW)
            spatial = w.ndim - 2
            strides = [int(s) for s in a.get("strides", [1] * spatial)]
            group = int(a.get("group", 1))
            pads_attr = a.get("pads", [0] * (2 * spatial))
            out_pad = [int(p) for p in a.get("output_padding", [0] * spatial)]
            # flip spatial dims, swap IO per group: -> (Cout, Cin/g, kH, kW)
            wf = jnp.flip(w, axis=tuple(range(2, w.ndim)))
            cin = w.shape[0]
            cpg = cin // group
            wf = wf.reshape((group, cpg) + w.shape[1:])
            wf = jnp.swapaxes(wf, 1, 2)  # (g, Cout/g, Cin/g, k...)
            wf = wf.reshape((w.shape[1] * group, cpg) + w.shape[2:])
            pads = [
                (
                    int(w.shape[2 + i] - 1 - pads_attr[i]),
                    int(w.shape[2 + i] - 1 - pads_attr[i + spatial] + out_pad[i]),
                )
                for i in range(spatial)
            ]
            dn = ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCH", "OIH", "NCH")
            y = jax.lax.conv_general_dilated(
                x, wf, (1,) * spatial, pads, lhs_dilation=tuple(strides),
                dimension_numbers=dn, feature_group_count=group,
            )
            b = inp(2)
            if b is not None:
                y = y + b.reshape((1, -1) + (1,) * spatial)
            return (y,)

        if op == "BatchNormalization":
            scale, bias, mean, var = inp(1), inp(2), inp(3), inp(4)
            eps = a.get("epsilon", 1e-5)
            shp = (1, -1) + (1,) * (x.ndim - 2)
            return ((x - mean.reshape(shp)) / jnp.sqrt(var.reshape(shp) + eps) * scale.reshape(shp) + bias.reshape(shp),)

        if op == "InstanceNormalization":
            scale, bias = inp(1), inp(2)
            eps = a.get("epsilon", 1e-5)
            axes = tuple(range(2, x.ndim))
            mu = x.mean(axis=axes, keepdims=True)
            var = x.var(axis=axes, keepdims=True)
            shp = (1, -1) + (1,) * (x.ndim - 2)
            return ((x - mu) / jnp.sqrt(var + eps) * scale.reshape(shp) + bias.reshape(shp),)

        if op == "LayerNormalization":
            scale, bias = inp(1), inp(2)
            axis = int(a.get("axis", -1))
            eps = a.get("epsilon", 1e-5)
            axes = tuple(range(axis % x.ndim, x.ndim))
            mu = x.mean(axis=axes, keepdims=True)
            var = x.var(axis=axes, keepdims=True)
            y = (x - mu) / jnp.sqrt(var + eps) * scale
            if bias is not None:
                y = y + bias
            return (y,)

        if op == "Gemm":
            A, B, C = x, inp(1), inp(2)
            if a.get("transA", 0):
                A = A.T
            if a.get("transB", 0):
                B = B.T
            y = a.get("alpha", 1.0) * (A @ B)
            if C is not None:
                y = y + a.get("beta", 1.0) * C
            return (y,)

        if op == "MatMul":
            return (jnp.matmul(x, inp(1)),)

        if op == "Softmax":
            return (jax.nn.softmax(x, axis=int(a.get("axis", -1))),)

        if op == "Reshape":
            shape = [int(s) for s in _np_dims(inp(1))]
            shape = [x.shape[i] if s == 0 and a.get("allowzero", 0) == 0 else s for i, s in enumerate(shape)]
            return (x.reshape(shape),)

        if op == "Transpose":
            perm = a.get("perm")
            return (jnp.transpose(x, perm if perm else None),)

        if op == "Concat":
            return (jnp.concatenate([env[i] for i in n.inputs], axis=int(a["axis"])),)

        if op == "Split":
            axis = int(a.get("axis", 0))
            if len(n.inputs) > 1 and n.inputs[1]:
                sizes = [int(s) for s in _np_dims(inp(1))]
            elif "split" in a:
                sizes = [int(s) for s in a["split"]]
            else:
                k = len(n.outputs)
                sizes = [x.shape[axis] // k] * k
            idx = np.cumsum(sizes)[:-1]
            return tuple(jnp.split(x, idx, axis=axis))

        if op == "Slice":
            if len(n.inputs) > 1:  # opset >= 10
                starts = _np_dims(inp(1))
                ends = _np_dims(inp(2))
                axes = _np_dims(inp(3)) if inp(3) is not None else np.arange(len(starts))
                steps = _np_dims(inp(4)) if inp(4) is not None else np.ones(len(starts), np.int64)
            else:
                starts = _np_dims(a["starts"])
                ends = _np_dims(a["ends"])
                axes = _np_dims(a.get("axes", list(range(len(starts)))))
                steps = np.ones(len(starts), np.int64)
            sl = [slice(None)] * x.ndim
            for s, e, ax, st in zip(starts, ends, axes, steps):
                ax = int(ax) % x.ndim
                dim = x.shape[ax]
                s, e = int(np.clip(s + dim if s < 0 else s, 0, dim)), int(np.clip(e + dim if e < 0 else e, -1 if st < 0 else 0, dim))
                # a clipped end of -1 with a negative step means "through
                # index 0 inclusive", which Python can only express as None
                sl[ax] = slice(s, None if (st < 0 and e < 0) else e, int(st))
            return (x[tuple(sl)],)

        if op in ("Squeeze", "Unsqueeze"):
            if len(n.inputs) > 1 and n.inputs[1]:
                axes = [int(v) for v in _np_dims(inp(1))]
            else:
                axes = [int(v) for v in a.get("axes", [])]
            if op == "Squeeze":
                if not axes:
                    return (jnp.squeeze(x),)
                return (jnp.squeeze(x, axis=tuple(ax % x.ndim for ax in axes)),)
            y = x
            for ax in sorted(ax % (x.ndim + len(axes)) for ax in axes):
                y = jnp.expand_dims(y, ax)
            return (y,)

        if op == "Shape":
            return (jnp.asarray(np.asarray(x.shape, np.int64)),)
        if op == "Size":
            return (jnp.asarray(np.int64(int(np.prod(x.shape)))),)

        if op == "Gather":
            axis = int(a.get("axis", 0))
            return (jnp.take(x, inp(1).astype(jnp.int32), axis=axis),)

        if op == "Cast":
            return (x.astype(_DTYPES[int(a["to"])]),)

        if op == "Constant":
            for key in ("value", "value_float", "value_int", "value_floats", "value_ints"):
                if key in a:
                    return (jnp.asarray(a[key]),)
            raise ValueError("Constant without value")

        if op == "ConstantOfShape":
            shape = [int(s) for s in _np_dims(x)]
            val = a.get("value")
            fill = np.asarray(val).reshape(-1)[0] if val is not None else np.float32(0)
            return (jnp.full(shape, fill, dtype=np.asarray(fill).dtype),)

        if op == "Expand":
            shape = [int(s) for s in _np_dims(inp(1))]
            shape = list(np.broadcast_shapes(tuple(x.shape), tuple(shape)))
            return (jnp.broadcast_to(x, shape),)

        if op == "Range":
            return (jnp.arange(int(inp(0)), int(inp(1)), int(inp(2))),)

        if op == "Where":
            return (jnp.where(x.astype(bool), inp(1), inp(2)),)

        if op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin"):
            if len(n.inputs) > 1 and n.inputs[1]:
                axes = tuple(int(v) for v in _np_dims(inp(1)))
            else:
                axes = tuple(int(v) for v in a.get("axes", [])) or None
            keep = bool(a.get("keepdims", 1))
            fn = {"ReduceMean": jnp.mean, "ReduceSum": jnp.sum, "ReduceMax": jnp.max, "ReduceMin": jnp.min}[op]
            return (fn(x, axis=axes, keepdims=keep),)

        if op == "Clip":
            lo = inp(1) if len(n.inputs) > 1 else a.get("min")
            hi = inp(2) if len(n.inputs) > 2 else a.get("max")
            return (jnp.clip(x, lo, hi),)

        if op == "LeakyRelu":
            alpha = a.get("alpha", 0.01)
            return (jnp.where(x >= 0, x, alpha * x),)

        if op == "PRelu":
            s = inp(1)
            return (jnp.where(x >= 0, x, s * x),)

        if op == "Elu":
            alpha = a.get("alpha", 1.0)
            return (jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1)),)

        if op == "Flatten":
            axis = int(a.get("axis", 1))
            lead = int(np.prod(x.shape[:axis])) if axis else 1
            return (x.reshape(lead, -1),)

        if op in ("Identity", "Dropout"):
            return (x,) + ((jnp.ones_like(x, dtype=bool),) if op == "Dropout" and len(n.outputs) > 1 else ())

        if op in ("AveragePool", "MaxPool", "GlobalAveragePool"):
            if op == "GlobalAveragePool":
                return (x.mean(axis=tuple(range(2, x.ndim)), keepdims=True),)
            k = [int(v) for v in a["kernel_shape"]]
            spatial = len(k)
            strides = [int(s) for s in a.get("strides", [1] * spatial)]
            pads = _conv_pads(a, spatial, x.shape, (0, 0, *k), strides, [1] * spatial)
            window = (1, 1, *k)
            strides_full = (1, 1, *strides)
            pads_full = [(0, 0), (0, 0), *pads]
            if op == "MaxPool":
                y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, strides_full, pads_full)
            else:
                y = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides_full, pads_full)
                cnt = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add, window, strides_full, pads_full)
                y = y / cnt
            return (y,)

        if op == "Pad":
            mode = a.get("mode", b"constant")
            mode = mode.decode() if isinstance(mode, bytes) else mode
            pads = _np_dims(inp(1)) if len(n.inputs) > 1 else _np_dims(a["pads"])
            half = len(pads) // 2
            pw = [(int(pads[i]), int(pads[i + half])) for i in range(half)]
            kw = {"constant": "constant", "reflect": "reflect", "edge": "edge"}[mode]
            cval = inp(2)
            if kw == "constant":
                return (jnp.pad(x, pw, mode="constant", constant_values=0.0 if cval is None else cval),)
            return (jnp.pad(x, pw, mode=kw),)

        if op == "Einsum":
            eq = a["equation"]
            eq = eq.decode() if isinstance(eq, bytes) else eq
            return (jnp.einsum(eq, *[env[i] for i in n.inputs]),)

        if op in ("ArgMax", "ArgMin"):
            axis = int(a.get("axis", 0))
            keep = bool(a.get("keepdims", 1))
            y = (jnp.argmax if op == "ArgMax" else jnp.argmin)(x, axis=axis)
            if keep:
                y = jnp.expand_dims(y, axis)
            return (y.astype(jnp.int64),)

        if op == "CumSum":
            axis = int(np.asarray(inp(1)).reshape(()))
            y = x
            if a.get("reverse", 0):
                y = jnp.flip(jnp.cumsum(jnp.flip(y, axis), axis=axis), axis)
            else:
                y = jnp.cumsum(y, axis=axis)
            if a.get("exclusive", 0):
                raise NotImplementedError("exclusive CumSum")
            return (y,)

        if op == "ScatterND":
            idx = np.moveaxis(np.asarray(inp(1)), -1, 0)
            return (x.at[tuple(idx)].set(inp(2)),)

        if op == "ReduceProd":
            if len(n.inputs) > 1 and n.inputs[1]:
                axes = tuple(int(v) for v in _np_dims(inp(1)))
            else:
                axes = tuple(int(v) for v in a.get("axes", [])) or None
            return (jnp.prod(x, axis=axes, keepdims=bool(a.get("keepdims", 1))),)

        if op == "Tile":
            reps = [int(r) for r in _np_dims(inp(1))]
            return (jnp.tile(x, reps),)

        if op == "Resize":
            # supports scales or sizes; nearest/linear
            scales = inp(2)
            sizes = inp(3) if len(n.inputs) > 3 else None
            if sizes is not None and np.size(np.asarray(sizes)):
                out_shape = [int(s) for s in _np_dims(sizes)]
            else:
                sc = np.asarray(scales).reshape(-1)
                out_shape = [int(round(d * s)) for d, s in zip(x.shape, sc)]
            mode = a.get("mode", b"nearest")
            mode = mode.decode() if isinstance(mode, bytes) else mode
            method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}[mode]
            return (jax.image.resize(x, out_shape, method=method),)

        raise NotImplementedError(f"ONNX op {op} (node {n.name})")


_ELEMENTWISE = {
    "Relu": jax.nn.relu,
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Erf": jax.lax.erf,
    "Sqrt": jnp.sqrt,
    "Exp": jnp.exp,
    "Log": jnp.log,
    "Neg": lambda x: -x,
    "Abs": jnp.abs,
    "Floor": jnp.floor,
    "Ceil": jnp.ceil,
    "Reciprocal": lambda x: 1.0 / x,
    "Not": lambda x: ~x.astype(bool),
    "Softplus": jax.nn.softplus,
    "Sin": jnp.sin,
    "Cos": jnp.cos,
    "Sign": jnp.sign,
    "Round": jnp.round,
    "Gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "HardSwish": lambda x: x * jnp.clip(x / 6 + 0.5, 0, 1),
}

_BINARY = {
    "Add": jnp.add,
    "Sub": jnp.subtract,
    "Mul": jnp.multiply,
    "Div": lambda x, y: x / y if jnp.issubdtype(x.dtype, jnp.floating) or jnp.issubdtype(y.dtype, jnp.floating) else x // y,
    "Pow": jnp.power,
    "Equal": jnp.equal,
    "Greater": jnp.greater,
    "GreaterOrEqual": jnp.greater_equal,
    "Less": jnp.less,
    "LessOrEqual": jnp.less_equal,
    "And": jnp.logical_and,
    "Or": jnp.logical_or,
    "Max": jnp.maximum,
    "Min": jnp.minimum,
    "Mod": jnp.mod,
}
