"""ONNX export: trace a jitted JAX function and emit a standard .onnx graph.

Counterpart of the reference's ``onnx_export.py`` / ``models_onnx.py``
(SURVEY.md §2.6): the reference exports the T2S encoder / decode-step and the
VITS synthesizer as separate ONNX graphs for external runtimes.  Here the
same artifacts are produced directly from the JAX model definitions — the
function is traced to a jaxpr (fixed shapes, like the reference's mask-free
``models_onnx`` variants) and each primitive is lowered to standard ONNX ops,
serialized with the wire-format writer in :mod:`gpt_sovits_tpu.utils.onnx_lite`.

The output is a normal ONNX file (opset 17), loadable by onnxruntime or any
other ONNX backend; round-trip correctness is validated in-tree with the
:class:`onnx_lite.OnnxModel` executor (itself tested op-by-op against torch).

Scope: feed-forward graphs (no lax.while_loop/scan) — which covers the same
split the reference exports: S1 prefill + single KV-cache decode step, S2
``decode``, and the vocoders.  The CFM Euler loop stays a StableHLO export
(utils/export.py), which the reference's ONNX path does not cover either.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.extend import core as jcore

from gpt_sovits_tpu.utils.onnx_lite import Graph, Node, encode_model

# ONNX TensorProto dtype codes
_ONNX_DTYPE = {
    np.dtype(np.float32): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.int8): 3,
    np.dtype(np.int16): 5,
    np.dtype(np.int32): 6,
    np.dtype(np.int64): 7,
    np.dtype(np.bool_): 9,
    np.dtype(np.float16): 10,
    np.dtype(np.float64): 11,
    np.dtype(np.uint32): 12,
    np.dtype(np.uint64): 13,
}


def _onnx_dtype_code(dtype) -> int:
    """bfloat16 is a TPU serving dtype; the ONNX artifact is exported at f32
    (bf16 initializers are widened, bf16 casts become f32 casts)."""
    d = np.dtype(dtype)
    if d.name == "bfloat16":
        return _ONNX_DTYPE[np.dtype(np.float32)]
    return _ONNX_DTYPE[d]


def _widen_bf16(arr: np.ndarray) -> np.ndarray:
    return arr.astype(np.float32) if arr.dtype.name == "bfloat16" else arr

_UNARY = {
    "exp": "Exp",
    "log": "Log",
    "tanh": "Tanh",
    "sqrt": "Sqrt",
    "abs": "Abs",
    "neg": "Neg",
    "sign": "Sign",
    "floor": "Floor",
    "ceil": "Ceil",
    "round": "Round",
    "logistic": "Sigmoid",
    "erf": "Erf",
    "sin": "Sin",
    "cos": "Cos",
    "not": "Not",
    "is_finite": None,  # handled explicitly
}

_BINOP = {
    "add": "Add",
    "sub": "Sub",
    "mul": "Mul",
    "div": "Div",
    "max": "Max",
    "min": "Min",
    "pow": "Pow",
    "rem": None,  # Mod with fmod=1 (lax.rem = C semantics), handled explicitly
    "eq": "Equal",
    "ne": None,  # Not(Equal)
    "lt": "Less",
    "le": "LessOrEqual",
    "gt": "Greater",
    "ge": "GreaterOrEqual",
    "and": "And",
    "or": "Or",
}

_REDUCE = {
    "reduce_sum": "ReduceSum",
    "reduce_max": "ReduceMax",
    "reduce_min": "ReduceMin",
    "reduce_prod": "ReduceProd",
}


class _Converter:
    def __init__(self, name: str):
        self.g = Graph(name=name)
        self._n = 0
        self._env: dict = {}          # jax Var -> onnx tensor name
        self._const_cache: dict = {}  # (bytes, dtype, shape) -> initializer name

    # -- naming / graph helpers ---------------------------------------------

    def fresh(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def const(self, arr, hint: str = "c") -> str:
        arr = _widen_bf16(np.asarray(arr))
        key = (arr.tobytes(), str(arr.dtype), arr.shape)
        if key in self._const_cache:
            return self._const_cache[key]
        name = self.fresh(hint)
        self.g.initializers[name] = arr
        self._const_cache[key] = name
        return name

    def node(self, op: str, inputs: list[str], n_out: int = 1, **attrs) -> list[str]:
        outs = [self.fresh(op.lower()) for _ in range(n_out)]
        self.g.nodes.append(Node(op, list(inputs), outs, attrs, name=outs[0]))
        return outs

    def n1(self, op: str, inputs: list[str], **attrs) -> str:
        return self.node(op, inputs, 1, **attrs)[0]

    # -- value resolution -----------------------------------------------------

    def read(self, v) -> str:
        if isinstance(v, jcore.Literal):
            return self.const(np.asarray(v.val), "lit")
        return self._env[v]

    def write(self, v, name: str) -> None:
        self._env[v] = name

    # -- helpers used by several primitives ----------------------------------

    def reshape(self, x: str, shape) -> str:
        shape = [int(s) for s in shape]
        # ONNX Reshape reads a 0 dim as "copy from input" unless allowzero=1;
        # zero-sized tensors are legal jax values (e.g. edge-pad decomposition)
        attrs = {"allowzero": 1} if 0 in shape else {}
        return self.n1("Reshape", [x, self.const(np.asarray(shape, np.int64), "shape")], **attrs)

    def transpose(self, x: str, perm) -> str:
        if list(perm) == list(range(len(perm))):
            return x
        return self.n1("Transpose", [x], perm=[int(p) for p in perm])

    def cast(self, x: str, dtype) -> str:
        return self.n1("Cast", [x], to=_onnx_dtype_code(dtype))

    def static_slice(self, x: str, starts, ends, axes, steps=None) -> str:
        steps = steps if steps is not None else [1] * len(starts)
        return self.n1(
            "Slice",
            [
                x,
                self.const(np.asarray(starts, np.int64)),
                self.const(np.asarray(ends, np.int64)),
                self.const(np.asarray(axes, np.int64)),
                self.const(np.asarray(steps, np.int64)),
            ],
        )

    # -- jaxpr walking --------------------------------------------------------

    def walk(self, closed_jaxpr, input_names: list[str]) -> list[str]:
        jaxpr = closed_jaxpr.jaxpr
        for var, const in zip(jaxpr.constvars, closed_jaxpr.consts):
            self.write(var, self.const(np.asarray(const), "w"))
        for var, name in zip(jaxpr.invars, input_names):
            self.write(var, name)
        for eqn in jaxpr.eqns:
            self.eqn(eqn)
        return [self.read(v) for v in jaxpr.outvars]

    def _inline(self, eqn, inner) -> None:
        in_names = [self.read(v) for v in eqn.invars]
        outs = self.walk(inner, in_names)
        for var, name in zip(eqn.outvars, outs):
            self.write(var, name)

    def eqn(self, eqn) -> None:  # noqa: C901 — one dispatch table, kept flat on purpose
        prim = eqn.primitive.name
        p = eqn.params

        # ---- call-like primitives: inline ------------------------------------
        if prim in ("jit", "pjit", "closed_call", "core_call", "xla_call", "remat", "checkpoint"):
            self._inline(eqn, p["jaxpr"])
            return
        if prim in ("custom_jvp_call", "custom_vjp_call", "custom_jvp_call_jaxpr"):
            self._inline(eqn, p.get("call_jaxpr") or p.get("fun_jaxpr"))
            return

        ins = [self.read(v) for v in eqn.invars]
        aval = eqn.outvars[0].aval

        def out(name: str) -> None:
            self.write(eqn.outvars[0], name)

        # ---- trivial ----------------------------------------------------------
        if prim in ("stop_gradient", "copy"):
            out(self.n1("Identity", ins))
            return
        if prim in _UNARY and _UNARY[prim]:
            out(self.n1(_UNARY[prim], ins))
            return
        if prim in _BINOP and _BINOP[prim]:
            out(self.n1(_BINOP[prim], ins))
            return
        if prim == "ne":
            out(self.n1("Not", [self.n1("Equal", ins)]))
            return
        if prim == "rem":
            # lax.rem follows the dividend's sign (C fmod), ONNX Mod default
            # (fmod=0) follows the divisor's — emit fmod=1 always
            out(self.n1("Mod", ins, fmod=1))
            return
        if prim == "xor":
            # a xor b == (a or b) and not(a and b)
            o = self.n1("Or", ins)
            a = self.n1("And", ins)
            out(self.n1("And", [o, self.n1("Not", [a])]))
            return
        if prim == "square":
            out(self.n1("Mul", [ins[0], ins[0]]))
            return
        if prim == "rsqrt":
            out(self.n1("Reciprocal", [self.n1("Sqrt", ins)]))
            return
        if prim == "log1p":
            one = self.const(np.ones((), aval.dtype))
            out(self.n1("Log", [self.n1("Add", [ins[0], one])]))
            return
        if prim == "expm1":
            one = self.const(np.ones((), aval.dtype))
            out(self.n1("Sub", [self.n1("Exp", ins), one]))
            return
        if prim == "exp2":
            two = self.const(np.full((), 2, aval.dtype))
            out(self.n1("Pow", [two, ins[0]]))
            return
        if prim == "integer_pow":
            e = self.const(np.full((), p["y"], aval.dtype))
            out(self.n1("Pow", [ins[0], e]))
            return
        if prim == "clamp":
            # lax.clamp(min, x, max)
            out(self.n1("Clip", [ins[1], ins[0], ins[2]]))
            return
        if prim == "select_n":
            if len(ins) != 3:
                raise NotImplementedError("select_n with >2 cases")
            # select_n(pred, on_false, on_true); Where(cond, X, Y) -> X where cond
            out(self.n1("Where", [ins[0], ins[2], ins[1]]))
            return
        if prim == "convert_element_type":
            out(self.cast(ins[0], p["new_dtype"]))
            return
        if prim == "is_finite":
            inf = self.const(np.asarray(np.inf, eqn.invars[0].aval.dtype))
            a = self.n1("Abs", ins)
            out(self.n1("Less", [a, inf]))
            return

        # ---- shape ops --------------------------------------------------------
        if prim == "reshape":
            out(self.reshape(ins[0], aval.shape))
            return
        if prim == "squeeze":
            out(self.reshape(ins[0], aval.shape))
            return
        if prim == "expand_dims":
            out(self.reshape(ins[0], aval.shape))
            return
        if prim == "transpose":
            out(self.transpose(ins[0], p["permutation"]))
            return
        if prim == "broadcast_in_dim":
            shape = [int(s) for s in p["shape"]]
            bdims = list(p["broadcast_dimensions"])
            in_shape = eqn.invars[0].aval.shape
            interm = [1] * len(shape)
            for src_axis, dst_axis in enumerate(bdims):
                interm[dst_axis] = int(in_shape[src_axis])
            x = self.reshape(ins[0], interm) if list(interm) != list(in_shape) or len(interm) != len(in_shape) else ins[0]
            if interm != shape:
                x = self.n1("Expand", [x, self.const(np.asarray(shape, np.int64))])
            out(x)
            return
        if prim == "concatenate":
            out(self.n1("Concat", ins, axis=int(p["dimension"])))
            return
        if prim == "split":
            sizes = [int(s) for s in p["sizes"]]
            outs = self.node("Split", [ins[0], self.const(np.asarray(sizes, np.int64))], n_out=len(sizes), axis=int(p["axis"]))
            for var, name in zip(eqn.outvars, outs):
                self.write(var, name)
            return
        if prim == "slice":
            starts = [int(s) for s in p["start_indices"]]
            ends = [int(s) for s in p["limit_indices"]]
            strides = [int(s) for s in (p["strides"] or [1] * len(starts))]
            out(self.static_slice(ins[0], starts, ends, list(range(len(starts))), strides))
            return
        if prim == "rev":
            dims = [int(d) for d in p["dimensions"]]
            shape = eqn.invars[0].aval.shape
            out(
                self.static_slice(
                    ins[0],
                    starts=[-1] * len(dims),
                    ends=[-(int(shape[d]) + 1) for d in dims],
                    axes=dims,
                    steps=[-1] * len(dims),
                )
            )
            return
        if prim == "pad":
            cfg = p["padding_config"]
            if any(int(i) != 0 for _, _, i in cfg):
                raise NotImplementedError("interior pad")
            los = [int(lo) for lo, _, _ in cfg]
            his = [int(hi) for _, hi, _ in cfg]
            x = ins[0]
            if any(v < 0 for v in los + his):
                # negative padding = crop; split into Slice + Pad
                shape = eqn.invars[0].aval.shape
                starts = [max(0, -lo) for lo in los]
                ends = [int(shape[i]) + min(0, his[i]) for i in range(len(his))]
                x = self.static_slice(x, starts, ends, list(range(len(los))))
                los = [max(0, lo) for lo in los]
                his = [max(0, hi) for hi in his]
            if any(v != 0 for v in los + his):
                pads = self.const(np.asarray(los + his, np.int64))
                x = self.n1("Pad", [x, pads, ins[1]])
            out(x)
            return
        if prim == "iota":
            dt = np.dtype(p["dtype"])
            arr = np.arange(p["shape"][p["dimension"]], dtype=dt if dt != np.dtype(np.bool_) else np.int64)
            shape = [1] * len(p["shape"])
            shape[p["dimension"]] = -1
            arr = np.broadcast_to(arr.reshape(shape), p["shape"]).astype(dt)
            out(self.const(np.ascontiguousarray(arr), "iota"))
            return

        # ---- reductions -------------------------------------------------------
        if prim in _REDUCE:
            axes = [int(a) for a in p["axes"]]
            out(self.n1(_REDUCE[prim], ins, axes=axes, keepdims=0))
            return
        if prim in ("reduce_and", "reduce_or"):
            axes = [int(a) for a in p["axes"]]
            x = self.cast(ins[0], np.int32)
            op = "ReduceMin" if prim == "reduce_and" else "ReduceMax"
            out(self.cast(self.n1(op, [x], axes=axes, keepdims=0), np.bool_))
            return
        if prim == "argmax" or prim == "argmin":
            axes = p["axes"]
            y = self.n1("ArgMax" if prim == "argmax" else "ArgMin", ins, axis=int(axes[0]), keepdims=0)
            out(self.cast(y, p["index_dtype"]))
            return
        if prim == "cumsum":
            out(self.n1("CumSum", [ins[0], self.const(np.asarray(int(p["axis"]), np.int64))], reverse=1 if p.get("reverse") else 0))
            return

        # ---- matmul -----------------------------------------------------------
        if prim == "dot_general":
            out(self._dot_general(eqn, ins))
            return

        # ---- conv -------------------------------------------------------------
        if prim == "conv_general_dilated":
            out(self._conv(eqn, ins))
            return

        # ---- gather / scatter / dynamic slices ---------------------------------
        if prim == "gather":
            out(self._gather(eqn, ins))
            return
        if prim == "dynamic_slice":
            x_shape = eqn.invars[0].aval.shape
            sizes = [int(s) for s in p["slice_sizes"]]
            starts1d = [self.reshape(s, [1]) for s in ins[1:]]
            starts = self.n1("Concat", starts1d, axis=0) if len(starts1d) > 1 else starts1d[0]
            starts = self.cast(starts, np.int64)
            # jax clamps starts to [0, dim - size]
            lo = self.const(np.zeros(len(sizes), np.int64))
            hi = self.const(np.asarray([int(d) - s for d, s in zip(x_shape, sizes)], np.int64))
            starts = self.n1("Clip", [starts, lo, hi])
            ends = self.n1("Add", [starts, self.const(np.asarray(sizes, np.int64))])
            axes = self.const(np.arange(len(sizes), dtype=np.int64))
            out(self.n1("Slice", [ins[0], starts, ends, axes]))
            return
        if prim == "dynamic_update_slice":
            out(self._dynamic_update_slice(eqn, ins))
            return

        raise NotImplementedError(f"ONNX export: unmapped primitive '{prim}'")

    # ---- heavier lowerings ----------------------------------------------------

    def _dot_general(self, eqn, ins) -> str:
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        lhs_aval, rhs_aval = eqn.invars[0].aval, eqn.invars[1].aval
        ls, rs = lhs_aval.shape, rhs_aval.shape
        lc, rc, lb, rb = list(lc), list(rc), list(lb), list(rb)
        lfree = [i for i in range(len(ls)) if i not in lc and i not in lb]
        rfree = [i for i in range(len(rs)) if i not in rc and i not in rb]

        bshape = [int(ls[i]) for i in lb]
        m = int(np.prod([ls[i] for i in lfree])) if lfree else 1
        k = int(np.prod([ls[i] for i in lc])) if lc else 1
        n = int(np.prod([rs[i] for i in rfree])) if rfree else 1
        bsz = int(np.prod(bshape)) if bshape else 1

        a = self.transpose(ins[0], lb + lfree + lc)
        b = self.transpose(ins[1], rb + rc + rfree)
        if bshape:
            a = self.reshape(a, [bsz, m, k])
            b = self.reshape(b, [bsz, k, n])
        else:
            a = self.reshape(a, [m, k])
            b = self.reshape(b, [k, n])
        y = self.n1("MatMul", [a, b])
        out_shape = list(eqn.outvars[0].aval.shape)
        y = self.reshape(y, out_shape if out_shape else [1])
        if not out_shape:
            y = self.reshape(y, [])
        if np.dtype(eqn.outvars[0].aval.dtype) != np.dtype(lhs_aval.dtype):
            y = self.cast(y, eqn.outvars[0].aval.dtype)
        return y

    def _conv(self, eqn, ins) -> str:
        p = eqn.params
        dn = p["dimension_numbers"]
        lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
        spatial = len(lhs_spec) - 2
        strides = [int(s) for s in p["window_strides"]]
        lhs_dil = [int(d) for d in p["lhs_dilation"]]
        rhs_dil = [int(d) for d in p["rhs_dilation"]]
        pads = [(int(lo), int(hi)) for lo, hi in p["padding"]]
        group = int(p["feature_group_count"])
        if int(p.get("batch_group_count", 1)) != 1:
            raise NotImplementedError("batch_group_count")

        # lhs -> NC<spatial>
        x = self.transpose(ins[0], list(lhs_spec))
        # rhs -> OI<spatial>
        w = self.transpose(ins[1], list(rhs_spec))

        if all(d == 1 for d in lhs_dil):
            y = self.n1(
                "Conv",
                [x, w],
                strides=strides,
                dilations=rhs_dil,
                group=group,
                pads=[lo for lo, _ in pads] + [hi for _, hi in pads],
            )
        else:
            if any(s != 1 for s in strides):
                raise NotImplementedError("conv with both strides and lhs_dilation")
            if any(d != 1 for d in rhs_dil):
                raise NotImplementedError("conv with both rhs and lhs dilation")
            # ONNX ConvTranspose computes, for weight W' of layout (Cin, Cout/g, k):
            #   conv(dilate(x, strides), flip(swapIO-per-group(W')), pad=(k-1-p_lo, ...))
            # so choosing W'[j*ipg+i, o, k'] = W[j*opg+o, i, K-1-k'] makes the
            # transformed kernel equal W (the jax correlation kernel), and
            # p_attr = k-1 - p_jax.
            w_shape = [eqn.invars[1].aval.shape[i] for i in rhs_spec]
            o_total, ipg = int(w_shape[0]), int(w_shape[1])
            opg = o_total // group
            sp_dims = [int(w_shape[2 + i]) for i in range(spatial)]
            w_onnx = self.reshape(w, [group, opg, ipg] + sp_dims)
            w_onnx = self.n1("Transpose", [w_onnx], perm=[0, 2, 1] + list(range(3, 3 + spatial)))
            w_onnx = self.reshape(w_onnx, [group * ipg, opg] + sp_dims)
            w_onnx = self.static_slice(
                w_onnx,
                starts=[-1] * spatial,
                ends=[-(10**9)] * spatial,
                axes=list(range(2, 2 + spatial)),
                steps=[-1] * spatial,
            )
            ks = [int(w_shape[2 + i]) for i in range(spatial)]
            pads_attr, out_pad = [], []
            for i in range(spatial):
                lo_a = ks[i] - 1 - pads[i][0]
                hi_a = ks[i] - 1 - pads[i][1]
                op_i = 0
                if hi_a < 0:
                    op_i, hi_a = -hi_a, 0
                if lo_a < 0:
                    raise NotImplementedError("transposed conv pad_lo > k-1")
                pads_attr.append((lo_a, hi_a))
                out_pad.append(op_i)
            y = self.n1(
                "ConvTranspose",
                [x, w_onnx],
                strides=lhs_dil,
                group=group,
                pads=[lo for lo, _ in pads_attr] + [hi for _, hi in pads_attr],
                output_padding=out_pad,
            )

        # NC<spatial> -> out_spec order
        inv = [0] * len(out_spec)
        for logical_pos, physical_dim in enumerate(out_spec):
            inv[physical_dim] = logical_pos
        return self.transpose(y, inv)

    def _gather(self, eqn, ins) -> str:
        p = eqn.params
        dn = p["dimension_numbers"]
        operand_aval = eqn.invars[0].aval
        idx_aval = eqn.invars[1].aval
        slice_sizes = [int(s) for s in p["slice_sizes"]]
        # common case: embedding lookup — single collapsed axis indexed by a
        # trailing-1 index tensor, all other axes taken whole
        if (
            len(dn.start_index_map) == 1
            and dn.collapsed_slice_dims == (dn.start_index_map[0],)
            and idx_aval.shape[-1] == 1
            and all(
                slice_sizes[d] == operand_aval.shape[d]
                for d in range(len(slice_sizes))
                if d != dn.start_index_map[0]
            )
            and not dn.operand_batching_dims
        ):
            axis = int(dn.start_index_map[0])
            # ONNX Gather output = data[:axis] + indices.shape + data[axis+1:],
            # i.e. the canonical jnp.take layout: batch dims at [axis, axis+B),
            # offset dims at [0, axis) ++ [axis+B, out_rank). A gather whose
            # offset_dims deviate (rare, from hand-built lax.gather) would give
            # the right shape but wrong element order — refuse it.
            n_batch = len(idx_aval.shape) - 1
            out_rank = len(operand_aval.shape) - 1 + n_batch
            canonical = tuple(range(axis)) + tuple(range(axis + n_batch, out_rank))
            if tuple(dn.offset_dims) != canonical:
                raise NotImplementedError(
                    f"gather with non-take offset_dims {tuple(dn.offset_dims)}"
                )
            idx = self.reshape(ins[1], list(idx_aval.shape[:-1]))
            y = self.n1("Gather", [ins[0], idx], axis=axis)
            return self.reshape(y, list(eqn.outvars[0].aval.shape))
        raise NotImplementedError("general gather export")

    def _dynamic_update_slice(self, eqn, ins) -> str:
        operand_aval = eqn.invars[0].aval
        upd_aval = eqn.invars[1].aval
        rank = len(operand_aval.shape)
        # indices grid: for each dim, start_d + arange(U_d), meshed to U + [rank]
        per_dim = []
        for d in range(rank):
            u = int(upd_aval.shape[d])
            start = self.cast(self.reshape(ins[2 + d], [1]), np.int64)
            # jax clamps start to [0, dim - u]
            lo = self.const(np.zeros(1, np.int64))
            hi = self.const(np.asarray([int(operand_aval.shape[d]) - u], np.int64))
            start = self.n1("Clip", [start, lo, hi])
            ar = self.const(np.arange(u, dtype=np.int64))
            idx = self.n1("Add", [ar, start])  # (U_d,)
            shape = [1] * rank + [1]
            shape[d] = u
            idx = self.reshape(idx, shape)
            target = [int(s) for s in upd_aval.shape] + [1]
            idx = self.n1("Expand", [idx, self.const(np.asarray(target, np.int64))])
            per_dim.append(idx)
        indices = self.n1("Concat", per_dim, axis=rank)
        return self.n1("ScatterND", [ins[0], indices, ins[1]])


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def to_onnx(fn, example_args, *, name: str = "graph") -> bytes:
    """Trace ``fn`` at ``example_args`` and serialize it as an ONNX model."""
    closed = jax.make_jaxpr(fn)(*example_args)
    conv = _Converter(name)
    flat_in, _ = jax.tree_util.tree_flatten(example_args)
    in_names = [f"input_{i}" for i in range(len(flat_in))]
    outs = conv.walk(closed, in_names)
    # distinct graph-output names: ONNX forbids an output aliasing an input,
    # an initializer, or another output (a jaxpr may return the same var twice)
    final: list[str] = []
    for i, o in enumerate(outs):
        if o in in_names or o in conv.g.initializers or o in final:
            o = conv.n1("Identity", [o])
        final.append(o)
    conv.g.inputs = in_names
    conv.g.outputs = final
    # graph I/O TypeProto (required by the IR spec; onnxruntime enforces it)
    def _widened(dt):
        d = np.dtype(dt)
        return np.dtype(np.float32) if d.name == "bfloat16" else d

    for name_, av in zip(in_names, flat_in):
        conv.g.io_types[name_] = (_widened(av.dtype), tuple(int(s) for s in np.shape(av)))
    for name_, var in zip(final, closed.jaxpr.outvars):
        conv.g.io_types[name_] = (_widened(var.aval.dtype), tuple(int(s) for s in var.aval.shape))
    return encode_model(conv.g)


def export_s2_decode_onnx(model, params, *, b=1, tc=256, tt=128, tr=256) -> bytes:
    """SynthesizerTrn.decode as ONNX at fixed bucket shapes (the reference's
    VITS graph from onnx_export.py)."""
    from gpt_sovits_tpu.models.vits import SynthesizerTrn

    cfg = model.cfg

    def fn(codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths):
        return model.apply(
            params, codes, codes_lengths, text, text_lengths, refer_spec, refer_lengths,
            method=SynthesizerTrn.decode,
        )

    args = (
        jnp.zeros((b, tc), jnp.int32),
        jnp.full((b,), tc, jnp.int32),
        jnp.zeros((b, tt), jnp.int32),
        jnp.full((b,), tt, jnp.int32),
        jnp.zeros((b, tr, cfg.spec_channels), jnp.float32),
        jnp.full((b,), tr, jnp.int32),
    )
    return to_onnx(fn, args, name="s2_decode")


def export_s1_step_onnx(model, params, *, b=1, t_cache=2048) -> bytes:
    """One KV-cached S1 decode step as ONNX (the reference's sdec graph)."""
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
    return to_onnx(fn, args, name="s1_decode_step")


def export_s1_prefill_onnx(model, params, *, b=1, t=512) -> bytes:
    """S1 prefill (full prefix forward returning first logits + KV caches) as
    ONNX — the reference's t2s encoder graph (onnx_export.py T2SEncoder)."""
    from gpt_sovits_tpu.models.t2s import T2SDecoder

    cfg = model.cfg

    def fn(xy_emb, attn_bias):
        return model.apply(params, xy_emb, attn_bias, method=T2SDecoder.prefill)

    args = (
        jnp.zeros((b, t, cfg.embedding_dim), jnp.float32),
        jnp.zeros((1, 1, t, t), jnp.float32),
    )
    return to_onnx(fn, args, name="s1_prefill")


def export_vocoder_onnx(model, params, *, b=1, t=512) -> bytes:
    """BigVGAN / Generator mel->waveform as ONNX."""
    mel_dim = getattr(model.cfg, "num_mels", None) or model.cfg.cfm_mel_channels
    args = (jnp.zeros((b, t, mel_dim), jnp.float32),)
    return to_onnx(lambda mel: model.apply(params, mel), args, name="vocoder")
