"""jaxpr -> ONNX translator.

Traces a jittable function (e.g. `lambda x: model.apply(variables, x)`)
to a closed jaxpr and emits one ONNX (opset 17) node sequence per
primitive.  Model parameters arrive as jaxpr constants and become
initializers; anything computable at export time (iota chains, folded
kernel transposes) is constant-folded so the graph holds only the
dynamic dataflow.

This replaces the reference's torch.onnx round trip
(boxmot/reid/exporters/onnx_exporter.py:18-87) for Flax models: the
translation is layout-aware (Flax convs are NHWC/HWIO; ONNX Conv is
NCHW/OIHW, so convs and pools get transpose sandwiches, with the
weight permutation folded at export).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
from jax import core as jcore

from boxmot_tpu.onnxlite.builder import GraphBuilder, np_to_onnx_dtype

try:  # jax >= 0.4.x moved Literal/Var around; keep both spellings working
    from jax._src.core import DropVar, Literal
except ImportError:  # pragma: no cover
    from jax.core import DropVar, Literal  # type: ignore


class _Ctx:
    def __init__(self, builder: GraphBuilder):
        self.b = builder
        self.names: dict = {}  # Var -> onnx value name
        self.static: dict = {}  # Var -> np.ndarray known at export time

    # ---- value plumbing -------------------------------------------------
    def get_static(self, v):
        if isinstance(v, Literal):
            return np.asarray(v.val)
        return self.static.get(v)

    def name_of(self, v) -> str:
        if isinstance(v, Literal):
            return self.b.constant(np.asarray(v.val), "lit")
        if v in self.names:
            return self.names[v]
        if v in self.static:
            name = self.b.constant(np.asarray(self.static[v]), "folded")
            self.names[v] = name
            return name
        raise KeyError(f"untranslated jaxpr variable {v}")

    def axes_input(self, axes) -> str:
        return self.b.constant(np.asarray(axes, np.int64), "axes")

    def shape_input(self, shape) -> str:
        return self.b.constant(np.asarray(shape, np.int64), "shape")


def _nchw_perm(spec):
    """lax.ConvDimensionNumbers specs are already permutations that
    gather (batch/out, feature/in, *spatial); use them directly."""
    return list(spec)


def _inv_perm(perm):
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return inv


def _pads_attr(padding):
    lo = [int(p[0]) for p in padding]
    hi = [int(p[1]) for p in padding]
    return lo + hi


# ---------------------------------------------------------------- convs

def _emit_conv(ctx: _Ctx, eqn, in_names):
    p = eqn.params
    dn = p["dimension_numbers"]
    if any(d != 1 for d in p["lhs_dilation"]):
        raise NotImplementedError("transposed convolution is not exported")
    if p.get("batch_group_count", 1) != 1:
        raise NotImplementedError("batch_group_count > 1")
    b = ctx.b
    lhs_perm = _nchw_perm(dn.lhs_spec)
    rhs_perm = _nchw_perm(dn.rhs_spec)
    x = b.node("Transpose", [in_names[0]], perm=lhs_perm)
    w_static = ctx.get_static(eqn.invars[1])
    if w_static is not None:
        w = b.constant(
            np.ascontiguousarray(np.transpose(w_static, rhs_perm)), "w"
        )
    else:
        w = b.node("Transpose", [in_names[1]], perm=rhs_perm)
    y = b.node(
        "Conv",
        [x, w],
        strides=[int(s) for s in p["window_strides"]],
        pads=_pads_attr(p["padding"]),
        dilations=[int(d) for d in p["rhs_dilation"]],
        group=int(p["feature_group_count"]),
    )
    return b.node("Transpose", [y], perm=_inv_perm(_nchw_perm(dn.out_spec)))


def _emit_reduce_window(ctx: _Ctx, eqn, in_names, kind: str):
    p = eqn.params
    win = list(p["window_dimensions"])
    strides = list(p["window_strides"])
    padding = list(p["padding"])
    if any(d != 1 for d in p.get("base_dilation", (1,) * len(win))):
        raise NotImplementedError("base_dilation in pooling")
    if any(d != 1 for d in p.get("window_dilation", (1,) * len(win))):
        raise NotImplementedError("window_dilation in pooling")
    # Identify the pooled axes (window > 1 or padded); everything else
    # must be a pass-through axis.  Standard NHWC pools: (1, kh, kw, 1).
    rank = len(win)
    pooled = [
        i for i in range(rank) if win[i] != 1 or padding[i] != (0, 0)
    ]
    if not pooled:
        pooled = [rank - 2] if rank >= 2 else [0]
    passthrough = [i for i in range(rank) if i not in pooled]
    if any(strides[i] != 1 for i in passthrough):
        raise NotImplementedError("strided non-window axis in pooling")
    # Transpose pooled axes to the back: (N, C..., spatial...)
    perm = passthrough + pooled
    b = ctx.b
    x = b.node("Transpose", [in_names[0]], perm=perm)
    # ONNX pools want exactly (N, C, spatial...): flatten the leading
    # pass-through axes into two via Reshape if needed.
    in_shape = eqn.invars[0].aval.shape
    lead = [int(in_shape[i]) for i in passthrough]
    spatial = [int(in_shape[i]) for i in pooled]
    if len(lead) != 2:
        flat = int(np.prod(lead)) if lead else 1
        x = b.node(
            "Reshape", [x, ctx.shape_input([1, flat] + spatial)]
        )
    kwargs = dict(
        kernel_shape=[win[i] for i in pooled],
        strides=[strides[i] for i in pooled],
        pads=_pads_attr([padding[i] for i in pooled]),
    )
    if kind == "max":
        y = b.node("MaxPool", [x], **kwargs)
    else:  # sum pool: AveragePool * window_size with pads counted
        y = b.node("AveragePool", [x], count_include_pad=1, **kwargs)
        scale = float(np.prod([win[i] for i in pooled]))
        y = b.node("Mul", [y, b.constant(np.float32(scale), "winsz")])
    out_shape = [int(d) for d in eqn.outvars[0].aval.shape]
    mid_shape = [out_shape[i] for i in perm]
    if len(lead) != 2:
        y = b.node("Reshape", [y, ctx.shape_input(mid_shape)])
    return b.node("Transpose", [y], perm=_inv_perm(perm))


# ------------------------------------------------------------ dot_general

_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _emit_dot_general(ctx: _Ctx, eqn, in_names):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lrank = len(eqn.invars[0].aval.shape)
    rrank = len(eqn.invars[1].aval.shape)
    letters = iter(_LETTERS)
    l_names = [None] * lrank
    r_names = [None] * rrank
    for i, j in zip(lb, rb):
        c = next(letters)
        l_names[i] = c
        r_names[j] = c
    for i, j in zip(lc, rc):
        c = next(letters)
        l_names[i] = c
        r_names[j] = c
    for i in range(lrank):
        if l_names[i] is None:
            l_names[i] = next(letters)
    for j in range(rrank):
        if r_names[j] is None:
            r_names[j] = next(letters)
    out = (
        [l_names[i] for i in lb]
        + [l_names[i] for i in range(lrank) if i not in lb and i not in lc]
        + [r_names[j] for j in range(rrank) if j not in rb and j not in rc]
    )
    eqtn = f"{''.join(l_names)},{''.join(r_names)}->{''.join(out)}"
    return ctx.b.node("Einsum", list(in_names), equation=eqtn)


# ------------------------------------------------------------- registry

_UNARY = {
    "exp": "Exp",
    "log": "Log",
    "tanh": "Tanh",
    "logistic": "Sigmoid",
    "sqrt": "Sqrt",
    "neg": "Neg",
    "abs": "Abs",
    "sign": "Sign",
    "floor": "Floor",
    "ceil": "Ceil",
    "round": "Round",
    "erf": "Erf",
    "not": "Not",
    "sin": "Sin",
    "cos": "Cos",
    "stop_gradient": "Identity",
    "copy": "Identity",
}

_BINARY = {
    "add": "Add",
    "sub": "Sub",
    "mul": "Mul",
    "div": "Div",
    "max": "Max",
    "min": "Min",
    "pow": "Pow",
    "lt": "Less",
    "gt": "Greater",
    "le": "LessOrEqual",
    "ge": "GreaterOrEqual",
    "eq": "Equal",
    "and": "And",
    "or": "Or",
    "xor": "Xor",
    "atan2": "Atan2",  # not a real ONNX op; guarded below
}

_REDUCE_ATTR = {"reduce_max": "ReduceMax", "reduce_min": "ReduceMin",
                "reduce_prod": "ReduceProd"}


def _emit_eqn(ctx: _Ctx, eqn) -> list[str]:
    b = ctx.b
    prim = eqn.primitive.name
    in_names = None  # lazily resolved so folded eqns never touch the graph

    def names():
        return [ctx.name_of(v) for v in eqn.invars]

    if prim == "conv_general_dilated":
        return [_emit_conv(ctx, eqn, names())]
    if prim == "reduce_window_max":
        return [_emit_reduce_window(ctx, eqn, names(), "max")]
    if prim == "reduce_window_sum":
        return [_emit_reduce_window(ctx, eqn, names(), "sum")]
    if prim == "dot_general":
        return [_emit_dot_general(ctx, eqn, names())]
    if prim in _UNARY:
        return [b.node(_UNARY[prim], names())]
    if prim == "rsqrt":
        return [b.node("Reciprocal", [b.node("Sqrt", names())])]
    if prim == "square":
        x = names()[0]
        return [b.node("Mul", [x, x])]
    if prim == "integer_pow":
        y = eqn.params["y"]
        dt = np.dtype(eqn.invars[0].aval.dtype)
        return [b.node("Pow", [names()[0], b.constant(dt.type(y), "exp")])]
    if prim == "ne":
        return [b.node("Not", [b.node("Equal", names())])]
    if prim in _BINARY:
        if prim == "atan2":
            raise NotImplementedError("atan2 has no ONNX op")
        return [b.node(_BINARY[prim], names())]
    if prim == "select_n":
        if len(eqn.invars) != 3:
            raise NotImplementedError("select_n with >2 cases")
        pred, case0, case1 = names()
        return [b.node("Where", [pred, case1, case0])]
    if prim == "clamp":
        lo, x, hi = names()
        return [b.node("Min", [b.node("Max", [x, lo]), hi])]
    if prim == "transpose":
        perm = [int(i) for i in eqn.params["permutation"]]
        return [b.node("Transpose", names(), perm=perm)]
    if prim == "reshape" or prim == "squeeze" or prim == "expand_dims":
        out_shape = [int(d) for d in eqn.outvars[0].aval.shape]
        return [b.node("Reshape", [names()[0], ctx.shape_input(out_shape)])]
    if prim == "broadcast_in_dim":
        out_shape = [int(d) for d in eqn.params["shape"]]
        bdims = list(eqn.params["broadcast_dimensions"])
        in_shape = list(eqn.invars[0].aval.shape)
        interim = [1] * len(out_shape)
        for src, dst in enumerate(bdims):
            interim[dst] = int(in_shape[src])
        x = names()[0]
        if interim != in_shape:
            x = b.node("Reshape", [x, ctx.shape_input(interim)])
        if interim != out_shape:
            x = b.node("Expand", [x, ctx.shape_input(out_shape)])
        elif interim == in_shape:
            x = b.node("Identity", [x])
        return [x]
    if prim == "concatenate":
        return [b.node("Concat", names(), axis=int(eqn.params["dimension"]))]
    if prim == "slice":
        starts = [int(s) for s in eqn.params["start_indices"]]
        ends = [int(s) for s in eqn.params["limit_indices"]]
        strides = eqn.params["strides"] or [1] * len(starts)
        axes = list(range(len(starts)))
        return [
            b.node(
                "Slice",
                [
                    names()[0],
                    ctx.axes_input(starts),
                    ctx.axes_input(ends),
                    ctx.axes_input(axes),
                    ctx.axes_input([int(s) for s in strides]),
                ],
            )
        ]
    if prim == "rev":
        dims = list(eqn.params["dimensions"])
        shape = list(eqn.invars[0].aval.shape)
        starts = [int(shape[d]) - 1 for d in dims]
        ends = [-(int(shape[d]) + 1) for d in dims]
        steps = [-1] * len(dims)
        return [
            b.node(
                "Slice",
                [
                    names()[0],
                    ctx.axes_input(starts),
                    ctx.axes_input(ends),
                    ctx.axes_input(dims),
                    ctx.axes_input(steps),
                ],
            )
        ]
    if prim == "pad":
        cfg = eqn.params["padding_config"]
        if any(int(c[2]) != 0 for c in cfg):
            raise NotImplementedError("interior padding")
        if any(int(c[0]) < 0 or int(c[1]) < 0 for c in cfg):
            raise NotImplementedError("negative padding")
        pads = [int(c[0]) for c in cfg] + [int(c[1]) for c in cfg]
        data, value = names()
        return [b.node("Pad", [data, ctx.axes_input(pads), value])]
    if prim == "convert_element_type":
        to = np_to_onnx_dtype(np.dtype(eqn.params["new_dtype"]))
        return [b.node("Cast", names(), to=to)]
    if prim == "reduce_sum":
        axes = ctx.axes_input([int(a) for a in eqn.params["axes"]])
        return [b.node("ReduceSum", [names()[0], axes], keepdims=0)]
    if prim in _REDUCE_ATTR:
        axes = [int(a) for a in eqn.params["axes"]]
        return [b.node(_REDUCE_ATTR[prim], names(), axes=axes, keepdims=0)]
    if prim in ("argmax", "argmin"):
        op = "ArgMax" if prim == "argmax" else "ArgMin"
        axes = list(eqn.params["axes"])
        if len(axes) != 1:
            raise NotImplementedError(f"{prim} over multiple axes")
        y = b.node(op, names(), axis=int(axes[0]), keepdims=0)
        to = np_to_onnx_dtype(np.dtype(eqn.params["index_dtype"]))
        return [b.node("Cast", [y], to=to)]
    if prim == "cumsum":
        axis = ctx.axes_input(int(eqn.params["axis"]))
        rev = 1 if eqn.params.get("reverse") else 0
        return [b.node("CumSum", [names()[0], axis], exclusive=0, reverse=rev)]
    if prim == "iota":
        # static shape -> bake the whole thing as a constant
        arr = np.reshape(
            np.broadcast_to(
                np.arange(
                    eqn.params["shape"][eqn.params["dimension"]],
                    dtype=np.dtype(eqn.params["dtype"]),
                ).reshape(
                    [-1 if i == eqn.params["dimension"] else 1
                     for i in range(len(eqn.params["shape"]))]
                ),
                eqn.params["shape"],
            ),
            eqn.params["shape"],
        )
        return [b.node("Identity", [b.constant(arr, "iota")])]
    if prim == "gather":
        return [_emit_gather(ctx, eqn, names())]
    if prim == "dynamic_slice":
        starts = [ctx.get_static(v) for v in eqn.invars[1:]]
        if any(s is None for s in starts):
            raise NotImplementedError("dynamic_slice with traced starts")
        sizes = [int(s) for s in eqn.params["slice_sizes"]]
        shape = [int(d) for d in eqn.invars[0].aval.shape]
        st = [min(max(int(s), 0), shape[i] - sizes[i]) for i, s in enumerate(starts)]
        ends = [st[i] + sizes[i] for i in range(len(st))]
        return [
            b.node(
                "Slice",
                [
                    names()[0],
                    ctx.axes_input(st),
                    ctx.axes_input(ends),
                    ctx.axes_input(list(range(len(st)))),
                    ctx.axes_input([1] * len(st)),
                ],
            )
        ]
    raise NotImplementedError(f"no ONNX translation for primitive {prim!r}")


def _emit_gather(ctx: _Ctx, eqn, in_names):
    """Common jnp indexing patterns only: x[idx] / take along one axis.

    jaxpr gather is fully general; we support the shape produced by
    jnp.take / integer indexing on a single axis (collapsed slice dim,
    full slices elsewhere), which covers embedding lookups.
    """
    p = eqn.params
    dn = p["dimension_numbers"]
    operand = eqn.invars[0].aval
    if p.get("indices_are_sorted") is None:
        pass
    collapsed = tuple(dn.collapsed_slice_dims)
    if len(collapsed) != 1 or tuple(dn.start_index_map) != collapsed:
        raise NotImplementedError("general gather")
    axis = collapsed[0]
    sizes = list(p["slice_sizes"])
    for i, s in enumerate(sizes):
        if i != axis and int(s) != int(operand.shape[i]):
            raise NotImplementedError("gather with partial slices")
    idx_aval = eqn.invars[1].aval
    if idx_aval.shape and idx_aval.shape[-1] != 1:
        raise NotImplementedError("gather with vector indices")
    b = ctx.b
    idx = in_names[1]
    if idx_aval.shape:  # (..., 1) trailing index-vector dim -> squeeze
        idx = b.node(
            "Reshape", [idx, ctx.shape_input([int(d) for d in idx_aval.shape[:-1]])]
        )
    return b.node("Gather", [in_names[0], idx], axis=int(axis))


_CALL_PRIMS = {
    "jit",
    "pjit",
    "closed_call",
    "remat",
    "checkpoint",
    "custom_jvp_call",
    "custom_vjp_call",
    "custom_jvp_call_jaxpr",
    "custom_vjp_call_jaxpr",
}


def _inner_jaxpr(eqn):
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in eqn.params:
            j = eqn.params[key]
            return j
    raise NotImplementedError(f"call primitive {eqn.primitive.name} without jaxpr")


def _walk(ctx: _Ctx, jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in _CALL_PRIMS:
            inner = _inner_jaxpr(eqn)
            consts = []
            if hasattr(inner, "consts"):  # ClosedJaxpr
                consts = inner.consts
                inner = inner.jaxpr
            # bind inner invars to outer values
            sub = _Ctx(ctx.b)
            sub.names = ctx.names
            sub.static = ctx.static
            for cv, cval in zip(inner.constvars, consts):
                sub.static[cv] = np.asarray(cval)
            n_const = len(inner.invars) - len(eqn.invars)
            invars = inner.invars[n_const:] if n_const > 0 else inner.invars
            for iv, ov in zip(invars, eqn.invars):
                if isinstance(ov, Literal):
                    sub.static[iv] = np.asarray(ov.val)
                else:
                    if ov in ctx.static:
                        sub.static[iv] = ctx.static[ov]
                    if ov in ctx.names:
                        sub.names[iv] = ctx.names[ov]
                    if ov not in ctx.static and ov not in ctx.names:
                        sub.names[iv] = ctx.name_of(ov)
            _walk(sub, inner)
            for outer_v, inner_v in zip(eqn.outvars, inner.outvars):
                if isinstance(outer_v, DropVar):
                    continue
                if isinstance(inner_v, Literal):
                    ctx.static[outer_v] = np.asarray(inner_v.val)
                    continue
                if inner_v in sub.static:
                    ctx.static[outer_v] = sub.static[inner_v]
                if inner_v in sub.names:
                    ctx.names[outer_v] = sub.names[inner_v]
            continue

        # constant folding: every input known statically -> evaluate now
        in_static = [ctx.get_static(v) for v in eqn.invars]
        if all(s is not None for s in in_static) and eqn.primitive.name not in (
            "conv_general_dilated",
        ):
            try:
                vals = eqn.primitive.bind(
                    *[np.asarray(s) for s in in_static], **eqn.params
                )
                if not eqn.primitive.multiple_results:
                    vals = [vals]
                for ov, val in zip(eqn.outvars, vals):
                    if not isinstance(ov, DropVar):
                        ctx.static[ov] = np.asarray(val)
                continue
            except Exception:
                pass  # fall through to graph emission

        outs = _emit_eqn(ctx, eqn)
        for ov, name in zip(eqn.outvars, outs):
            if not isinstance(ov, DropVar):
                ctx.names[ov] = name


def export_fn_to_onnx(
    fn,
    example_args,
    path: Path | str | None = None,
    *,
    input_names=None,
    output_names=None,
    graph_name: str = "boxmot_tpu",
) -> bytes:
    """Trace `fn(*example_args)` and write/return ONNX model bytes.

    Shapes are static (the exported batch size is the example's);
    parameters captured by `fn` become initializers.
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    b = GraphBuilder(graph_name)
    ctx = _Ctx(b)
    for var, const in zip(jaxpr.constvars, closed.consts):
        ctx.static[var] = np.asarray(const)
    input_names = input_names or [f"input_{i}" for i in range(len(jaxpr.invars))]
    for name, var in zip(input_names, jaxpr.invars):
        b.add_input(name, [int(d) for d in var.aval.shape], np.dtype(var.aval.dtype))
        ctx.names[var] = name
    _walk(ctx, jaxpr)
    output_names = output_names or [
        f"output_{i}" for i in range(len(jaxpr.outvars))
    ]
    for name, var in zip(output_names, jaxpr.outvars):
        src = ctx.name_of(var)
        b.node("Identity", [src], outputs=[name])
        b.add_output(
            name, [int(d) for d in var.aval.shape], np.dtype(var.aval.dtype)
        )
    blob = b.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob
