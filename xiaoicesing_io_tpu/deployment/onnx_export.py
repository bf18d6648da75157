"""jaxpr -> ONNX graph converter.

Replaces the reference's torch.onnx.export deployment product
(``/root/reference/deployment/exporters/acoustic_exporter.py:160-390``) with
a direct translation of our (statically-shaped) jaxprs into ONNX opset-17
graphs, written through the dependency-free protobuf layer in
``onnx_proto.py``.

Strategy:

* trace ``fn`` with ``jax.make_jaxpr``; model weights arrive as jaxpr consts
  and become initializers;
* CONSTANT-FOLD aggressively: any equation whose inputs are all known is
  evaluated with jax on host and its result becomes a (lazy) initializer —
  this eliminates iota/arange/shape arithmetic so the emitted graph contains
  only the real compute ops;
* each remaining primitive maps to standard ONNX ops (see ``_EMITTERS``);
  layout-sensitive ops (Conv: NWC/WIO -> NCW/OIW) get explicit Transposes,
  and ``lhs_dilation`` (transposed convs) is lowered to an explicit
  zero-interleave (Concat+Reshape+Slice) followed by a regular Conv so the
  semantics stay exactly lax's.

Verified without onnxruntime by the in-repo numpy executor
(``onnx_run.py``); the artifacts are standard ONNX and load in stock
tooling.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.extend import core as jcore

from .onnx_proto import (
    FLOAT, INT64, NP_TO_ONNX, Graph, Node, Tensor, build_model,
)


class _Converter:
    def __init__(self, graph_name: str, prefix: str = ""):
        self.nodes: List[Node] = []
        self.initializers: Dict[str, Tensor] = {}
        self.consts: Dict[str, np.ndarray] = {}   # var name -> known value
        self.names: Dict[int, str] = {}           # id(var) -> name
        self.counter = 0
        self.graph_name = graph_name
        # namespace prefix so graphs built by separate converters can be
        # merged (or nested as Loop bodies) without name collisions
        self.prefix = prefix

    # -- naming ---------------------------------------------------------------

    def fresh(self, hint: str = "t") -> str:
        self.counter += 1
        return f"{self.prefix}{hint}_{self.counter}"

    def var_name(self, v) -> str:
        if isinstance(v, jcore.Literal):
            return self.const_name(np.asarray(v.val))
        if id(v) not in self.names:
            self.names[id(v)] = self.fresh("v")
        return self.names[id(v)]

    def const_name(self, value: np.ndarray) -> str:
        name = self.fresh("c")
        self.consts[name] = np.asarray(value)
        return name

    def read(self, v) -> Optional[np.ndarray]:
        """Known constant value of a var, or None."""
        if isinstance(v, jcore.Literal):
            return np.asarray(v.val)
        return self.consts.get(self.names.get(id(v), ""), None)

    # -- emission ---------------------------------------------------------------

    def materialize(self, name: str):
        """Ensure a known-constant name exists as an initializer."""
        if name in self.consts and name not in self.initializers:
            a = self.consts[name]
            if a.dtype == np.float64:
                a = a.astype(np.float32)
            if a.dtype == np.int32:
                a = a.astype(np.int64) if False else a
            if a.dtype == bool:
                a = a.astype(np.bool_)
            self.initializers[name] = Tensor(name, a)

    def inp(self, v) -> str:
        """Input name for an eqn operand, materializing constants."""
        name = self.var_name(v)
        self.materialize(name)
        return name

    def node(self, op: str, inputs: Sequence[str], outputs: Sequence[str],
             **attrs):
        self.nodes.append(Node(op, list(inputs), list(outputs), attrs,
                               name=self.fresh(op)))

    def shape_const(self, shape) -> str:
        return self.const_name(np.asarray(shape, np.int64))


def _np_dtype(aval) -> np.dtype:
    dt = np.dtype(aval.dtype)
    return np.dtype(np.float32) if dt == np.float64 else dt


# ---------------------------------------------------------------------------
# primitive emitters:  emit(cv, eqn, in_names, out_names)
# ---------------------------------------------------------------------------

def _simple(op):
    def emit(cv, eqn, ins, outs):
        cv.node(op, ins, outs)
    return emit


def _emit_log1p(cv, eqn, ins, outs):
    one = cv.const_name(np.ones((), _np_dtype(eqn.invars[0].aval)))
    cv.materialize(one)
    t = cv.fresh("x1p")
    cv.node("Add", [ins[0], one], [t])
    cv.node("Log", [t], outs)


def _emit_expm1(cv, eqn, ins, outs):
    one = cv.const_name(np.ones((), _np_dtype(eqn.invars[0].aval)))
    cv.materialize(one)
    t = cv.fresh("ex")
    cv.node("Exp", ins, [t])
    cv.node("Sub", [t, one], outs)


def _emit_rsqrt(cv, eqn, ins, outs):
    s = cv.fresh("sqrt")
    cv.node("Sqrt", ins, [s])
    cv.node("Reciprocal", [s], outs)


def _emit_square(cv, eqn, ins, outs):
    cv.node("Mul", [ins[0], ins[0]], outs)


def _emit_erfc(cv, eqn, ins, outs):
    e = cv.fresh("erf")
    cv.node("Erf", ins, [e])
    one = cv.const_name(np.ones((), _np_dtype(eqn.invars[0].aval)))
    cv.materialize(one)
    cv.node("Sub", [one, e], outs)


def _emit_integer_pow(cv, eqn, ins, outs):
    y = eqn.params["y"]
    if y == 2:
        cv.node("Mul", [ins[0], ins[0]], outs)
        return
    p = cv.const_name(np.asarray(y, _np_dtype(eqn.invars[0].aval)))
    cv.materialize(p)
    cv.node("Pow", [ins[0], p], outs)


def _emit_pow(cv, eqn, ins, outs):
    cv.node("Pow", ins, outs)


def _emit_select_n(cv, eqn, ins, outs):
    assert len(ins) == 3, "select_n with >2 cases not supported"
    # select_n(pred, on_false, on_true) -> Where(pred, on_true, on_false)
    cv.node("Where", [ins[0], ins[2], ins[1]], outs)


def _emit_convert(cv, eqn, ins, outs):
    to = NP_TO_ONNX[_np_dtype(eqn.outvars[0].aval)]
    cv.node("Cast", ins, outs, to=to)


def _emit_reshape(cv, eqn, ins, outs):
    shape = cv.shape_const(eqn.outvars[0].aval.shape)
    cv.materialize(shape)
    cv.node("Reshape", [ins[0], shape], outs)


def _emit_squeeze(cv, eqn, ins, outs):
    _emit_reshape(cv, eqn, ins, outs)


def _emit_transpose(cv, eqn, ins, outs):
    cv.node("Transpose", ins, outs, perm=list(eqn.params["permutation"]))


def _emit_broadcast_in_dim(cv, eqn, ins, outs):
    out_shape = eqn.outvars[0].aval.shape
    bdims = eqn.params["broadcast_dimensions"]
    in_shape = eqn.invars[0].aval.shape
    # reshape to out rank with 1s, then Expand
    mid = [1] * len(out_shape)
    for i, d in enumerate(bdims):
        mid[d] = in_shape[i]
    r = cv.fresh("bshape")
    cur = ins[0]
    if tuple(mid) != tuple(in_shape) or len(mid) != len(in_shape):
        shape = cv.shape_const(mid)
        cv.materialize(shape)
        cv.node("Reshape", [cur, shape], [r])
        cur = r
    target = cv.shape_const(out_shape)
    cv.materialize(target)
    cv.node("Expand", [cur, target], outs)


def _emit_concatenate(cv, eqn, ins, outs):
    cv.node("Concat", ins, outs, axis=eqn.params["dimension"])


def _emit_split(cv, eqn, ins, outs):
    sizes = cv.const_name(np.asarray(eqn.params["sizes"], np.int64))
    cv.materialize(sizes)
    cv.node("Split", [ins[0], sizes], outs, axis=eqn.params["axis"])


def _emit_slice(cv, eqn, ins, outs):
    p = eqn.params
    starts = np.asarray(p["start_indices"], np.int64)
    ends = np.asarray(p["limit_indices"], np.int64)
    strides = p["strides"]
    strides = np.asarray(
        strides if strides is not None else [1] * len(starts), np.int64
    )
    axes = np.arange(len(starts), dtype=np.int64)
    names = [cv.const_name(a) for a in (starts, ends, axes, strides)]
    for n in names:
        cv.materialize(n)
    cv.node("Slice", [ins[0]] + names, outs)


def _emit_pad(cv, eqn, ins, outs):
    cfg = eqn.params["padding_config"]
    if any(i != 0 for _, _, i in cfg):
        raise NotImplementedError("interior padding")
    lo = [l for l, _, _ in cfg]
    hi = [h for _, h, _ in cfg]
    if any(v < 0 for v in lo + hi):
        # negative padding = crop: Pad does not support it; use Slice
        starts = np.asarray([max(0, -l) for l in lo], np.int64)
        shape = eqn.invars[0].aval.shape
        ends = np.asarray(
            [s + min(0, h) for s, h in zip(shape, hi)], np.int64
        )
        pos_lo = [max(0, l) for l in lo]
        pos_hi = [max(0, h) for h in hi]
        mid = ins[0]
        if starts.any() or any(e != s for e, s in zip(ends, shape)):
            axes = np.arange(len(lo), dtype=np.int64)
            names = [cv.const_name(a) for a in (starts, ends, axes)]
            for n in names:
                cv.materialize(n)
            mid2 = cv.fresh("crop")
            cv.node("Slice", [mid] + names, [mid2])
            mid = mid2
        lo, hi = pos_lo, pos_hi
        ins = [mid, ins[1]]
    pads = cv.const_name(np.asarray(list(lo) + list(hi), np.int64))
    cv.materialize(pads)
    cv.node("Pad", [ins[0], pads, ins[1]], outs, mode="constant")


def _emit_reduce(op):
    def emit(cv, eqn, ins, outs):
        axes = cv.const_name(np.asarray(eqn.params["axes"], np.int64))
        cv.materialize(axes)
        cv.node(op, [ins[0], axes], outs, keepdims=0)
    return emit


def _emit_cumsum(cv, eqn, ins, outs):
    axis = cv.const_name(np.asarray(eqn.params["axis"], np.int64))
    cv.materialize(axis)
    cv.node("CumSum", [ins[0], axis], outs)


def _emit_rem(cv, eqn, ins, outs):
    cv.node("Mod", ins, outs, fmod=1)


def _emit_dot_general(cv, eqn, ins, outs):
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars
    l_shape, r_shape = lhs.aval.shape, rhs.aval.shape

    def arrange(name, shape, batch, contract, contract_last):
        """Transpose/reshape to [*batch, M, K] (or [*batch, K, N])."""
        other = [i for i in range(len(shape))
                 if i not in batch and i not in contract]
        perm = list(batch) + (other + list(contract) if contract_last
                              else list(contract) + other)
        out = name
        if perm != list(range(len(shape))):
            t = cv.fresh("perm")
            cv.node("Transpose", [out], [t], perm=perm)
            out = t
        b_dims = [shape[i] for i in batch]
        o = int(np.prod([shape[i] for i in other])) if other else 1
        c = int(np.prod([shape[i] for i in contract]))
        tgt = b_dims + ([o, c] if contract_last else [c, o])
        t2 = cv.fresh("rs")
        sh = cv.shape_const(tgt)
        cv.materialize(sh)
        cv.node("Reshape", [out, sh], [t2])
        return t2, [shape[i] for i in other]

    ln, l_other = arrange(ins[0], l_shape, lb, lc, contract_last=True)
    rn, r_other = arrange(ins[1], r_shape, rb, rc, contract_last=False)
    mm = cv.fresh("mm")
    cv.node("MatMul", [ln, rn], [mm])
    out_shape = eqn.outvars[0].aval.shape
    sh = cv.shape_const(out_shape)
    cv.materialize(sh)
    cv.node("Reshape", [mm, sh], outs)


def _emit_conv(cv, eqn, ins, outs):
    p = eqn.params
    nd = len(eqn.invars[0].aval.shape)
    if nd != 3:
        raise NotImplementedError("only 1-D convs are exported")
    x = ins[0]
    w = ins[1]
    cdn = p["dimension_numbers"]
    # jax stores ConvDimensionNumbers(lhs_spec, rhs_spec, out_spec) as tuples
    # of ints mapping (batch, feature, *spatial) positions
    lhs_spec = cdn.lhs_spec  # (N, C, W) position indices in the operand
    rhs_spec = cdn.rhs_spec  # (O, I, W)
    out_spec = cdn.out_spec
    # transpose x -> NCW
    perm = list(lhs_spec)
    if perm != [0, 1, 2]:
        t = cv.fresh("xncw")
        cv.node("Transpose", [x], [t], perm=perm)
        x = t
    perm_w = list(rhs_spec)
    if perm_w != [0, 1, 2]:
        t = cv.fresh("woiw")
        cv.node("Transpose", [w], [t], perm=perm_w)
        w = t

    lhs_dil = p.get("lhs_dilation", (1,))
    if lhs_dil and lhs_dil[0] > 1:
        # zero-interleave x along W: [N,C,T] -> [N,C,T,s](zeros beyond 0)
        # -> [N,C,T*s] -> slice off the trailing s-1
        s = lhs_dil[0]
        n, c, t_len = [eqn.invars[0].aval.shape[i] for i in lhs_spec]
        u = cv.fresh("un")
        sh = cv.shape_const([n, c, t_len, 1])
        cv.materialize(sh)
        cv.node("Reshape", [x, sh], [u])
        z = cv.const_name(np.zeros((n, c, t_len, s - 1), np.float32))
        cv.materialize(z)
        cat = cv.fresh("cat")
        cv.node("Concat", [u, z], [cat], axis=3)
        flat = cv.fresh("flat")
        sh2 = cv.shape_const([n, c, t_len * s])
        cv.materialize(sh2)
        cv.node("Reshape", [cat, sh2], [flat])
        starts = cv.const_name(np.asarray([0], np.int64))
        ends = cv.const_name(np.asarray([t_len * s - (s - 1)], np.int64))
        axes = cv.const_name(np.asarray([2], np.int64))
        for nm in (starts, ends, axes):
            cv.materialize(nm)
        sl = cv.fresh("dilx")
        cv.node("Slice", [flat, starts, ends, axes], [sl])
        x = sl

    pads = list(p["padding"][0])
    conv_out = cv.fresh("conv")
    cv.node(
        "Conv", [x, w], [conv_out],
        dilations=[int(p["rhs_dilation"][0])],
        group=int(p.get("feature_group_count", 1)),
        pads=[int(pads[0]), int(pads[1])],
        strides=[int(p["window_strides"][0])],
    )
    # transpose back to the jax out_spec layout
    inv = [0] * 3
    for i, d in enumerate(out_spec):
        inv[d] = i
    if inv != [0, 1, 2]:
        cv.node("Transpose", [conv_out], outs, perm=inv)
    else:
        cv.node("Identity", [conv_out], outs)


def _expand_index_like(cv, idx_name, idx_shape, target_shape, a):
    """[*B, N, 1]-style gather indices -> broadcast to target_shape."""
    mid = list(target_shape[: a + 1]) + [1] * (len(target_shape) - a - 1)
    sh = cv.shape_const(mid)
    cv.materialize(sh)
    r = cv.fresh("idx")
    cv.node("Reshape", [idx_name, sh], [r])
    if tuple(mid) == tuple(target_shape):
        return r
    tgt = cv.shape_const(target_shape)
    cv.materialize(tgt)
    e = cv.fresh("idxe")
    cv.node("Expand", [r, tgt], [e])
    return e


def _emit_gather(cv, eqn, ins, outs):
    p = eqn.params
    dn = p["dimension_numbers"]
    operand = eqn.invars[0].aval
    idx_aval = eqn.invars[1].aval
    slice_sizes = p["slice_sizes"]
    nb = len(getattr(dn, "operand_batching_dims", ()) or ())

    # pattern 1 — jnp.take(axis=a) / embedding lookup: indices [..., 1],
    # collapse axis a, full slices on the remaining dims; index dims land at
    # output position a (= ONNX Gather(axis=a))
    if (
        nb == 0
        and len(dn.start_index_map) == 1
        and tuple(dn.collapsed_slice_dims) == tuple(dn.start_index_map)
        and slice_sizes[dn.start_index_map[0]] == 1
        and all(
            s == operand.shape[d]
            for d, s in enumerate(slice_sizes)
            if d != dn.start_index_map[0]
        )
    ):
        a_t = dn.start_index_map[0]
        n_idx = len(idx_aval.shape) - 1
        out_rank = len(eqn.outvars[0].aval.shape)
        expected_offsets = tuple(
            list(range(a_t)) + list(range(a_t + n_idx, out_rank))
        )
        if tuple(dn.offset_dims) == expected_offsets:
            idx = ins[1]
            if idx_aval.shape[-1] == 1:
                sh = cv.shape_const(idx_aval.shape[:-1])
                cv.materialize(sh)
                r = cv.fresh("idx")
                cv.node("Reshape", [idx, sh], [r])
                idx = r
            cv.node("Gather", [ins[0], idx], outs, axis=a_t)
            return

    # pattern 2 — (batched) take_along_axis on axis a = nb, full trailing
    # slices: ONNX GatherElements with the index broadcast across trailing
    a = nb
    out_shape = eqn.outvars[0].aval.shape
    if (
        tuple(getattr(dn, "operand_batching_dims", ()) or ()) == tuple(range(nb))
        and tuple(dn.start_index_map) == (a,)
        and tuple(dn.collapsed_slice_dims) == (a,)
        and all(slice_sizes[d] == 1 for d in range(a + 1))
        and tuple(slice_sizes[a + 1 :]) == tuple(operand.shape[a + 1 :])
    ):
        idx = _expand_index_like(cv, ins[1], idx_aval.shape, out_shape, a)
        cv.node("GatherElements", [ins[0], idx], outs, axis=a)
        return
    raise NotImplementedError(f"gather pattern {dn} slice_sizes {slice_sizes}")


def _emit_scatter_add(cv, eqn, ins, outs):
    p = eqn.params
    dn = p["dimension_numbers"]
    operand = eqn.invars[0].aval
    upd_aval = eqn.invars[2].aval
    nb = len(getattr(dn, "operand_batching_dims", ()) or ())
    a = nb
    # (batched) segment-sum style scatter-add along axis a with full trailing
    # window dims: ONNX ScatterElements(reduction=add)
    if (
        tuple(getattr(dn, "operand_batching_dims", ()) or ()) == tuple(range(nb))
        and tuple(dn.scatter_dims_to_operand_dims) == (a,)
        and tuple(dn.inserted_window_dims) == (a,)
        and tuple(dn.update_window_dims)
        == tuple(range(len(upd_aval.shape))[a + 1 :])
    ):
        idx = _expand_index_like(
            cv, ins[1], eqn.invars[1].aval.shape, upd_aval.shape, a
        )
        cv.node("ScatterElements", [ins[0], idx, ins[2]], outs,
                axis=a, reduction="add")
        return
    raise NotImplementedError(f"scatter-add pattern {dn}")


_EMITTERS = {
    "add": _simple("Add"),
    "sub": _simple("Sub"),
    "mul": _simple("Mul"),
    "div": _simple("Div"),
    "max": _simple("Max"),
    "min": _simple("Min"),
    "neg": _simple("Neg"),
    "exp": _simple("Exp"),
    "log": _simple("Log"),
    "cos": _simple("Cos"),
    "sin": _simple("Sin"),
    "tanh": _simple("Tanh"),
    "logistic": _simple("Sigmoid"),
    "sqrt": _simple("Sqrt"),
    "sign": _simple("Sign"),
    "abs": _simple("Abs"),
    "floor": _simple("Floor"),
    "lt": _simple("Less"),
    "le": _simple("LessOrEqual"),
    "gt": _simple("Greater"),
    "ge": _simple("GreaterOrEqual"),
    "eq": _simple("Equal"),
    "ne": _simple("Equal"),  # followed by Not — unused in our graphs
    "and": _simple("And"),
    "or": _simple("Or"),
    "not": _simple("Not"),
    "stop_gradient": _simple("Identity"),
    "copy": _simple("Identity"),
    "rsqrt": _emit_rsqrt,
    "log1p": _emit_log1p,
    "expm1": _emit_expm1,
    "square": _emit_square,
    "erfc": _emit_erfc,
    "erf": _simple("Erf"),
    "pow": _emit_pow,
    "integer_pow": _emit_integer_pow,
    "select_n": _emit_select_n,
    "convert_element_type": _emit_convert,
    "reshape": _emit_reshape,
    "squeeze": _emit_squeeze,
    "transpose": _emit_transpose,
    "broadcast_in_dim": _emit_broadcast_in_dim,
    "concatenate": _emit_concatenate,
    "split": _emit_split,
    "slice": _emit_slice,
    "pad": _emit_pad,
    "reduce_sum": _emit_reduce("ReduceSum"),
    "reduce_max": _emit_reduce("ReduceMax"),
    "reduce_min": _emit_reduce("ReduceMin"),
    "cumsum": _emit_cumsum,
    "rem": _emit_rem,
    "dot_general": _emit_dot_general,
    "conv_general_dilated": _emit_conv,
    "gather": _emit_gather,
    "scatter-add": _emit_scatter_add,
}

_INLINE = {"jit", "pjit", "custom_jvp_call", "custom_vjp_call",
           "custom_jvp_call_jaxpr", "remat", "checkpoint", "closed_call"}


def _subjaxpr(eqn):
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in eqn.params:
            j = eqn.params[key]
            return j.jaxpr if hasattr(j, "jaxpr") else j, getattr(
                j, "consts", getattr(j, "literals", [])
            )
    raise NotImplementedError(f"cannot inline {eqn.primitive.name}")


def _convert_jaxpr(cv: _Converter, jaxpr, consts):
    for cvar, cval in zip(jaxpr.constvars, consts):
        name = cv.var_name(cvar)
        cv.consts[name] = np.asarray(cval)

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        in_vals = [cv.read(v) for v in eqn.invars]

        if prim in _INLINE:
            sub, sub_consts = _subjaxpr(eqn)
            # bind sub invars to our current names/consts
            for sv, ov in zip(sub.invars, eqn.invars):
                if isinstance(ov, jcore.Literal):
                    cv.consts[cv.var_name(sv)] = np.asarray(ov.val)
                else:
                    cv.names[id(sv)] = cv.var_name(ov)
            _convert_jaxpr(cv, sub, sub_consts)
            for so, oo in zip(sub.outvars, eqn.outvars):
                cv.names[id(oo)] = cv.var_name(so)
            continue

        if all(v is not None for v in in_vals):
            # constant fold: bind the primitive eagerly on host
            vals = eqn.primitive.bind(
                *[np.asarray(v) for v in in_vals], **eqn.params
            )
            if eqn.primitive.multiple_results:
                for ov, val in zip(eqn.outvars, vals):
                    cv.consts[cv.var_name(ov)] = np.asarray(val)
            else:
                cv.consts[cv.var_name(eqn.outvars[0])] = np.asarray(vals)
            continue

        if prim not in _EMITTERS:
            raise NotImplementedError(f"ONNX export: primitive '{prim}'")
        ins = [cv.inp(v) for v in eqn.invars]
        outs = [cv.var_name(v) for v in eqn.outvars]
        _EMITTERS[prim](cv, eqn, ins, outs)


def trace_to_graph(
    fn,
    example_args: Sequence[np.ndarray],
    *,
    input_names: Optional[Sequence[str]] = None,
    output_names: Optional[Sequence[str]] = None,
    graph_name: str = "graph",
    prefix: str = "",
) -> Graph:
    """Trace ``fn(*example_args)`` into an ONNX :class:`Graph`.

    Internal value names carry ``prefix`` so graphs from separate traces can
    be merged (``merge_graphs``) or embedded as Loop bodies
    (``onnx_loop.py``) without collisions; graph input/output names are the
    caller's verbatim.
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    cv = _Converter(graph_name, prefix=prefix)

    if input_names is None:
        input_names = [f"in{i}" for i in range(len(jaxpr.invars))]
    if output_names is None:
        output_names = [f"out{i}" for i in range(len(jaxpr.outvars))]
    if len(input_names) != len(jaxpr.invars):
        raise ValueError(
            f"{len(jaxpr.invars)} graph inputs but {len(input_names)} names"
        )
    if len(output_names) != len(jaxpr.outvars):
        raise ValueError(
            f"{len(jaxpr.outvars)} graph outputs but {len(output_names)} names"
        )

    graph_inputs = []
    for v, name, ex in zip(jaxpr.invars, input_names, example_args):
        cv.names[id(v)] = name
        dt = _np_dtype(v.aval)
        graph_inputs.append((name, NP_TO_ONNX[dt], list(v.aval.shape)))

    _convert_jaxpr(cv, jaxpr, closed.consts)

    graph_outputs = []
    out_map = []
    for v, name in zip(jaxpr.outvars, output_names):
        src = cv.var_name(v)
        const = cv.read(v)
        if const is not None:
            cv.materialize(src)
        out_map.append((src, name))
        dt = _np_dtype(v.aval)
        graph_outputs.append((name, NP_TO_ONNX[dt], list(v.aval.shape)))
    for src, name in out_map:
        cv.node("Identity", [src], [name])

    return Graph(
        graph_name, cv.nodes, graph_inputs, graph_outputs,
        list(cv.initializers.values()),
    )


def export_onnx(
    fn,
    example_args: Sequence[np.ndarray],
    path,
    *,
    input_names: Optional[Sequence[str]] = None,
    output_names: Optional[Sequence[str]] = None,
    graph_name: str = "graph",
    opset: int = 17,
    optimize: bool = True,
) -> bytes:
    """Trace ``fn(*example_args)`` and write an ONNX model to ``path``.

    Shapes are taken from the example args (static graphs, like the
    reference's fixed-axis exports with dynamic batch disabled).
    ``optimize`` runs the constant-fold / dead-value passes before writing
    (the reference runs onnxsim on every artifact, acoustic_exporter.py:336).
    Returns the serialized model bytes.
    """
    g = trace_to_graph(
        fn, example_args, input_names=input_names, output_names=output_names,
        graph_name=graph_name,
    )
    if optimize:
        from .graph_passes import simplify_graph

        g = simplify_graph(g)
    data = build_model(g, opset=opset)
    if path is not None:
        from pathlib import Path

        Path(path).write_bytes(data)
    return data
