"""Export trained models to standard `.onnx` files (jaxpr -> ONNX).

Reference analog: `python/hetu/onnx/hetu2onnx.py` + 26 per-op handlers
(`onnx_opset/*.py`) walking the dataflow graph and emitting ONNX nodes via
the `onnx` python package. The TPU rebuild has no graph IR to walk and no
onnx package — instead the dense tower's **jaxpr** (the functional trace
XLA itself consumes) is translated primitive-by-primitive into ONNX nodes,
and the protobuf bytes are written by our own codec (`onnx/proto.py`).
This is strictly more general than per-graph-op handlers: any tower
expressible in the supported primitive set exports without model-specific
code.

Exported graph shape (inference):
    sparse_ids:int64[B,F], dense_x:float[B,ND]
    emb = Gather(table, sparse_ids)          # the embedding lookup
    logits = <tower jaxpr as ONNX nodes>
    probs = Sigmoid(logits)
The embedding table and every dense param ride as initializers. Import /
serving-side execution lives in `onnx/runtime.py` (pure numpy), which the
round-trip tests run against the live engine's predictions.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from herald_tpu.onnx import proto

OPSET = 12
_DT = {np.dtype("float32"): proto.DT_FLOAT,
       np.dtype("int64"): proto.DT_INT64,
       np.dtype("int32"): proto.DT_INT32,
       np.dtype("bool"): proto.DT_BOOL,
       np.dtype("float64"): proto.DT_DOUBLE}


def _tensor(name: str, arr: np.ndarray) -> dict:
    arr = np.asarray(arr)
    if arr.dtype == np.dtype("float64"):
        arr = arr.astype(np.float32)
    if arr.dtype not in _DT:
        raise ValueError(f"unsupported initializer dtype {arr.dtype}")
    return {"name": name, "dims": list(arr.shape),
            "data_type": _DT[arr.dtype],
            "raw_data": arr.tobytes()}       # little-endian per spec


def _vinfo(name: str, dtype: int, shape) -> dict:
    return {"name": name, "type": {"tensor_type": {
        "elem_type": dtype,
        "shape": {"dim": [{"dim_value": int(d)} for d in shape]}}}}


class _Builder:
    def __init__(self):
        self.nodes: List[dict] = []
        self.inits: List[dict] = []
        self.counter = 0

    def fresh(self, hint: str = "t") -> str:
        self.counter += 1
        return f"{hint}_{self.counter}"

    def init_const(self, arr, hint="const") -> str:
        name = self.fresh(hint)
        self.inits.append(_tensor(name, np.asarray(arr)))
        return name

    def node(self, op: str, inputs: List[str], attrs: Optional[dict] = None,
             hint: Optional[str] = None) -> str:
        out = self.fresh(hint or op.lower())
        attributes = []
        for k, v in (attrs or {}).items():
            if isinstance(v, int):
                attributes.append({"name": k, "i": v,
                                   "type": proto.ATTR_INT})
            elif isinstance(v, float):
                attributes.append({"name": k, "f": v,
                                   "type": proto.ATTR_FLOAT})
            elif isinstance(v, (list, tuple)):
                attributes.append({"name": k, "ints": [int(x) for x in v],
                                   "type": proto.ATTR_INTS})
            else:
                raise ValueError(f"attr {k}={v!r}")
        self.nodes.append({"input": inputs, "output": [out],
                           "name": out, "op_type": op,
                           **({"attribute": attributes} if attributes
                              else {})})
        return out


def _is_zero_literal(var) -> bool:
    from jax._src.core import Literal
    return isinstance(var, Literal) and np.ndim(var.val) == 0 \
        and float(var.val) == 0.0


def _convert_jaxpr(b: _Builder, jaxpr, env: Dict) -> List[str]:
    """Translate one (open) jaxpr's eqns; env maps jaxpr vars -> ONNX
    names. Returns the ONNX names of the jaxpr outputs."""
    from jax._src.core import Literal

    def read(v) -> str:
        if isinstance(v, Literal):
            return b.init_const(np.asarray(v.val), "lit")
        return env[v]

    for eqn in jaxpr.eqns:
        p = str(eqn.primitive)
        if p in ("custom_jvp_call", "custom_vjp_call", "closed_call"):
            inner = eqn.params.get("call_jaxpr")
            inner_jaxpr = inner.jaxpr
            ienv = dict(zip(inner_jaxpr.invars,
                            [read(v) for v in eqn.invars]))
            for cv, cval in zip(inner_jaxpr.constvars, inner.consts):
                ienv[cv] = b.init_const(np.asarray(cval), "const")
            outs = _convert_jaxpr(b, inner_jaxpr, ienv)
            for ov, name in zip(eqn.outvars, outs):
                env[ov] = name
            continue
        if p in ("pjit", "jit"):
            inner = eqn.params["jaxpr"]
            inner_jaxpr = inner.jaxpr
            ienv = dict(zip(inner_jaxpr.invars,
                            [read(v) for v in eqn.invars]))
            for cv, cval in zip(inner_jaxpr.constvars, inner.consts):
                ienv[cv] = b.init_const(np.asarray(cval), "const")
            outs = _convert_jaxpr(b, inner_jaxpr, ienv)
            for ov, name in zip(eqn.outvars, outs):
                env[ov] = name
            continue

        ins = [read(v) for v in eqn.invars]
        if p == "add":
            out = b.node("Add", ins)
        elif p == "sub":
            out = b.node("Sub", ins)
        elif p == "mul":
            out = b.node("Mul", ins)
        elif p == "div":
            out = b.node("Div", ins)
        elif p == "neg":
            out = b.node("Neg", ins)
        elif p == "exp":
            out = b.node("Exp", ins)
        elif p == "log":
            out = b.node("Log", ins)
        elif p == "tanh":
            out = b.node("Tanh", ins)
        elif p == "logistic":
            out = b.node("Sigmoid", ins)
        elif p == "max":
            if _is_zero_literal(eqn.invars[1]):
                out = b.node("Relu", ins[:1])
            elif _is_zero_literal(eqn.invars[0]):
                out = b.node("Relu", ins[1:])
            else:
                out = b.node("Max", ins)
        elif p == "min":
            out = b.node("Min", ins)
        elif p == "integer_pow":
            y = int(eqn.params["y"])
            if y == 2:
                out = b.node("Mul", [ins[0], ins[0]])
            else:
                exp = b.init_const(np.float32(y), "pow")
                out = b.node("Pow", [ins[0], exp])
        elif p == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            ndl = len(eqn.invars[0].aval.shape)
            if lb or rb or lc != (ndl - 1,) or rc != (0,):
                raise NotImplementedError(
                    f"dot_general {eqn.params['dimension_numbers']} has no "
                    f"MatMul form (batch/contraction layout unsupported)")
            out = b.node("MatMul", ins)
        elif p == "reshape":
            shape = b.init_const(
                np.asarray(eqn.params["new_sizes"], np.int64), "shape")
            out = b.node("Reshape", [ins[0], shape])
        elif p == "concatenate":
            out = b.node("Concat", ins,
                         {"axis": int(eqn.params["dimension"])})
        elif p == "reduce_sum":
            out = b.node("ReduceSum", ins,
                         {"axes": list(eqn.params["axes"]), "keepdims": 0})
        elif p == "slice":
            starts = eqn.params["start_indices"]
            ends = eqn.params["limit_indices"]
            strides = eqn.params["strides"] or (1,) * len(starts)
            axes = list(range(len(starts)))
            out = b.node("Slice", [
                ins[0],
                b.init_const(np.asarray(starts, np.int64), "starts"),
                b.init_const(np.asarray(ends, np.int64), "ends"),
                b.init_const(np.asarray(axes, np.int64), "axes"),
                b.init_const(np.asarray(strides, np.int64), "steps")])
        elif p == "squeeze":
            out = b.node("Squeeze", ins,
                         {"axes": list(eqn.params["dimensions"])})
        elif p == "broadcast_in_dim":
            shape = eqn.params["shape"]
            bdims = eqn.params["broadcast_dimensions"]
            # reshape to rank(shape) with operand dims at bdims, 1 elsewhere
            mid = [1] * len(shape)
            for od, d in enumerate(bdims):
                mid[d] = eqn.invars[0].aval.shape[od]
            cur = ins[0]
            if tuple(mid) != tuple(eqn.invars[0].aval.shape):
                cur = b.node("Reshape", [
                    cur, b.init_const(np.asarray(mid, np.int64), "shape")])
            out = b.node("Expand", [
                cur, b.init_const(np.asarray(shape, np.int64), "shape")])
        elif p == "convert_element_type":
            out = b.node("Cast", ins,
                         {"to": _DT[np.dtype(eqn.params["new_dtype"])]})
        elif p == "transpose":
            out = b.node("Transpose", ins,
                         {"perm": list(eqn.params["permutation"])})
        elif p == "copy":
            out = b.node("Identity", ins)
        else:
            raise NotImplementedError(
                f"jaxpr primitive {p!r} has no ONNX mapping; extend "
                f"herald_tpu/onnx/export.py (params: {dict(eqn.params)})")
        env[eqn.outvars[0]] = out
    return [env[v] if not hasattr(v, "val")
            else b.init_const(np.asarray(v.val), "lit")
            for v in jaxpr.outvars]


def export_inference(model, dense_params, table_logical: np.ndarray,
                     path: str, batch_size: int = 256,
                     doc: str = "") -> None:
    """Write `<path>` as a standard .onnx inference graph for `model`.

    dense_params: the trained tower params (host pytree of np arrays);
    table_logical: the embedding table in LOGICAL row order [rows, W]
    (engine states: `eng.exchange.to_logical(np.asarray(state.table))`).
    """
    B = batch_size
    F = model.spec.num_sparse
    ND = max(model.spec.num_dense, 0)
    W = table_logical.shape[1]
    b = _Builder()

    table_name = "embedding_table"
    b.inits.append(_tensor(table_name,
                           np.asarray(table_logical, np.float32)))
    emb_name = b.node("Gather", [table_name, "sparse_ids"],
                      {"axis": 0}, hint="emb")

    import jax.numpy as jnp
    params = jax.tree.map(np.asarray, dense_params)
    closed = jax.make_jaxpr(
        lambda e, d: model.apply(params, e, d))(
        jnp.zeros((B, F, W), jnp.float32), jnp.zeros((B, ND), jnp.float32))
    env = {closed.jaxpr.invars[0]: emb_name,
           closed.jaxpr.invars[1]: "dense_x"}
    for cv, cval in zip(closed.jaxpr.constvars, closed.consts):
        env[cv] = b.init_const(np.asarray(cval), "param")
    (logits,) = _convert_jaxpr(b, closed.jaxpr, env)
    b.nodes.append({"input": [logits], "output": ["probs"],
                    "name": "probs", "op_type": "Sigmoid"})

    graph = {
        "name": f"herald_tpu_{model.name}",
        "node": b.nodes,
        "initializer": b.inits,
        "input": [_vinfo("sparse_ids", proto.DT_INT64, (B, F)),
                  _vinfo("dense_x", proto.DT_FLOAT, (B, ND))],
        "output": [_vinfo("probs", proto.DT_FLOAT, (B,))],
        "doc_string": doc,
    }
    m = {"ir_version": 8,
         "producer_name": "herald_tpu",
         "producer_version": "1.0",
         "model_version": 1,
         "graph": graph,
         "opset_import": [{"domain": "", "version": OPSET}]}
    with open(path, "wb") as f:
        f.write(proto.encode("ModelProto", m))


def export_state(engine, state, path: str,
                 batch_size: Optional[int] = None) -> None:
    """Export a live engine's TrainState (plain or TP; cached states must
    `sync_cache` first so the table holds the authoritative rows)."""
    if isinstance(state.table, jax.Array) \
            and not state.table.is_fully_addressable:
        raise ValueError(
            "export_state needs the full table on this process; in "
            "multi-process runs save a checkpoint instead and export "
            "from a single-process load (load_checkpoint -> "
            "export_state)")
    table = engine.exchange.to_logical(np.asarray(state.table)) \
        if engine.num_shards > 1 else \
        np.asarray(state.table)[:engine.num_rows]
    dense = jax.tree.map(np.asarray, state.dense)
    export_inference(engine.model, dense, table, path,
                     batch_size=batch_size or engine.cfg.batch_size)
