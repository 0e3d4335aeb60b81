"""Strict ONNX artifact validator — a stand-in for loading the exported
policy into onnxruntime (the reference's deployment contract,
playground/common/onnx_infer.py:7-9), usable in this image where
onnx/onnxruntime are not installed.

Three layers of checking, mirroring what onnxruntime's loader does:

1. **Wire format**: the bytes are parsed by the *real* protobuf runtime
   (google.protobuf) against protoc-generated code for a faithful subset of
   the official onnx.proto3 schema (onnx_schema.proto). A malformed varint,
   a truncated length-delimited field, or a wrong wire type fails here.
   Unknown fields anywhere in the tree mean the writer used a field number
   outside the ONNX schema — rejected.
2. **Model/graph well-formedness** (onnx.checker equivalents): ir_version,
   a default-domain opset import, tensor dtype/dims/raw_data-length
   consistency, attribute type-tag vs payload consistency, SSA form with
   topologically sorted nodes, resolvable inputs, unique value names.
3. **Shape inference** over the opset-11 ops the exporter emits
   (Sub/Div/MatMul/Add/Mul/Sigmoid/Tanh/Split): recomputes every
   intermediate shape from the declared graph input and the initializers
   and checks the declared graph outputs match.

`validate(blob)` raises OnnxValidationError with a precise message, or
returns a summary dict on success.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from open_duck_playground_tpu.export import onnx_schema_pb2 as pb

FLOAT = pb.TensorProto.FLOAT

# bytes per element for TensorProto data types that may appear in raw_data
_DTYPE_SIZE = {
    pb.TensorProto.FLOAT: 4,
    pb.TensorProto.UINT8: 1,
    pb.TensorProto.INT8: 1,
    pb.TensorProto.UINT16: 2,
    pb.TensorProto.INT16: 2,
    pb.TensorProto.INT32: 4,
    pb.TensorProto.INT64: 8,
    pb.TensorProto.BOOL: 1,
    pb.TensorProto.FLOAT16: 2,
    pb.TensorProto.DOUBLE: 8,
    pb.TensorProto.UINT32: 4,
    pb.TensorProto.UINT64: 8,
    pb.TensorProto.BFLOAT16: 2,
}

# (min_inputs, max_inputs, n_outputs) for every op the exporter can emit,
# per the opset-11 operator schemas
_OP_ARITY = {
    "Sub": (2, 2, 1),
    "Div": (2, 2, 1),
    "Add": (2, 2, 1),
    "Mul": (2, 2, 1),
    "MatMul": (2, 2, 1),
    "Sigmoid": (1, 1, 1),
    "Tanh": (1, 1, 1),
    "Split": (1, 1, None),  # variadic outputs
}


class OnnxValidationError(ValueError):
    pass


def _fail(msg: str):
    raise OnnxValidationError(msg)


def _check_no_unknown_fields(msg, path: str):
    from google.protobuf.unknown_fields import UnknownFieldSet

    if len(UnknownFieldSet(msg)):
        fields = [(f.field_number, f.wire_type) for f in UnknownFieldSet(msg)]
        _fail(f"{path}: unknown protobuf fields {fields} — outside ONNX schema")
    for fd, value in msg.ListFields():
        if fd.type != fd.TYPE_MESSAGE:
            continue
        if fd.is_repeated:
            for i, sub in enumerate(value):
                _check_no_unknown_fields(sub, f"{path}.{fd.name}[{i}]")
        else:
            _check_no_unknown_fields(value, f"{path}.{fd.name}")


def _tensor_shape(vi: pb.ValueInfoProto, path: str) -> Tuple[int, ...]:
    if vi.type.WhichOneof("value") != "tensor_type":
        _fail(f"{path} '{vi.name}': TypeProto must be tensor_type")
    tt = vi.type.tensor_type
    if tt.elem_type != FLOAT:
        _fail(f"{path} '{vi.name}': elem_type {tt.elem_type} != FLOAT")
    dims = []
    for i, d in enumerate(tt.shape.dim):
        which = d.WhichOneof("value")
        if which == "dim_value":
            if d.dim_value <= 0:
                _fail(f"{path} '{vi.name}': dim[{i}] = {d.dim_value} <= 0")
            dims.append(int(d.dim_value))
        elif which == "dim_param":
            dims.append(-1)  # symbolic
        else:
            _fail(f"{path} '{vi.name}': dim[{i}] has neither value nor param")
    return tuple(dims)


def _check_attribute(a: pb.AttributeProto, node_name: str):
    if not a.name:
        _fail(f"node '{node_name}': attribute with empty name")
    # onnx.checker: `type` must be set and exactly the matching payload
    # field populated
    payload = {
        pb.AttributeProto.FLOAT: True,  # proto3 scalar: 0.0 is valid
        pb.AttributeProto.INT: True,  # proto3 scalar: 0 is valid
        pb.AttributeProto.STRING: True,
        pb.AttributeProto.TENSOR: a.HasField("t"),
        pb.AttributeProto.GRAPH: a.HasField("g"),
        pb.AttributeProto.FLOATS: len(a.floats) > 0,
        pb.AttributeProto.INTS: len(a.ints) > 0,
        pb.AttributeProto.STRINGS: len(a.strings) > 0,
    }
    if a.type == pb.AttributeProto.UNDEFINED:
        _fail(f"node '{node_name}' attr '{a.name}': type UNDEFINED")
    if a.type not in payload or not payload[a.type]:
        _fail(
            f"node '{node_name}' attr '{a.name}': type tag "
            f"{pb.AttributeProto.AttributeType.Name(a.type)} does not match "
            f"its populated payload"
        )
    # no stray payloads of other kinds
    stray = []
    if a.type != pb.AttributeProto.INTS and len(a.ints):
        stray.append("ints")
    if a.type != pb.AttributeProto.FLOATS and len(a.floats):
        stray.append("floats")
    if a.type != pb.AttributeProto.TENSOR and a.HasField("t"):
        stray.append("t")
    if stray:
        _fail(f"node '{node_name}' attr '{a.name}': stray payload {stray}")


def _broadcast(s1, s2, ctx: str) -> Tuple[int, ...]:
    """Numpy-style multidirectional broadcast (the opset-11 rule for
    elementwise binary ops)."""
    out = []
    for d1, d2 in zip((1,) * (len(s2) - len(s1)) + s1, (1,) * (len(s1) - len(s2)) + s2):
        if d1 == d2 or d2 == 1:
            out.append(d1)
        elif d1 == 1:
            out.append(d2)
        else:
            _fail(f"{ctx}: shapes {s1} and {s2} are not broadcastable")
    return tuple(out)


def validate(blob: bytes) -> dict:
    """Validate an exported ONNX artifact. Raises OnnxValidationError on any
    defect a standards-compliant consumer could reject; returns a summary
    dict (op counts, parameter count, io shapes) on success."""
    m = pb.ModelProto()
    try:
        m.ParseFromString(blob)
    except Exception as e:
        _fail(f"protobuf parse failed: {e}")
    _check_no_unknown_fields(m, "model")

    if not 3 <= m.ir_version <= 10:
        _fail(f"ir_version {m.ir_version} outside supported range [3, 10]")
    default_opsets = [o for o in m.opset_import if o.domain == ""]
    if len(default_opsets) != 1:
        _fail(f"expected exactly one default-domain opset import, got {m.opset_import}")
    opset = default_opsets[0].version
    if opset < 1:
        _fail(f"opset version {opset} < 1")
    if not m.HasField("graph"):
        _fail("model has no graph")
    g = m.graph

    # ---- initializers
    inits: Dict[str, Tuple[int, ...]] = {}
    n_params = 0
    for t in g.initializer:
        if not t.name:
            _fail("initializer with empty name")
        if t.name in inits:
            _fail(f"duplicate initializer '{t.name}'")
        if t.data_type not in _DTYPE_SIZE:
            _fail(f"initializer '{t.name}': invalid data_type {t.data_type}")
        dims = tuple(int(d) for d in t.dims)
        if any(d < 0 for d in dims):
            _fail(f"initializer '{t.name}': negative dim in {dims}")
        n_elem = int(np.prod(dims)) if dims else 1
        typed = (
            len(t.float_data)
            or len(t.int32_data)
            or len(t.int64_data)
            or len(t.double_data)
            or len(t.uint64_data)
            or len(t.string_data)
        )
        if t.raw_data:
            if typed:
                _fail(f"initializer '{t.name}': both raw_data and typed data set")
            want = n_elem * _DTYPE_SIZE[t.data_type]
            if len(t.raw_data) != want:
                _fail(
                    f"initializer '{t.name}': raw_data is {len(t.raw_data)} "
                    f"bytes, dims {dims} require {want}"
                )
        elif typed != n_elem:
            _fail(f"initializer '{t.name}': {typed} typed values, dims need {n_elem}")
        if t.data_location not in (0,):  # DEFAULT only; EXTERNAL unsupported
            _fail(f"initializer '{t.name}': external data_location")
        inits[t.name] = dims
        n_params += n_elem

    # ---- graph io
    shapes: Dict[str, Tuple[int, ...]] = dict(inits)
    for vi in g.input:
        if not vi.name:
            _fail("graph input with empty name")
        shapes[vi.name] = _tensor_shape(vi, "graph input")
    declared_out = {vi.name: _tensor_shape(vi, "graph output") for vi in g.output}
    if not declared_out:
        _fail("graph has no outputs")

    # ---- nodes: SSA, topological order, arity, attributes, shape inference
    op_counts: Dict[str, int] = {}
    for k, node in enumerate(g.node):
        ctx = f"node[{k}] '{node.name or node.op_type}'"
        if node.domain not in ("", "ai.onnx"):
            _fail(f"{ctx}: non-default domain '{node.domain}'")
        if node.op_type not in _OP_ARITY:
            _fail(f"{ctx}: op '{node.op_type}' not in the exporter's opset-11 set")
        lo, hi, n_out = _OP_ARITY[node.op_type]
        if not lo <= len(node.input) <= hi:
            _fail(f"{ctx}: {len(node.input)} inputs, schema wants [{lo},{hi}]")
        if n_out is not None and len(node.output) != n_out:
            _fail(f"{ctx}: {len(node.output)} outputs, schema wants {n_out}")
        for a in node.attribute:
            _check_attribute(a, node.name or node.op_type)
        for i in node.input:
            if i not in shapes:
                _fail(
                    f"{ctx}: input '{i}' is not a graph input, initializer, "
                    f"or earlier node output (graph not topologically sorted "
                    f"or dangling reference)"
                )
        op_counts[node.op_type] = op_counts.get(node.op_type, 0) + 1

        # shape inference for the supported op set
        attrs = {a.name: a for a in node.attribute}
        if node.op_type in ("Sub", "Div", "Add", "Mul"):
            out_shapes = [
                _broadcast(shapes[node.input[0]], shapes[node.input[1]], ctx)
            ]
        elif node.op_type in ("Sigmoid", "Tanh"):
            out_shapes = [shapes[node.input[0]]]
        elif node.op_type == "MatMul":
            s1, s2 = shapes[node.input[0]], shapes[node.input[1]]
            if len(s1) != 2 or len(s2) != 2:
                _fail(f"{ctx}: only 2-D MatMul expected, got {s1} x {s2}")
            if s1[1] != s2[0] and -1 not in (s1[1], s2[0]):
                _fail(f"{ctx}: MatMul inner dims mismatch {s1} x {s2}")
            out_shapes = [(s1[0], s2[1])]
        elif node.op_type == "Split":
            if "axis" not in attrs:
                _fail(f"{ctx}: Split without axis attribute")
            axis = int(attrs["axis"].i)
            s = shapes[node.input[0]]
            if not -len(s) <= axis < len(s):
                _fail(f"{ctx}: Split axis {axis} out of range for {s}")
            axis %= len(s)
            if "split" in attrs:
                parts = [int(v) for v in attrs["split"].ints]
                if len(parts) != len(node.output):
                    _fail(f"{ctx}: {len(parts)} split sizes, {len(node.output)} outputs")
                if s[axis] != -1 and sum(parts) != s[axis]:
                    _fail(f"{ctx}: split sizes {parts} don't sum to dim {s[axis]}")
            else:
                if s[axis] != -1 and s[axis] % len(node.output):
                    _fail(f"{ctx}: dim {s[axis]} not divisible into {len(node.output)}")
                parts = [s[axis] // len(node.output)] * len(node.output)
            out_shapes = [s[:axis] + (p,) + s[axis + 1 :] for p in parts]
        else:  # pragma: no cover — _OP_ARITY gate above
            _fail(f"{ctx}: no shape rule for '{node.op_type}'")

        for o, os_ in zip(node.output, out_shapes):
            if not o:
                _fail(f"{ctx}: empty output name")
            if o in shapes:
                _fail(f"{ctx}: output '{o}' redefines an existing value (not SSA)")
            shapes[o] = os_

    for name, want in declared_out.items():
        if name not in shapes:
            _fail(f"graph output '{name}' is produced by no node")
        got = shapes[name]
        if len(got) != len(want) or any(
            w != -1 and gdim != -1 and w != gdim for w, gdim in zip(want, got)
        ):
            _fail(f"graph output '{name}': declared {want}, inferred {got}")

    return {
        "ir_version": int(m.ir_version),
        "opset": int(opset),
        "n_nodes": len(g.node),
        "n_params": n_params,
        "op_counts": op_counts,
        "inputs": {vi.name: _tensor_shape(vi, "graph input") for vi in g.input},
        "outputs": declared_out,
    }


def validate_file(path: str) -> dict:
    with open(path, "rb") as f:
        return validate(f.read())
