"""Standards-compliance tests for the hand-written ONNX wire format.

The deployment contract is onnxruntime loading the exported file (reference
playground/common/onnx_infer.py:7-9). onnx/onnxruntime are not installed in
this image, so these tests drive the next-strongest check: the real
google.protobuf runtime parsing the bytes against protoc-generated code for
the official onnx.proto3 field layout, plus onnx.checker-style graph
validation and full shape inference (export/onnx_validate.py). Any encoding
quirk onnxruntime would reject must fail here."""

import numpy as np
import pytest

from open_duck_playground_tpu.export import onnx_proto as OP
from open_duck_playground_tpu.export import onnx_validate as V
from open_duck_playground_tpu.export.onnx_export import build_policy_onnx


def _fresh_blob(obs=102, act=14, hidden=(32, 32)):
    rng = np.random.default_rng(0)
    sizes = (obs,) + hidden + (2 * act,)
    layers = [
        (
            rng.normal(size=(sizes[i], sizes[i + 1])).astype(np.float32),
            rng.normal(size=(sizes[i + 1],)).astype(np.float32),
        )
        for i in range(len(sizes) - 1)
    ]
    mean = rng.normal(size=obs).astype(np.float32)
    std = (np.abs(rng.normal(size=obs)) + 0.1).astype(np.float32)
    return build_policy_onnx(mean, std, layers, obs, act)


def test_fresh_export_is_standards_valid():
    blob = _fresh_blob()
    info = V.validate(blob)
    assert info["ir_version"] == 7
    assert info["opset"] == 11
    assert info["inputs"] == {"obs": (1, 102)}
    assert info["outputs"] == {"continuous_actions": (1, 14)}
    # 2 normalizer nodes + 3x(MatMul+Add) + 2x(Sigmoid+Mul) + Split + Tanh
    assert info["op_counts"] == {
        "Sub": 1, "Div": 1, "MatMul": 3, "Add": 3,
        "Sigmoid": 2, "Mul": 2, "Split": 1, "Tanh": 1,
    }


def test_shipped_artifacts_are_standards_valid():
    """Validates BYTES ON DISK, not a fresh in-process export: the committed
    fixture (tests/fixtures/duck_policy_fixture.onnx, real policy shape
    obs=101/act=14) pins the wire format across encoder changes — if the
    encoder's output drifts, the fresh-export test keeps passing while this
    one catches old shipped artifacts becoming unreadable claims. Any local
    training outputs under runs/ are validated too when present (never a
    skip: the fixture leg always runs)."""
    import glob
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    fixture = repo / "tests" / "fixtures" / "duck_policy_fixture.onnx"
    info = V.validate_file(str(fixture))
    assert info["opset"] == 11
    assert info["inputs"] == {"obs": (1, 101)}
    assert info["outputs"] == {"continuous_actions": (1, 14)}

    paths = sorted(glob.glob(str(repo / "runs" / "**" / "*.onnx"), recursive=True))
    for p in paths[-3:]:
        info = V.validate_file(p)
        assert info["opset"] == 11
        assert "continuous_actions" in info["outputs"]


def test_roundtrip_against_own_parser():
    """The repo's own decoder and the protobuf-schema path must agree on the
    graph structure (guards both against a shared misreading of the spec in
    one direction)."""
    blob = _fresh_blob()
    own = OP.parse_model(blob)
    ref = V.validate(blob)
    assert len(own["nodes"]) == ref["n_nodes"]
    assert sum(int(np.prod(a.shape)) for a in own["initializers"].values()) == (
        ref["n_params"]
    )
    assert set(own["inputs"]) == set(ref["inputs"])
    assert set(own["outputs"]) == set(ref["outputs"])


def test_validator_rejects_truncation():
    blob = _fresh_blob()
    with pytest.raises(V.OnnxValidationError):
        V.validate(blob[: len(blob) // 2])


def test_validator_rejects_bad_field_number():
    """A field number outside the ONNX schema (the exact failure mode a
    hand-written encoder can have) must be caught as unknown fields."""
    blob = _fresh_blob()
    # append a length-delimited field 99 at ModelProto level
    bad = blob + OP._len_field(99, b"rogue")
    with pytest.raises(V.OnnxValidationError, match="unknown"):
        V.validate(bad)


def test_validator_rejects_wrong_raw_data_length():
    t = OP.tensor("w", np.zeros((3, 4), np.float32))
    # corrupt: claim dims (3,4) but provide one fewer float
    t_bad = b""
    for d in (3, 4):
        t_bad += OP._int_field(1, d)
    t_bad += OP._int_field(2, OP.FLOAT)
    t_bad += OP._len_field(9, b"\x00" * (4 * 11))
    t_bad += OP._str_field(8, "w")
    g = OP.graph(
        [OP.node("Tanh", ["x"], ["y"])],
        "g",
        [t_bad],
        inputs=[OP.value_info("x", (1, 4))],
        outputs=[OP.value_info("y", (1, 4))],
    )
    with pytest.raises(V.OnnxValidationError, match="raw_data"):
        V.validate(OP.model(g))
    del t


def test_validator_rejects_dangling_input_and_non_ssa():
    g = OP.graph(
        [OP.node("Tanh", ["missing"], ["y"])],
        "g",
        [],
        inputs=[OP.value_info("x", (1, 4))],
        outputs=[OP.value_info("y", (1, 4))],
    )
    with pytest.raises(V.OnnxValidationError, match="not a graph input"):
        V.validate(OP.model(g))

    g2 = OP.graph(
        [OP.node("Tanh", ["x"], ["x"])],
        "g",
        [],
        inputs=[OP.value_info("x", (1, 4))],
        outputs=[OP.value_info("x", (1, 4))],
    )
    with pytest.raises(V.OnnxValidationError, match="SSA"):
        V.validate(OP.model(g2))


def test_validator_rejects_shape_mismatch():
    """Declared output shape inconsistent with inference must fail — this is
    the check that catches transposed kernels or a wrong split size."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(4, 6)).astype(np.float32)
    g = OP.graph(
        [OP.node("MatMul", ["x", "w"], ["y"])],
        "g",
        [OP.tensor("w", w)],
        inputs=[OP.value_info("x", (1, 4))],
        outputs=[OP.value_info("y", (1, 7))],  # wrong: should be (1, 6)
    )
    with pytest.raises(V.OnnxValidationError, match="declared"):
        V.validate(OP.model(g))

    # wrong split sizes
    g2 = OP.graph(
        [
            OP.node(
                "Split",
                ["x"],
                ["a", "b"],
                attrs_int={"axis": 1},
                attrs_ints={"split": [3, 3]},  # input dim is 4
            )
        ],
        "g",
        [],
        inputs=[OP.value_info("x", (1, 4))],
        outputs=[OP.value_info("a", (1, 3)), OP.value_info("b", (1, 3))],
    )
    with pytest.raises(V.OnnxValidationError, match="split"):
        V.validate(OP.model(g2))
