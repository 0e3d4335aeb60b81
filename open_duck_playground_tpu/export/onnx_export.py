"""Policy -> ONNX export (opset 11), no TensorFlow/tf2onnx dependency.

Output contract matches the reference deployment artifact
(export_onnx.py:170-188): input "obs" shaped (1, obs_size), output
"continuous_actions" = tanh(loc of split logits), with the running-normalizer
mean/std baked in as Sub/Div nodes; swish hidden activations emitted as
Sigmoid+Mul (exactly how tf2onnx lowers them).
"""

from __future__ import annotations

import numpy as np

from open_duck_playground_tpu.export import onnx_proto as OP


def build_policy_onnx(
    mean: np.ndarray,
    std: np.ndarray,
    layers,  # list of (kernel (in,out), bias (out,)) from first to last
    obs_size: int,
    act_size: int,
) -> bytes:
    nodes = []
    inits = [
        OP.tensor("obs_mean", mean.reshape(1, -1)),
        OP.tensor("obs_std", std.reshape(1, -1)),
    ]
    nodes.append(OP.node("Sub", ["obs", "obs_mean"], ["obs_centered"]))
    nodes.append(OP.node("Div", ["obs_centered", "obs_std"], ["obs_norm"]))

    x = "obs_norm"
    n = len(layers)
    for i, (kernel, bias) in enumerate(layers):
        inits.append(OP.tensor(f"w_{i}", kernel))
        inits.append(OP.tensor(f"b_{i}", bias.reshape(1, -1)))
        nodes.append(OP.node("MatMul", [x, f"w_{i}"], [f"mm_{i}"]))
        nodes.append(OP.node("Add", [f"mm_{i}", f"b_{i}"], [f"dense_{i}"]))
        x = f"dense_{i}"
        if i < n - 1:  # swish
            nodes.append(OP.node("Sigmoid", [x], [f"sig_{i}"]))
            nodes.append(OP.node("Mul", [x, f"sig_{i}"], [f"swish_{i}"]))
            x = f"swish_{i}"

    nodes.append(
        OP.node(
            "Split",
            [x],
            ["loc", "log_scale"],
            attrs_int={"axis": 1},
            attrs_ints={"split": [act_size, act_size]},
        )
    )
    nodes.append(OP.node("Tanh", ["loc"], ["continuous_actions"]))

    g = OP.graph(
        nodes,
        "duck_policy",
        inits,
        inputs=[OP.value_info("obs", (1, obs_size))],
        outputs=[OP.value_info("continuous_actions", (1, act_size))],
    )
    return OP.model(g, opset=11)


def export_policy(variables, act_size, ppo_params, obs_size, output_path):
    """variables = (normalizer, params) as produced by train.ppo / checkpoints
    (normalizer.mean['state'] / .std['state'], params['policy']['hidden_i'])."""
    normalizer, params = variables
    mean = np.asarray(normalizer.mean["state"])
    std = np.asarray(normalizer.std["state"])
    policy = params["policy"] if "policy" in params else params
    layers = []
    for i in range(len(policy)):
        p = policy[f"hidden_{i}"]
        layers.append((np.asarray(p["kernel"]), np.asarray(p["bias"])))
    assert layers[-1][1].shape[0] == 2 * act_size, (
        layers[-1][1].shape,
        act_size,
    )
    blob = build_policy_onnx(mean, std, layers, obs_size, act_size)
    with open(output_path, "wb") as f:
        f.write(blob)
    print(f"Exported ONNX policy: {output_path} ({len(blob)} bytes)")
    return output_path
