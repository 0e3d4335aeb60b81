"""Pure-numpy ONNX executor for exported policies (the `OnnxInfer`
replacement — reference onnx_infer.py:7-21 — since onnxruntime is not a
dependency of this framework). Executes the small op-set the exporter emits;
also usable for any tf2onnx-exported reference policy built from the same
ops. A C++ runtime with the same interface lives in `csrc/` for deployment.
"""

from __future__ import annotations

import time

import numpy as np

from open_duck_playground_tpu.export import onnx_proto as OP


class OnnxPolicy:
    def __init__(self, model_path: str):
        with open(model_path, "rb") as f:
            self.graph = OP.parse_model(f.read())
        self.input_name = self.graph["inputs"][0]
        self.output_name = self.graph["outputs"][0]

    def infer(self, obs: np.ndarray) -> np.ndarray:
        obs = np.asarray(obs, np.float32)
        squeeze = obs.ndim == 1
        if squeeze:
            obs = obs[None]
        vals = dict(self.graph["initializers"])
        vals[self.input_name] = obs
        for n in self.graph["nodes"]:
            op = n["op"]
            i = [vals[name] for name in n["inputs"]]
            if op == "Sub":
                out = [i[0] - i[1]]
            elif op == "Div":
                out = [i[0] / i[1]]
            elif op == "Add":
                out = [i[0] + i[1]]
            elif op == "Mul":
                out = [i[0] * i[1]]
            elif op == "MatMul":
                out = [i[0] @ i[1]]
            elif op == "Sigmoid":
                out = [1.0 / (1.0 + np.exp(-i[0]))]
            elif op == "Tanh":
                out = [np.tanh(i[0])]
            elif op == "Split":
                axis = n["attrs"].get("axis", 0)
                split = n["attrs"].get("split")
                if split:
                    idx = np.cumsum(split)[:-1]
                    out = np.split(i[0], idx, axis=axis)
                else:
                    out = np.split(i[0], len(n["outputs"]), axis=axis)
            else:  # pragma: no cover
                raise NotImplementedError(op)
            for name, v in zip(n["outputs"], out):
                vals[name] = v
        result = vals[self.output_name]
        return result[0] if squeeze else result


# reference onnx_infer.py ships a __main__ latency benchmark; kept for parity
if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--onnx_model_path", required=True)
    p.add_argument("--obs_size", type=int, default=101)
    args = p.parse_args()
    policy = OnnxPolicy(args.onnx_model_path)
    obs = np.random.uniform(-1, 1, args.obs_size).astype(np.float32)
    policy.infer(obs)
    t0 = time.perf_counter()
    n = 1000
    for _ in range(n):
        policy.infer(obs)
    dt = (time.perf_counter() - t0) / n
    print(f"mean inference latency: {dt*1e6:.1f} us ({1/dt:.0f} Hz)")
