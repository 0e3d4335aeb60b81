"""ctypes binding to the native C++ ONNX policy runtime (csrc/duck_onnx).

Builds the shared library on first use (g++ is part of the toolchain); the
pure-numpy `OnnxPolicy` remains the fallback. Interface-compatible with
`OnnxPolicy.infer`.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc" / "duck_onnx"
_LIB = _CSRC / "libduck_onnx.so"


def _ensure_built() -> pathlib.Path:
    src = _CSRC / "onnx_mlp.cc"
    if not _LIB.exists() or _LIB.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["make", "-C", str(_CSRC)], check=True, capture_output=True)
    return _LIB


class NativeOnnxPolicy:
    def __init__(self, model_path: str, act_size: int | None = None):
        lib = ctypes.CDLL(str(_ensure_built()))
        lib.duck_onnx_load.restype = ctypes.c_void_p
        lib.duck_onnx_load.argtypes = [ctypes.c_char_p]
        lib.duck_onnx_infer.restype = ctypes.c_int
        lib.duck_onnx_infer.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.duck_onnx_free.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.duck_onnx_load(str(model_path).encode())
        if not self._h:
            raise RuntimeError(f"failed to load {model_path}")
        if act_size is None:
            # peek at the graph with the python parser to size the output
            from open_duck_playground_tpu.export.onnx_runtime import OnnxPolicy

            g = OnnxPolicy(model_path).graph
            last_w = max(
                (k for k in g["initializers"] if k.startswith("w_")),
                key=lambda k: int(k.split("_")[1]),
            )
            act_size = g["initializers"][last_w].shape[1] // 2
        self._act_size = act_size

    def infer(self, obs: np.ndarray) -> np.ndarray:
        obs = np.ascontiguousarray(obs, np.float32).ravel()
        out = np.empty(self._act_size, np.float32)
        rc = self._lib.duck_onnx_infer(
            self._h,
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            obs.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size,
        )
        if rc != 0:
            raise RuntimeError(f"duck_onnx_infer failed: {rc}")
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.duck_onnx_free(self._h)
            self._h = None
