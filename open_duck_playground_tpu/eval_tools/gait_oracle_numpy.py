"""Numpy twin of envs.gait_oracle for host-only deployment/eval loops
(reference poly_reference_motion_numpy.py role)."""

from __future__ import annotations

import pickle

import numpy as np


class GaitOracleNumpy:
    def __init__(self, pkl_path: str):
        with open(pkl_path, "rb") as f:
            raw = pickle.load(f)
        meta = next(iter(raw.values()))
        self.period = float(meta["period"])
        self.fps = float(meta["fps"])
        self.nb_steps_in_period = int(self.period * self.fps)
        dxs, dys, dthetas = set(), set(), set()
        for key in raw:
            a, b, c = key.split("_")
            dxs.add(float(a)); dys.add(float(b)); dthetas.add(float(c))
        self.dxs = np.array(sorted(dxs))
        self.dys = np.array(sorted(dys))
        self.dthetas = np.array(sorted(dthetas))
        ndim = len(meta["coefficients"])
        ncoef = len(meta["coefficients"]["dim_0"])
        self.table = np.zeros((len(self.dxs), len(self.dys), len(self.dthetas), ndim, ncoef))
        for key, entry in raw.items():
            a, b, c = (float(v) for v in key.split("_"))
            ix = int(np.argmin(np.abs(self.dxs - a)))
            iy = int(np.argmin(np.abs(self.dys - b)))
            it = int(np.argmin(np.abs(self.dthetas - c)))
            for d in range(ndim):
                self.table[ix, iy, it, d] = np.asarray(entry["coefficients"][f"dim_{d}"])

    def reference_frame(self, dx, dy, dtheta, i):
        ix = int(np.argmin(np.abs(self.dxs - np.clip(dx, self.dxs[0], self.dxs[-1]))))
        iy = int(np.argmin(np.abs(self.dys - np.clip(dy, self.dys[0], self.dys[-1]))))
        it = int(np.argmin(np.abs(self.dthetas - np.clip(dtheta, self.dthetas[0], self.dthetas[-1]))))
        coeffs = self.table[ix, iy, it]  # (40, ncoef), lowest degree first
        t = (i % self.nb_steps_in_period) / self.nb_steps_in_period
        out = coeffs[:, -1].copy()
        for k in range(coeffs.shape[1] - 2, -1, -1):
            out = out * t + coeffs[:, k]
        return out

    # reference-compatible alias
    get_reference_motion = reference_frame
