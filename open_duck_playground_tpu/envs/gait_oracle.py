"""Polynomial reference-gait oracle.

Loads the 240-cell gait library (`data/polynomial_coefficients.pkl`:
command-velocity grid dx(6) x dy(4) x dtheta(10), 40 output dims, degree-15
polynomials, period 0.54 s @ 50 fps => 27 steps/period) into one dense device
tensor and evaluates it with nearest-cell lookup + Horner polyval — the
equivalent of reference `poly_reference_motion.py:54-168`, built for the hot
path: a single gather + fused polynomial eval, vmappable over envs.
"""

from __future__ import annotations

import pickle

import jax.numpy as jnp
import numpy as np


class GaitOracle:
    def __init__(self, pkl_path: str, dtype=jnp.float32):
        with open(pkl_path, "rb") as f:
            raw = pickle.load(f)

        dxs, dys, dthetas = set(), set(), set()
        meta = next(iter(raw.values()))
        self.period = float(meta["period"])
        self.fps = float(meta["fps"])
        self.nb_steps_in_period = int(self.period * self.fps)
        for key in raw:
            a, b, c = key.split("_")
            dxs.add(float(a))
            dys.add(float(b))
            dthetas.add(float(c))
        self.dxs = np.array(sorted(dxs))
        self.dys = np.array(sorted(dys))
        self.dthetas = np.array(sorted(dthetas))

        ndim = len(meta["coefficients"])
        ncoef = len(meta["coefficients"]["dim_0"])
        table = np.zeros(
            (len(self.dxs), len(self.dys), len(self.dthetas), ndim, ncoef)
        )
        for key, entry in raw.items():
            a, b, c = (float(v) for v in key.split("_"))
            ix = int(np.argmin(np.abs(self.dxs - a)))
            iy = int(np.argmin(np.abs(self.dys - b)))
            it = int(np.argmin(np.abs(self.dthetas - c)))
            for d in range(ndim):
                # store lowest-degree-first for Horner from the top
                table[ix, iy, it, d] = np.asarray(entry["coefficients"][f"dim_{d}"])
        self.table = jnp.asarray(table, dtype)
        self._dxs = jnp.asarray(self.dxs, dtype)
        self._dys = jnp.asarray(self.dys, dtype)
        self._dthetas = jnp.asarray(self.dthetas, dtype)
        self.ndim = ndim

    def cell_index(self, dx, dy, dtheta):
        ix = jnp.argmin(jnp.abs(self._dxs - jnp.clip(dx, self._dxs[0], self._dxs[-1])))
        iy = jnp.argmin(jnp.abs(self._dys - jnp.clip(dy, self._dys[0], self._dys[-1])))
        it = jnp.argmin(
            jnp.abs(self._dthetas - jnp.clip(dtheta, self._dthetas[0], self._dthetas[-1]))
        )
        return ix, iy, it

    def reference_frame(self, dx, dy, dtheta, i):
        """40-dim reference frame for command (dx,dy,dtheta) at phase step i."""
        ix, iy, it = self.cell_index(dx, dy, dtheta)
        coeffs = self.table[ix, iy, it]  # (40, 16) lowest-degree first
        t = (i % self.nb_steps_in_period) / self.nb_steps_in_period
        t = jnp.clip(t, 0.0, 1.0).astype(self.table.dtype)
        # Horner from highest degree (coeffs[:, -1] is the highest term)
        out = coeffs[:, -1]
        for k in range(coeffs.shape[1] - 2, -1, -1):
            out = out * t + coeffs[:, k]
        return out
