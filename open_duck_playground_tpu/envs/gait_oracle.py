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

import jax
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
        # In-env the phase is an INTEGER step index (i % 27), so the whole
        # library collapses to a precomputed (6,4,10,27,40) frame table:
        # the hot path becomes a 40-float row selection instead of a (40,16)
        # coefficient gather + 15 Horner steps. Crucially the table is
        # precomputed in float64 — the power-basis coefficients reach 2e5
        # in magnitude, so evaluating the degree-15 polynomial on device in
        # f32 would lose ~2 decimal digits to cancellation.
        tgrid = np.arange(self.nb_steps_in_period) / self.nb_steps_in_period
        powers = tgrid[None, :] ** np.arange(ncoef)[:, None]  # (16, 27)
        frames = np.einsum("xytdk,kp->xytpd", table, powers)
        # flattened (6*4*10*27, 40): ONE dynamic row index per lookup — a
        # multi-axis batched gather lowers to per-lane scalar work on TPU
        self.frames_flat = jnp.asarray(frames.reshape(-1, ndim), dtype)
        self._strides = (
            len(self.dys) * len(self.dthetas) * self.nb_steps_in_period,
            len(self.dthetas) * self.nb_steps_in_period,
            self.nb_steps_in_period,
        )
        # (240, 27*40) cell-major slab for the two-stage lookup: stage 1
        # contracts a 240-wide cell one-hot on the MXU, stage 2 selects the
        # phase row on the VPU (see reference_frame)
        self.ncells = len(self.dxs) * len(self.dys) * len(self.dthetas)
        self.frames_cell = jnp.asarray(
            frames.reshape(self.ncells, self.nb_steps_in_period * ndim), dtype
        )

    def cell_index(self, dx, dy, dtheta):
        ix = jnp.argmin(jnp.abs(self._dxs - jnp.clip(dx, self._dxs[0], self._dxs[-1])))
        iy = jnp.argmin(jnp.abs(self._dys - jnp.clip(dy, self._dys[0], self._dys[-1])))
        it = jnp.argmin(
            jnp.abs(self._dthetas - jnp.clip(dtheta, self._dthetas[0], self._dthetas[-1]))
        )
        return ix, iy, it

    def reference_frame(self, dx, dy, dtheta, i):
        """40-dim reference frame for command (dx,dy,dtheta) at integer
        phase step i (all in-env callers use integer steps; fractional
        phases live in the numpy twin used by eval tools).

        ``i`` must be integer-dtyped: the table is sampled at integer phase
        steps only, so a fractional phase (e.g. the numpy twin's
        ``phase_frequency_factor`` path) would be silently floored here —
        rejected loudly instead."""
        ix, iy, it = self.cell_index(dx, dy, dtheta)
        i = jnp.asarray(i)
        if not jnp.issubdtype(i.dtype, jnp.integer):
            raise TypeError(
                f"reference_frame expects an integer phase step, got dtype {i.dtype}; "
                "fractional phases are only supported by the numpy twin "
                "(eval_tools/gait_oracle_numpy.py)"
            )
        p = i.astype(jnp.int32) % self.nb_steps_in_period
        # Two-stage one-hot contraction instead of a row gather (TPU per-env
        # gathers run on the scalar core and measured 3-5x slower) or a flat
        # (B, 6480) @ (6480, 40) one-hot. Stage 1 contracts a 240-wide CELL
        # one-hot against the (240, 27*40) slab on the MXU — the LHS is 27x
        # smaller to generate than the flat form's, and precision=HIGHEST
        # keeps the selected rows f32-exact (the precision-default flat
        # matmul rounded frame values through bf16 operands, ~0.4% rel).
        # Stage 2 selects the phase row with a 27-way masked reduce on the
        # VPU (exact). Floor-corrected timing (1000-step scan, r5): both
        # forms cost <=5 us per 4096-env step on device — the lookup was
        # never a rollout bottleneck; this form is kept for the exact-f32
        # frames at zero measured cost (earlier per-call numbers in this
        # file's history were dominated by ~5 ms/program relay dispatch).
        nd, np_ = self.ndim, self.nb_steps_in_period
        cell = (ix * len(self.dys) + iy) * len(self.dthetas) + it
        oh_cell = (jnp.arange(self.ncells, dtype=jnp.int32) == cell).astype(
            self.frames_cell.dtype
        )
        slab = jnp.matmul(
            oh_cell, self.frames_cell, precision=jax.lax.Precision.HIGHEST
        )
        oh_p = (jnp.arange(np_, dtype=jnp.int32) == p).astype(slab.dtype)
        return jnp.sum(slab.reshape(np_, nd) * oh_p[:, None], axis=0)
