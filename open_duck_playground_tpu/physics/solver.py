"""Primal Newton constraint solver (MuJoCo Newton semantics: exact Hessian,
analytic piecewise-quadratic linesearch), dense and fully static-shape.

Minimizes over x = qacc:
    L(x) = 1/2 (x-a)^T M (x-a) + sum_i c_i(J_i x - aref_i)
with c_i quadratic-if-violating for unilateral rows (limits, contact facets)
and Huber (quadratic saturating to linear at |force|=frictionloss) for dof
friction rows. iterations / ls_iterations come from the model (duck model:
1 / 5, `open_duck_mini_v2.xml:6`).

The whole solve is unrolled: at nv<=30 and nefc<=70 the per-env problem is a
few tiny matmuls — batched over thousands of envs by vmap, XLA turns them
into MXU-shaped batched GEMMs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# TPU lowers f32 matmuls through bf16 passes by default
# (xla_allow_excess_precision); the Newton system is too ill-conditioned for
# that — force true f32 contractions on the solver's linear algebra.
_mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

from open_duck_playground_tpu.physics import linalg as LA
from open_duck_playground_tpu.physics.constraint import EfcRows
from open_duck_playground_tpu.physics.types import Model


class SolveResult(NamedTuple):
    qacc: jnp.ndarray
    efc_force: jnp.ndarray
    qfrc_constraint: jnp.ndarray


def _force_and_hess(efc: EfcRows, jar):
    """Per-row dc/djar (= -force) and d2c/djar2 weights."""
    fl = efc.frictionloss
    is_fric = fl > 0
    quad_f = efc.D * jar
    # unilateral: active iff jar < 0
    uni_g = jnp.where(jar < 0, quad_f, 0.0)
    uni_h = jnp.where(jar < 0, efc.D, 0.0)
    # friction: clamp |D*jar| to fl
    fr_g = jnp.clip(quad_f, -fl, fl)
    fr_h = jnp.where(jnp.abs(quad_f) < fl, efc.D, 0.0)
    g = jnp.where(is_fric, fr_g, uni_g)
    h = jnp.where(is_fric, fr_h, uni_h)
    return g, h


def _cost(efc: EfcRows, M, a_smooth, x):
    jar = _mm(efc.J, x) - efc.aref
    fl = efc.frictionloss
    is_fric = fl > 0
    quad = 0.5 * efc.D * jar * jar
    uni = jnp.where(jar < 0, quad, 0.0)
    # Huber: linear beyond |jar| = fl * R
    lin = fl * jnp.abs(jar) - 0.5 * fl * fl * efc.R
    fr = jnp.where(jnp.abs(efc.D * jar) < fl, quad, lin)
    ccost = jnp.where(is_fric, fr, uni).sum()
    dx = x - a_smooth
    return 0.5 * jnp.sum(dx * _mm(M, dx)) + ccost


def solve(
    m: Model,
    M: jnp.ndarray,
    qacc_smooth: jnp.ndarray,
    warmstart: jnp.ndarray,
    efc: EfcRows,
) -> SolveResult:
    s = m.spec

    # start from the better of (warmstart, qacc_smooth), MuJoCo mj_warmstart
    c_w = _cost(efc, M, qacc_smooth, warmstart)
    c_s = _cost(efc, M, qacc_smooth, qacc_smooth)
    x = jnp.where(c_w < c_s, warmstart, qacc_smooth)

    for _ in range(s.iterations):
        jar = _mm(efc.J, x) - efc.aref
        g_rows, h_rows = _force_and_hess(efc, jar)
        grad = _mm(M, x - qacc_smooth) + _mm(efc.J.T, g_rows)
        H = M + _mm(efc.J.T * h_rows, efc.J)
        # dense SPD solve for the Newton direction (unrolled vectorized
        # cholesky — XLA's native lowering is pathologically slow here)
        dx = -LA.cholesky_solve(H, grad)

        # analytic linesearch on the piecewise-quadratic 1D restriction
        jv = _mm(efc.J, dx)
        mv = _mm(M, dx)
        g0 = jnp.sum(dx * _mm(M, x - qacc_smooth))
        hq = jnp.sum(dx * mv)
        alpha = jnp.zeros((), x.dtype)
        for _ in range(s.ls_iterations):
            jar_a = jar + alpha * jv
            g_rows, h_rows = _force_and_hess(efc, jar_a)
            dphi = g0 + alpha * hq + jv @ g_rows
            ddphi = hq + (h_rows * jv) @ jv
            alpha = alpha - dphi / jnp.maximum(ddphi, 1e-12)
        x = x + alpha * dx

    jar = _mm(efc.J, x) - efc.aref
    g_rows, _ = _force_and_hess(efc, jar)
    efc_force = -g_rows
    qfrc_constraint = _mm(efc.J.T, efc_force)
    return SolveResult(qacc=x, efc_force=efc_force, qfrc_constraint=qfrc_constraint)
