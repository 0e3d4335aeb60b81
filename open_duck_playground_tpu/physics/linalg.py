"""Dense SPD solves for tiny matrices (nv <= 30), unrolled + vectorized.

XLA's native `lax.linalg.cholesky`/`triangular_solve` lower to sequential
loop constructs that run ~1000x slower than necessary for batched tiny
matrices on TPU (measured ~30 ms per forward pass at 4096 envs). These
replacements unroll the factorization over the static dimension using only
broadcast/elementwise/reduction ops (rank-1 updates, one-hot accumulation —
no scatters, no control flow), which vmap into pure VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cholesky(M: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD (n, n) matrix (vmappable)."""
    n = M.shape[-1]
    eye = np.eye(n, dtype=np.float32)
    tril = np.tril(np.ones((n, n), np.float32))
    A = M
    L = jnp.zeros_like(M)
    for k in range(n):
        pivot = jnp.sqrt(jnp.maximum(A[..., k, k], 1e-12))
        col = (A[..., :, k] / pivot[..., None]) * tril[:, k]
        L = L + col[..., :, None] * eye[k]
        A = A - col[..., :, None] * col[..., None, :]
    return L


def solve_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L x = b with L lower-triangular, b (n,). Unrolled forward
    substitution via one-hot accumulation."""
    n = L.shape[-1]
    eye = np.eye(n, dtype=np.float32)
    x = jnp.zeros_like(b)
    for k in range(n):
        xk = (b[..., k] - jnp.sum(L[..., k, :] * x, axis=-1)) / L[..., k, k]
        x = x + xk[..., None] * eye[k]
    return x


def solve_upper_t(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = b with L lower-triangular, b (n,)."""
    n = L.shape[-1]
    eye = np.eye(n, dtype=np.float32)
    x = jnp.zeros_like(b)
    for k in range(n - 1, -1, -1):
        xk = (b[..., k] - jnp.sum(L[..., :, k] * x, axis=-1)) / L[..., k, k]
        x = x + xk[..., None] * eye[k]
    return x


def cholesky_solve(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = M^{-1} b for SPD M (n, n), b (n,)."""
    L = cholesky(M)
    return solve_upper_t(L, solve_lower(L, b))
