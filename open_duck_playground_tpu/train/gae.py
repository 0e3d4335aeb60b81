"""Truncation-aware Generalized Advantage Estimation (brax semantics:
truncated steps neither bootstrap through termination nor propagate credit
across the truncation boundary)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    truncation: jnp.ndarray,  # (T, B)
    termination: jnp.ndarray,  # (T, B)
    rewards: jnp.ndarray,  # (T, B)
    values: jnp.ndarray,  # (T, B)
    bootstrap_value: jnp.ndarray,  # (B,)
    lambda_: float = 0.95,
    discount: float = 0.99,
    unroll: int = 1,
):
    truncation_mask = 1 - truncation
    values_t1 = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    deltas = rewards + discount * (1 - termination) * values_t1 - values
    deltas *= truncation_mask

    def body(acc, xs):
        delta, trunc_mask, term = xs
        acc = delta + discount * (1 - term) * trunc_mask * lambda_ * acc
        return acc, acc

    _, vs_minus_v = jax.lax.scan(
        body,
        jnp.zeros_like(bootstrap_value),
        (deltas, truncation_mask, termination),
        reverse=True,
        unroll=unroll,
    )
    vs = vs_minus_v + values
    vs_t1 = jnp.concatenate([vs[1:], bootstrap_value[None]], axis=0)
    advantages = (
        rewards + discount * (1 - termination) * vs_t1 - values
    ) * truncation_mask
    return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(advantages)
