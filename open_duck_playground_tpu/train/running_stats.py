"""Running observation normalization (Welford over batches), the replacement
for brax's acme running_statistics. State layout intentionally matches the
export contract: `.mean["state"]` / `.std["state"]`
(reference export_onnx.py:91-95)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStats:
    count: jnp.ndarray  # ()
    mean: Dict[str, jnp.ndarray]
    summed_var: Dict[str, jnp.ndarray]  # sum of squared deviations
    std: Dict[str, jnp.ndarray]


def init(obs_sizes: Dict[str, int], dtype=jnp.float32) -> RunningStats:
    zeros = {k: jnp.zeros(v, dtype) for k, v in obs_sizes.items()}
    ones = {k: jnp.ones(v, dtype) for k, v in obs_sizes.items()}
    return RunningStats(
        count=jnp.zeros((), dtype), mean=zeros, summed_var=dict(zeros), std=ones
    )


def update(stats: RunningStats, obs: Dict[str, jnp.ndarray]) -> RunningStats:
    """obs leaves have arbitrary leading batch dims; reductions are global
    means, so under pjit the cross-device psum is inserted automatically."""
    any_leaf = next(iter(obs.values()))
    batch = jnp.asarray(any_leaf.size // any_leaf.shape[-1], jnp.float32)
    new_count = stats.count + batch
    mean, summed_var, std = {}, {}, {}
    for k, x in obs.items():
        x2 = x.reshape(-1, x.shape[-1])
        diff = x2 - stats.mean[k]
        m = stats.mean[k] + diff.sum(0) / new_count
        d2 = x2 - m
        sv = stats.summed_var[k] + (diff * d2).sum(0)
        sv = jnp.maximum(sv, 0.0)
        mean[k] = m
        summed_var[k] = sv
        std[k] = jnp.sqrt(sv / new_count + 1e-6)
    return RunningStats(count=new_count, mean=mean, summed_var=summed_var, std=std)


def normalize(stats: RunningStats, obs: Dict[str, jnp.ndarray]):
    return {k: (x - stats.mean[k]) / stats.std[k] for k, x in obs.items()}
