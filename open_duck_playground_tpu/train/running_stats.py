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
    # mean and summed_var must be *distinct* device buffers (not one shared
    # dict of arrays): the trainer donates the state pytree to its epoch jit,
    # and XLA rejects the same buffer appearing twice among donated args
    def zeros():
        return {k: jnp.zeros(v, dtype) for k, v in obs_sizes.items()}

    ones = {k: jnp.ones(v, dtype) for k, v in obs_sizes.items()}
    return RunningStats(
        count=jnp.zeros((), dtype), mean=zeros(), summed_var=zeros(), std=ones
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


def merge_moments(
    stats: RunningStats,
    batch_count: jnp.ndarray,
    t1: Dict[str, jnp.ndarray],
    t2: Dict[str, jnp.ndarray],
) -> RunningStats:
    """Exact-algebra equivalent of `update` from pre-accumulated moments
    about the *old* mean: t1[k] = Σ(x − mean[k]), t2[k] = Σ(x − mean[k])².

    Lets the rollout scan fuse the accumulation into its own pass (the obs
    never have to be re-read from HBM): with y = x − m_old and
    δ = m_new − m_old = Σy / new_count,
        Σ(x − m_old)(x − m_new) = Σ y(y − δ) = t2 − δ·t1,
    which is precisely `update`'s summed-variance increment.
    """
    new_count = stats.count + batch_count
    mean, summed_var, std = {}, {}, {}
    for k in t1:
        delta = t1[k] / new_count
        m = stats.mean[k] + delta
        sv = stats.summed_var[k] + t2[k] - delta * t1[k]
        sv = jnp.maximum(sv, 0.0)
        mean[k] = m
        summed_var[k] = sv
        std[k] = jnp.sqrt(sv / new_count + 1e-6)
    return RunningStats(count=new_count, mean=mean, summed_var=summed_var, std=std)


def zero_moments(stats: RunningStats):
    """(t1, t2) accumulator init matching `merge_moments`."""
    z = {k: jnp.zeros_like(v) for k, v in stats.mean.items()}
    return z, {k: jnp.zeros_like(v) for k, v in stats.mean.items()}


def accumulate_moments(stats: RunningStats, moments, obs: Dict[str, jnp.ndarray]):
    """Add one batch of obs (leading dims flattened) into (t1, t2)."""
    t1, t2 = moments
    nt1, nt2 = {}, {}
    for k, x in obs.items():
        y = x.reshape(-1, x.shape[-1]) - stats.mean[k]
        nt1[k] = t1[k] + y.sum(0)
        nt2[k] = t2[k] + (y * y).sum(0)
    return nt1, nt2


def normalize(stats: RunningStats, obs: Dict[str, jnp.ndarray]):
    return {k: (x - stats.mean[k]) / stats.std[k] for k, x in obs.items()}
