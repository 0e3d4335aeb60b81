"""Actor/critic MLPs + tanh-Normal action distribution.

Replaces `brax.training.agents.ppo.networks` (reference runner.py:95-100).
Parameter trees use {"hidden_i": {"kernel","bias"}} naming so checkpoints are
directly consumable by the ONNX exporter, matching the reference contract
(export_onnx.py:108-164). Deterministic action = tanh(loc of split logits)
(export_onnx.py:71-72).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

_MIN_STD = 0.001
_LOG2 = 0.6931471805599453


def _lecun_uniform(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = jnp.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_mlp(key, sizes: Sequence[int]) -> Dict:
    params = {}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (din, dout) in enumerate(zip(sizes[:-1], sizes[1:])):
        params[f"hidden_{i}"] = {
            "kernel": _lecun_uniform(keys[i], (din, dout)),
            "bias": jnp.zeros(dout, jnp.float32),
        }
    return params

def apply_mlp(
    params: Dict, x: jnp.ndarray, final_activation=False, matmul_dtype=None
) -> jnp.ndarray:
    """Forward MLP. With matmul_dtype=bfloat16 the MXU passes run on bf16
    inputs with f32 accumulation (preferred_element_type) — params, biases
    and activations stay f32 (mixed-precision matmuls only; the SGD phase
    is f32-matmul-roofline-bound at production shapes, see RESULTS.md)."""
    n = len(params)
    for i in range(n):
        p = params[f"hidden_{i}"]
        if matmul_dtype is None:
            x = x @ p["kernel"] + p["bias"]
        else:
            x = (
                jnp.dot(
                    x.astype(matmul_dtype),
                    p["kernel"].astype(matmul_dtype),
                    preferred_element_type=jnp.float32,
                )
                + p["bias"]
            )
        if i < n - 1 or final_activation:
            x = jax.nn.swish(x)
    return x


class PPONetworks:
    """Factory bound to (obs sizes, action size, hidden sizes)."""

    def __init__(
        self,
        obs_sizes: Dict[str, int],
        action_size: int,
        policy_hidden: Tuple[int, ...],
        value_hidden: Tuple[int, ...],
        policy_obs_key: str = "state",
        value_obs_key: str = "privileged_state",
        matmul_dtype=None,
    ):
        self.action_size = action_size
        self.policy_obs_key = policy_obs_key
        self.value_obs_key = value_obs_key
        self.matmul_dtype = matmul_dtype
        self.policy_sizes = (
            obs_sizes[policy_obs_key],
            *policy_hidden,
            2 * action_size,
        )
        self.value_sizes = (obs_sizes[value_obs_key], *value_hidden, 1)

    def init(self, key) -> Dict:
        kp, kv = jax.random.split(key)
        return {
            "policy": init_mlp(kp, self.policy_sizes),
            "value": init_mlp(kv, self.value_sizes),
        }

    def policy_logits(self, params, norm_obs: Dict[str, jnp.ndarray]):
        return apply_mlp(
            params["policy"],
            norm_obs[self.policy_obs_key],
            matmul_dtype=self.matmul_dtype,
        )

    def value(self, params, norm_obs: Dict[str, jnp.ndarray]):
        return apply_mlp(
            params["value"],
            norm_obs[self.value_obs_key],
            matmul_dtype=self.matmul_dtype,
        )[..., 0]


# --- tanh-squashed Normal (brax NormalTanhDistribution semantics) ---------


def dist_params(logits):
    loc, raw_scale = jnp.split(logits, 2, axis=-1)
    scale = jax.nn.softplus(raw_scale) + _MIN_STD
    return loc, scale


def sample_raw(key, logits):
    """Pre-tanh sample (stored in rollouts so log_prob can be recomputed)."""
    loc, scale = dist_params(logits)
    return loc + scale * jax.random.normal(key, loc.shape, loc.dtype)


def postprocess(raw_action):
    return jnp.tanh(raw_action)


def log_prob(logits, raw_action):
    """Log-density of tanh(raw) under the squashed distribution, summed over
    action dims; tanh log-det-jacobian = 2*(log2 - z - softplus(-2z))."""
    loc, scale = dist_params(logits)
    z = (raw_action - loc) / scale
    lp = -0.5 * z * z - 0.5 * jnp.log(2 * jnp.pi) - jnp.log(scale)
    ldj = 2.0 * (_LOG2 - raw_action - jax.nn.softplus(-2.0 * raw_action))
    return jnp.sum(lp - ldj, axis=-1)


def entropy(key, logits):
    """Entropy estimate: base-Normal entropy + E[log-det-jacobian] at one
    sample (brax's estimator)."""
    loc, scale = dist_params(logits)
    base = 0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(scale)
    raw = loc + scale * jax.random.normal(key, loc.shape, loc.dtype)
    ldj = 2.0 * (_LOG2 - raw - jax.nn.softplus(-2.0 * raw))
    return jnp.sum(base + ldj, axis=-1)


def deterministic_action(logits):
    loc, _ = dist_params(logits)
    return jnp.tanh(loc)
