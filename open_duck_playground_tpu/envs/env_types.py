"""Env protocol: the State pytree and the functional env interface.

Replaces mujoco_playground's `mjx_env.MjxEnv`/`State` (reference
`base.py:41`, `joystick.py:321`). Envs are host-constructed objects whose
`reset(rng)` / `step(state, action)` are pure jittable functions over this
State — vmapped over thousands of envs and pjit-sharded over the device mesh
by the wrappers in `envs/wrappers.py`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct

from open_duck_playground_tpu.physics.types import Data

Observation = Dict[str, jnp.ndarray]


@struct.dataclass
class State:
    data: Data
    obs: Observation
    reward: jnp.ndarray
    done: jnp.ndarray
    metrics: Dict[str, jnp.ndarray]
    info: Dict[str, Any]
