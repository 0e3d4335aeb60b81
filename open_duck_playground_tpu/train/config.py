"""Pinned PPO hyperparameters.

The reference pulls these from
`mujoco_playground.config.locomotion_params.brax_ppo_config(
"BerkeleyHumanoidJoystickFlatTerrain")` (runner.py:87-89, an acknowledged
placeholder name). That package is not vendored here, so the values are pinned
explicitly (SURVEY §2.2 directs this); they follow the mujoco_playground
locomotion defaults. Field-by-field provenance (which values come from the
mujoco_playground registry vs brax's ppo.train signature defaults vs this
repo) is recorded in PARITY.md. Override any via `ppo_config(**overrides)`.
"""

from __future__ import annotations

from ml_collections import config_dict


def ppo_config(**overrides) -> config_dict.ConfigDict:
    cfg = config_dict.create(
        num_timesteps=150_000_000,
        num_evals=10,
        reward_scaling=1.0,
        episode_length=1000,
        normalize_observations=True,
        action_repeat=1,
        unroll_length=20,
        num_minibatches=32,
        num_updates_per_batch=4,
        discounting=0.97,
        learning_rate=3.0e-4,
        entropy_cost=1.0e-2,
        num_envs=8192,
        batch_size=256,
        max_grad_norm=1.0,
        clipping_epsilon=0.3,
        gae_lambda=0.95,
        normalize_advantage=True,
        num_eval_envs=128,
        deterministic_eval=False,
        seed=0,
        # this repo's extension (off = brax-parity f32 numerics): bf16 MXU
        # passes with f32 accumulation for the actor/critic matmuls — the
        # SGD phase is f32-matmul-roofline-bound at production shapes
        bf16_matmuls=False,
        network_factory=config_dict.create(
            policy_hidden_layer_sizes=(128, 128, 128, 128),
            value_hidden_layer_sizes=(256, 256, 256, 256),
            policy_obs_key="state",
            value_obs_key="privileged_state",
        ),
    )
    cfg.update(overrides)
    return cfg
