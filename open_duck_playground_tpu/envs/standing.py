"""Standing/head-tracking task.

Behavioral spec: reference `standing.py` — same skeleton as the joystick task
with: no imitation reward (USE_IMITATION_REWARD=False, standing.py:42), zero
locomotion commands (:647-661), no motor-speed slew clamp, obs without
motor_targets/imitation_phase (:526-542), rewards orientation/torques/
action_rate/alive/stand_still(ignore_head)/head_pos (:585-605).
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
from ml_collections import config_dict

from open_duck_playground_tpu.envs import duck_base, rewards as R
from open_duck_playground_tpu.envs.joystick import Joystick

USE_IMITATION_REWARD = False


def default_config() -> config_dict.ConfigDict:
    return config_dict.create(
        ctrl_dt=0.02,
        sim_dt=0.002,
        episode_length=1000,
        action_repeat=1,
        action_scale=0.25,
        dof_vel_scale=0.05,
        history_len=0,
        soft_joint_pos_limit_factor=0.95,
        noise_config=config_dict.create(
            level=1.0,
            action_min_delay=0,
            action_max_delay=3,
            imu_min_delay=0,
            imu_max_delay=3,
            scales=config_dict.create(
                hip_pos=0.03,
                knee_pos=0.05,
                ankle_pos=0.08,
                joint_vel=2.5,
                gravity=0.1,
                linvel=0.1,
                gyro=0.05,
                accelerometer=0.005,
            ),
        ),
        reward_config=config_dict.create(
            scales=config_dict.create(
                orientation=-0.5,
                torques=-1.0e-3,
                action_rate=-0.375,
                stand_still=-0.3,
                alive=20.0,
                head_pos=-2.0,
            ),
            tracking_sigma=0.01,
        ),
        push_config=config_dict.create(
            enable=True,
            interval_range=[5.0, 10.0],
            magnitude_range=[0.1, 1.0],
        ),
        neck_pitch_range=[-0.34, 1.1],
        head_pitch_range=[-0.78, 0.78],
        head_yaw_range=[-2.7, 2.7],
        head_roll_range=[-0.5, 0.5],
        head_range_factor=1.0,
        # False = reference parity (head_pos cost dead in this task, a
        # latent upstream bug — see rewards.head_pos); True trains real
        # head-command tracking
        head_pos_ungated=False,
        # see joystick.default_config: direct head-servo targets from the
        # command dims (the only route past action_scale's 0.25 rad
        # authority ceiling on head commands)
        head_direct_targets=False,
    )


class Standing(Joystick):
    """Stand in place while tracking head commands."""

    use_imitation = USE_IMITATION_REWARD
    use_motor_speed_limits = False
    obs_has_motor_targets = False
    obs_has_imitation_phase = False

    def __init__(
        self,
        task: str = "flat_terrain",
        config: Optional[config_dict.ConfigDict] = None,
        config_overrides: Optional[Dict[str, Union[str, int, list]]] = None,
        **kwargs,
    ):
        super().__init__(task=task, config=config or default_config(),
                         config_overrides=config_overrides, **kwargs)

    @staticmethod
    def default_config() -> config_dict.ConfigDict:
        return default_config()

    def _get_reward(self, data, action, info, done, first_contact, contact):
        del done, first_contact, contact
        return {
            "orientation": R.orientation(self.get_gravity(data)),
            "torques": R.torques(data.actuator_force),
            "action_rate": R.action_rate(action, info["last_act"]),
            "alive": R.alive(),
            "stand_still": R.stand_still(
                info["command"],
                self.get_actuator_joints_qpos(data.qpos),
                self.get_actuator_joints_qvel(data.qvel),
                self._default_actuator,
                ignore_head=True,
            ),
            "head_pos": R.head_pos(
                self.get_actuator_joints_qpos(data.qpos),
                self.get_actuator_joints_qvel(data.qvel),
                info["command"],
                # default False replicates the upstream bug: the cost's
                # moving-command gate never opens in this task (zero
                # locomotion commands), so head tracking goes untrained.
                # --config_override head_pos_ungated=True fixes it.
                ungated=bool(self._config.get("head_pos_ungated", False)),
            ),
        }

    def sample_command(self, rng: jax.Array) -> jax.Array:
        cfg = self._config
        keys = jax.random.split(rng, 8)
        f = cfg.head_range_factor

        def u(key, lohi):
            return jax.random.uniform(
                key, dtype=jnp.float32, minval=lohi[0] * f, maxval=lohi[1] * f
            )

        cmd = jnp.hstack(
            [
                0.0,
                0.0,
                0.0,
                u(keys[4], cfg.neck_pitch_range),
                u(keys[5], cfg.head_pitch_range),
                u(keys[6], cfg.head_yaw_range),
                u(keys[7], cfg.head_roll_range),
            ]
        )
        return jnp.where(jax.random.bernoulli(keys[3], p=0.1), jnp.zeros(7, jnp.float32), cmd)
