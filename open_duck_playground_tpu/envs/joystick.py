"""Joystick-following task (+ shared locomotion machinery).

Behavioral spec: reference `joystick.py` (default_config :49-102, reset
:206-321, step :323-481, obs :487-620, rewards :622-669, command sampler
:671-725). Deliberately replicated quirks:
  - the accelerometer +1.3 x-offset at joystick.py:500-502 is a no-op in
    training (`.at[].set` result discarded); we replicate by not offsetting.
  - feet_air_time increments BEFORE reward and is zeroed on contact AFTER.
  - command resample / step reset thresholds are `step > 500`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from ml_collections import config_dict

from open_duck_playground_tpu.envs import duck_base, imitation, rewards as R
from open_duck_playground_tpu.envs.duck_base import DuckEnv
from open_duck_playground_tpu.envs.env_types import State
from open_duck_playground_tpu.envs.gait_oracle import GaitOracle
from open_duck_playground_tpu.physics import collision as C
from open_duck_playground_tpu.physics import forward as F
from open_duck_playground_tpu.physics import maths

USE_IMITATION_REWARD = True
USE_MOTOR_SPEED_LIMITS = True


def default_config() -> config_dict.ConfigDict:
    return config_dict.create(
        ctrl_dt=0.02,
        sim_dt=0.002,
        episode_length=1000,
        action_repeat=1,
        action_scale=0.25,
        # config mirror of the module flag (reference joystick.py:45) so
        # experiments can flip it per-run via --config_override; obs layout
        # is unchanged (imitation_phase dims stay, as zeros) so exported
        # policies remain size-compatible
        use_imitation=USE_IMITATION_REWARD,
        # reset-time joint-angle perturbation: qpos *= U(lo, hi) (reference
        # joystick.py:237-243 hardcodes [0.5, 1.5]); variants with a smaller
        # stability margin (no-head) train with a narrower range
        reset_joint_scale_range=[0.5, 1.5],
        # reference state initialization (DeepMimic-style, beyond reference):
        # with this probability a reset starts mid-gait — legs posed at a
        # random phase of the reference motion, joint+base velocities from
        # the same frame — so the value function sees stepping states even
        # when the policy hasn't discovered stepping (the no-head build's
        # stand-still local optimum). 0.0 = reference-parity resets.
        rsi_prob=0.0,
        dof_vel_scale=0.05,
        history_len=0,
        soft_joint_pos_limit_factor=0.95,
        max_motor_velocity=5.24,  # rad/s
        noise_config=config_dict.create(
            level=1.0,
            action_min_delay=0,  # env steps
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
                gyro=0.1,
                accelerometer=0.05,
            ),
        ),
        reward_config=config_dict.create(
            scales=config_dict.create(
                tracking_lin_vel=2.5,
                tracking_ang_vel=6.0,
                torques=-1.0e-3,
                action_rate=-0.5,
                stand_still=-0.2,
                alive=20.0,
                imitation=1.0,
                progress=0.0,  # extension, off for reference parity
                yaw_rate_l1=0.0,  # extension (use negative), off for parity
                lin_vel_l1=0.0,  # extension (use negative), off for parity
            ),
            tracking_sigma=0.01,
        ),
        push_config=config_dict.create(
            enable=True,
            interval_range=[5.0, 10.0],
            magnitude_range=[0.1, 1.0],
        ),
        lin_vel_x=[-0.15, 0.15],
        lin_vel_y=[-0.2, 0.2],
        ang_vel_yaw=[-1.0, 1.0],
        neck_pitch_range=[-0.34, 1.1],
        head_pitch_range=[-0.78, 0.78],
        head_yaw_range=[-1.5, 1.5],
        head_roll_range=[-0.5, 0.5],
        head_range_factor=1.0,
        # False = parity. True enables the reference's own commented-out
        # head override (joystick.py:419): head servo targets come from the
        # command dims directly (action_scale's ±0.25 rad tanh-bounded
        # authority cannot reach the ±0.5..2.7 rad head command ranges).
        head_direct_targets=False,
    )


class Joystick(DuckEnv):
    """Track a joystick command (3 locomotion + 4 head dims)."""

    use_imitation = USE_IMITATION_REWARD
    use_motor_speed_limits = USE_MOTOR_SPEED_LIMITS
    obs_has_motor_targets = True
    obs_has_imitation_phase = True

    def __init__(
        self,
        task: str = "flat_terrain",
        config: Optional[config_dict.ConfigDict] = None,
        config_overrides: Optional[Dict[str, Union[str, int, list]]] = None,
        **kwargs,
    ):
        super().__init__(
            xml_path=duck_base.task_to_xml(task),
            config=config or self.default_config(),
            config_overrides=config_overrides,
            **kwargs,
        )
        if "use_imitation" in self._config:
            self.use_imitation = bool(self._config.use_imitation)
        self._post_init()

    @staticmethod
    def default_config() -> config_dict.ConfigDict:
        return default_config()

    def _post_init(self) -> None:
        mj = self._mj_model
        self._init_q = jnp.asarray(mj.key_qpos[0], jnp.float32)
        if self._model.spec.floor_is_hfield:
            # the "home" keyframe is authored for the flat floor (z=0); on a
            # heightfield the feet would spawn up to size[2] inside the
            # terrain, and the resulting solver kick tips the robot over —
            # spawn above the tallest terrain point instead (feet settle in
            # a few frames under the position servos)
            lift = float(self._model.hfield_size[2]) + 0.002
            self._init_q = self._init_q.at[2].add(lift)
        self._default_actuator = jnp.asarray(mj.key_ctrl[0], jnp.float32)

        self.gait = (
            GaitOracle(str(duck_base.GAIT_PKL)) if self.use_imitation else None
        )
        # Retarget the gait library's joint targets onto this variant's
        # balanced stance (no-head: hip_pitch/ankle rotated back under the
        # body to restore the full robot's CoM support margin); zero for the
        # full robot, whose home keyframe IS the library's authored stance.
        if self.use_imitation and mj.nu == 10:
            self._imitation_ref_offset = (
                jnp.asarray(mj.key_ctrl[0], jnp.float32) - imitation.GAIT_HOME_LEGS
            )
        else:
            self._imitation_ref_offset = None

        lowers, uppers = mj.jnt_range[1:].T
        c = (lowers + uppers) / 2
        r = uppers - lowers
        f = self._config.soft_joint_pos_limit_factor
        self._soft_lowers = jnp.asarray(c - 0.5 * r * f, jnp.float32)
        self._soft_uppers = jnp.asarray(c + 0.5 * r * f, jnp.float32)

        self._actuators = mj.nu

        scale = np.zeros(self._actuators)
        ncfg = self._config.noise_config.scales
        order = duck_base.JOINTS_ORDER_NO_HEAD
        for i, name in enumerate(order):
            if "_hip" in name:
                scale[i] = ncfg.hip_pos
            elif "_knee" in name:
                scale[i] = ncfg.knee_pos
            elif "_ankle" in name:
                scale[i] = ncfg.ankle_pos
        self._qpos_noise_scale = jnp.asarray(scale, jnp.float32)

    # ------------------------------------------------------------------ reset
    def reset(self, rng: jax.Array, model=None) -> State:
        model = model if model is not None else self._model
        qpos = self._init_q
        qvel = jnp.zeros(self._model.spec.nv, jnp.float32)

        rng, key = jax.random.split(rng)
        dxy = jax.random.uniform(key, (2,), jnp.float32, minval=-0.05, maxval=0.05)
        base = self.get_floating_base_qpos(qpos)
        base = base.at[0:2].add(dxy)

        rng, key = jax.random.split(rng)
        yaw = jax.random.uniform(key, (1,), jnp.float32, minval=-3.14, maxval=3.14)
        yaw_quat = maths.axis_angle_to_quat(jnp.array([0.0, 0, 1], jnp.float32), yaw[0])
        base = base.at[3:7].set(maths.quat_mul(base[3:7], yaw_quat))
        qpos = self.set_floating_base_qpos(base, qpos)

        rng, key = jax.random.split(rng)
        js_lo, js_hi = self._config.get(
            "reset_joint_scale_range", (0.5, 1.5)
        )
        jpos = self.get_actuator_joints_qpos(qpos) * jax.random.uniform(
            key, (self._actuators,), jnp.float32, minval=js_lo, maxval=js_hi
        )
        qpos = self.set_actuator_joints_qpos(jpos, qpos)

        rng, key = jax.random.split(rng)
        qvel = self.set_floating_base_qvel(
            jax.random.uniform(key, (6,), jnp.float32, minval=-0.05, maxval=0.05), qvel
        )

        rng, cmd_rng = jax.random.split(rng)
        cmd = self.sample_command(cmd_rng)

        imitation_i0 = jnp.asarray(0, jnp.int32)
        rsi_prob = float(self._config.get("rsi_prob", 0.0))
        if self.use_imitation and rsi_prob > 0.0:
            rng, gate_key, phase_key = jax.random.split(rng, 3)
            i0 = jax.random.randint(
                phase_key, (), 0, self.gait.nb_steps_in_period, jnp.int32
            )
            use_rsi = jax.random.uniform(gate_key) < rsi_prob
            imitation_i0 = jnp.where(use_rsi, i0, 0)
            ref0 = self.gait.reference_frame(cmd[0], cmd[1], cmd[2], imitation_i0)
            ref_jpos = jnp.concatenate([ref0[0:5], ref0[11:16]])
            if self._imitation_ref_offset is not None:
                ref_jpos = ref_jpos + self._imitation_ref_offset
            ref_jvel = jnp.concatenate([ref0[16:21], ref0[27:32]])
            cur_jpos = self.get_actuator_joints_qpos(qpos)
            cur_jvel = qvel[self._actuator_dofadr]
            if self._actuators == 10:
                rsi_jpos, rsi_jvel = ref_jpos, ref_jvel
            else:  # 14-actuator robot: head joints (5:9) stay at the
                # perturbed reset pose; the gait frame only covers legs
                rsi_jpos = cur_jpos.at[:5].set(ref_jpos[:5]).at[9:].set(ref_jpos[5:])
                rsi_jvel = cur_jvel.at[:5].set(ref_jvel[:5]).at[9:].set(ref_jvel[5:])
            qpos = self.set_actuator_joints_qpos(
                jnp.where(use_rsi, rsi_jpos, cur_jpos), qpos
            )
            qvel = qvel.at[self._actuator_dofadr].set(
                jnp.where(use_rsi, rsi_jvel, cur_jvel)
            )
            # base velocity from the reference frame (heading-local), rotated
            # into the world by the randomized yaw
            base_quat = self.get_floating_base_qpos(qpos)[3:7]
            rsi_base_vel = jnp.concatenate(
                [maths.quat_rotate(base_quat, ref0[34:37]), ref0[37:40]]
            )
            qvel = self.set_floating_base_qvel(
                jnp.where(use_rsi, rsi_base_vel, self.get_floating_base_qvel(qvel)),
                qvel,
            )

        ctrl = self.get_actuator_joints_qpos(qpos)
        data = F.init(model, qpos, qvel, ctrl)

        rng, push_rng = jax.random.split(rng)
        push_interval = jax.random.uniform(
            push_rng,
            dtype=jnp.float32,
            minval=self._config.push_config.interval_range[0],
            maxval=self._config.push_config.interval_range[1],
        )
        push_interval_steps = jnp.round(push_interval / self.dt).astype(jnp.int32)

        if self.use_imitation:
            ref = self.gait.reference_frame(cmd[0], cmd[1], cmd[2], imitation_i0)
        else:
            ref = jnp.zeros(0, jnp.float32)

        info = {
            "rng": rng,
            # strong-typed scalars: reset-state avals must match step-output
            # avals exactly, or jit caches miss and every rollout retraces
            "step": jnp.asarray(0, jnp.int32),
            "command": cmd,
            "last_act": jnp.zeros(self._actuators, jnp.float32),
            "last_last_act": jnp.zeros(self._actuators, jnp.float32),
            "last_last_last_act": jnp.zeros(self._actuators, jnp.float32),
            "motor_targets": self._default_actuator,
            "feet_air_time": jnp.zeros(2, jnp.float32),
            "last_contact": jnp.zeros(2, dtype=bool),
            "swing_peak": jnp.zeros(2, jnp.float32),
            "push": jnp.zeros(2, jnp.float32),
            "push_step": jnp.asarray(0, jnp.int32),
            "push_interval_steps": push_interval_steps,
            "action_history": jnp.zeros(
                self._config.noise_config.action_max_delay * self._actuators,
                jnp.float32,
            ),
            "imu_history": jnp.zeros(self._config.noise_config.imu_max_delay * 3, jnp.float32),
            "imitation_i": imitation_i0,
            "current_reference_motion": ref,
        }
        if self.obs_has_imitation_phase:
            if self.use_imitation and rsi_prob > 0.0:
                ph = imitation_i0 / self.gait.nb_steps_in_period * 2 * jnp.pi
                info["imitation_phase"] = jnp.stack([jnp.cos(ph), jnp.sin(ph)])
            else:
                info["imitation_phase"] = jnp.zeros(2, jnp.float32)

        metrics = {}
        for k, v in self._config.reward_config.scales.items():
            if v != 0:
                metrics[("reward/" if v > 0 else "cost/") + k] = jnp.zeros((), jnp.float32)
        metrics["swing_peak"] = jnp.zeros((), jnp.float32)
        # competence scalars (extension beyond the reference, which streams
        # reward only — runner.py:56-66): closed-loop transfer measurements
        # showed eval reward saturates then anti-correlates with command
        # tracking (RESULTS.md), so the tracking errors themselves are
        # streamed. Keys must exist at reset: scan carries require the
        # reset/step State pytrees to match exactly.
        metrics["tracking_err/lin_vel"] = jnp.zeros((), jnp.float32)
        metrics["tracking_err/ang_vel"] = jnp.zeros((), jnp.float32)
        if self._actuators == 14:
            metrics["tracking_err/head"] = jnp.zeros((), jnp.float32)

        contact = C.feet_contact_flags(model, data.contact_dist)
        obs = self._get_obs(data, info, contact)
        return State(
            data=data,
            obs=obs,
            reward=jnp.zeros((), jnp.float32),
            done=jnp.zeros((), jnp.float32),
            metrics=metrics,
            info=info,
        )

    # ------------------------------------------------------------------- step
    def step(self, state: State, action: jax.Array, model=None) -> State:
        model = model if model is not None else self._model
        # coerce caller-supplied actions to the engine dtype (callers running
        # under jax_enable_x64 would otherwise promote state leaves to f64)
        action = jnp.asarray(action, jnp.float32)
        info = dict(state.info)
        cfg = self._config

        if self.use_imitation:
            imitation_i = (info["imitation_i"] + 1) % self.gait.nb_steps_in_period
            info["imitation_i"] = imitation_i
            if self.obs_has_imitation_phase:
                ph = imitation_i / self.gait.nb_steps_in_period * 2 * jnp.pi
                info["imitation_phase"] = jnp.stack([jnp.cos(ph), jnp.sin(ph)])
            cmd = info["command"]
            info["current_reference_motion"] = self.gait.reference_frame(
                cmd[0], cmd[1], cmd[2], imitation_i
            )
        else:
            info["imitation_i"] = jnp.asarray(0, jnp.int32)

        rng, push1_rng, push2_rng, delay_rng = jax.random.split(info["rng"], 4)
        info["rng"] = rng

        # action delay buffer
        hist = (
            jnp.roll(info["action_history"], self._actuators)
            .at[: self._actuators]
            .set(action)
        )
        info["action_history"] = hist
        idx = jax.random.randint(
            delay_rng,
            (),
            minval=cfg.noise_config.action_min_delay,
            maxval=cfg.noise_config.action_max_delay,
        )
        action_delayed = hist.reshape(-1, self._actuators)[idx]

        # random planar push injected into base velocity
        theta = jax.random.uniform(push1_rng, dtype=jnp.float32, maxval=2 * jnp.pi)
        magnitude = jax.random.uniform(
            push2_rng,
            dtype=jnp.float32,
            minval=cfg.push_config.magnitude_range[0],
            maxval=cfg.push_config.magnitude_range[1],
        )
        push = jnp.stack([jnp.cos(theta), jnp.sin(theta)])
        push *= jnp.mod(info["push_step"] + 1, info["push_interval_steps"]) == 0
        push *= cfg.push_config.enable
        a = self._floating_base_qvel_addr
        qvel = state.data.qvel.at[a : a + 2].add(push * magnitude)
        data = state.data.replace(qvel=qvel)

        motor_targets = self._default_actuator + action_delayed * cfg.action_scale
        if self.use_motor_speed_limits:
            prev = info["motor_targets"]
            lim = cfg.max_motor_velocity * self.dt
            motor_targets = jnp.clip(motor_targets, prev - lim, prev + lim)

        # Reference joystick.py:419 ships this commented out; exposed here
        # as a config flag (default off = parity) because it is the only
        # way head commands beyond action_scale's ±0.25 rad authority can
        # be reached at all: head servo targets come straight from the
        # command, the policy controls only the legs through its actions.
        if self._actuators == 14 and bool(
            self._config.get("head_direct_targets", False)
        ):
            motor_targets = motor_targets.at[5:9].set(info["command"][3:7])

        data = F.step(model, data, motor_targets, self.n_substeps,
                      use_megakernel=self.use_megakernel)
        info["motor_targets"] = motor_targets

        contact = C.feet_contact_flags(model, data.contact_dist)
        contact_filt = contact | info["last_contact"]
        first_contact = (info["feet_air_time"] > 0.0) * contact_filt
        info["feet_air_time"] = info["feet_air_time"] + self.dt
        p_fz = data.site_xpos[self._feet_site_id][..., -1]
        info["swing_peak"] = jnp.maximum(info["swing_peak"], p_fz)

        obs = self._get_obs(data, info, contact)
        done = self._get_termination(data)

        raw = self._get_reward(data, action, info, done, first_contact, contact)
        scaled = {k: v * cfg.reward_config.scales[k] for k, v in raw.items()}
        reward = jnp.clip(sum(scaled.values()) * self.dt, 0.0, 10000.0)

        info["push"] = push
        info["step"] = info["step"] + 1
        info["push_step"] = info["push_step"] + 1
        info["last_last_last_act"] = info["last_last_act"]
        info["last_last_act"] = info["last_act"]
        info["last_act"] = action
        cmd_active = info["command"]  # this step's command (pre-resample)
        info["rng"], cmd_rng = jax.random.split(info["rng"])
        info["command"] = jnp.where(
            info["step"] > 500, self.sample_command(cmd_rng), info["command"]
        )
        info["step"] = jnp.where(done | (info["step"] > 500), 0, info["step"])
        info["feet_air_time"] = info["feet_air_time"] * ~contact
        info["last_contact"] = contact
        info["swing_peak"] = info["swing_peak"] * ~contact

        metrics = dict(state.metrics)
        for k, v in raw.items():
            sc = cfg.reward_config.scales[k]
            if sc != 0:
                metrics[("reward/" if sc > 0 else "cost/") + k] = (
                    v if sc > 0 else -v
                )
        metrics["swing_peak"] = jnp.mean(info["swing_peak"])
        # competence scalars vs the command that was ACTIVE this step (cmd
        # was captured before the resample above); see reset for rationale
        local_vel = self.get_local_linvel(data)
        gyro_w = self.get_gyro(data)
        metrics["tracking_err/lin_vel"] = jnp.linalg.norm(
            cmd_active[:2] - local_vel[:2]
        )
        metrics["tracking_err/ang_vel"] = jnp.abs(cmd_active[2] - gyro_w[2])
        if self._actuators == 14:
            head_q = self.get_actuator_joints_qpos(data.qpos)[5:9]
            metrics["tracking_err/head"] = jnp.mean(
                jnp.abs(head_q - cmd_active[3:7])
            )

        return state.replace(
            data=data,
            obs=obs,
            reward=reward,
            done=done.astype(reward.dtype),
            metrics=metrics,
            info=info,
        )

    def _get_termination(self, data) -> jax.Array:
        fall = self.get_gravity(data)[-1] < 0.0
        return fall | jnp.isnan(data.qpos).any() | jnp.isnan(data.qvel).any()

    # -------------------------------------------------------------------- obs
    def _noisy(self, info, x, scale):
        info["rng"], key = jax.random.split(info["rng"])
        lvl = self._config.noise_config.level
        return x + (2.0 * jax.random.uniform(key, x.shape, x.dtype) - 1.0) * lvl * scale

    def _get_obs(self, data, info: Dict[str, Any], contact: jax.Array):
        cfg = self._config
        gyro = self.get_gyro(data)
        noisy_gyro = self._noisy(info, gyro, cfg.noise_config.scales.gyro)

        accelerometer = self.get_accelerometer(data)
        # (the reference's +1.3 x-offset is a discarded no-op in training;
        # replicated as-is, see module docstring)
        noisy_accel = self._noisy(
            info, accelerometer, cfg.noise_config.scales.accelerometer
        )

        gravity = data.site_xmat[self._site_id].T @ jnp.array([0.0, 0, -1], data.qpos.dtype)
        noisy_gravity = self._noisy(info, gravity, cfg.noise_config.scales.gravity)

        # IMU delay buffer (maintained, consumed by the privileged signal path)
        imu_hist = jnp.roll(info["imu_history"], 3).at[:3].set(noisy_gravity)
        info["imu_history"] = imu_hist
        info["rng"], imu_rng = jax.random.split(info["rng"])
        imu_idx = jax.random.randint(
            imu_rng,
            (),
            minval=cfg.noise_config.imu_min_delay,
            maxval=cfg.noise_config.imu_max_delay,
        )
        noisy_gravity = imu_hist.reshape(-1, 3)[imu_idx]
        del noisy_gravity  # parity: computed but unused in "state"

        joint_angles = self.get_actuator_angles_with_backlash(data.qpos)
        noisy_joint_angles = self._noisy(info, joint_angles, self._qpos_noise_scale)

        joint_vel = self.get_actuator_joints_qvel(data.qvel)
        noisy_joint_vel = self._noisy(
            info, joint_vel, cfg.noise_config.scales.joint_vel
        )

        linvel = self.get_local_linvel(data)

        parts = [
            noisy_gyro,
            noisy_accel,
            info["command"],
            noisy_joint_angles - self._default_actuator,
            noisy_joint_vel * cfg.dof_vel_scale,
            info["last_act"],
            info["last_last_act"],
            info["last_last_last_act"],
        ]
        if self.obs_has_motor_targets:
            parts.append(info["motor_targets"])
        parts.append(contact)
        if self.obs_has_imitation_phase:
            parts.append(info["imitation_phase"])
        else:
            parts.append(info["current_reference_motion"])
        state = jnp.hstack(parts)

        global_angvel = self.get_global_angvel(data)
        feet_vel = data.sensordata[self._foot_linvel_sensor_adr.ravel()]
        root_height = data.qpos[self._floating_base_qpos_addr + 2]

        priv = [
            state,
            gyro,
            accelerometer,
            gravity,
            linvel,
            global_angvel,
            joint_angles - self._default_actuator,
            joint_vel,
            root_height,
            data.actuator_force,
            contact,
            feet_vel,
            info["feet_air_time"],
            info["current_reference_motion"],
        ]
        if self.obs_has_imitation_phase:
            priv += [jnp.asarray(info["imitation_i"], jnp.float32)[None],
                     info["imitation_phase"]]
        privileged_state = jnp.hstack(priv)

        return {"state": state, "privileged_state": privileged_state}

    # ---------------------------------------------------------------- rewards
    def _get_reward(self, data, action, info, done, first_contact, contact):
        del done, first_contact
        cfg = self._config
        return {
            "tracking_lin_vel": R.tracking_lin_vel(
                info["command"],
                self.get_local_linvel(data),
                cfg.reward_config.tracking_sigma,
            ),
            "tracking_ang_vel": R.tracking_ang_vel(
                info["command"], self.get_gyro(data), cfg.reward_config.tracking_sigma
            ),
            "torques": R.torques(data.actuator_force),
            "action_rate": R.action_rate(action, info["last_act"]),
            "alive": R.alive(),
            "imitation": imitation.imitation_reward(
                self.get_floating_base_qvel(data.qvel),
                self.get_actuator_joints_qpos(data.qpos),
                self.get_actuator_joints_qvel(data.qvel),
                contact,
                info["current_reference_motion"],
                info["command"],
                self.use_imitation,
                ref_jpos_offset=self._imitation_ref_offset,
            ),
            "stand_still": R.stand_still(
                info["command"],
                self.get_actuator_joints_qpos(data.qpos),
                self.get_actuator_joints_qvel(data.qvel),
                self._default_actuator,
                ignore_head=False,
            ),
            # extension (scale 0.0 by default = reference parity): linear
            # velocity-along-command shaping to break stand-still optima on
            # fragile variants; enable per-run via
            # --config_override reward_config.scales.progress=3.0
            "progress": R.forward_progress(
                info["command"], self.get_local_linvel(data)
            ),
            # extension (scale 0.0 default): linear yaw-rate error cost —
            # restores the heading gradient the flat exp kernel loses
            "yaw_rate_l1": R.yaw_rate_l1(
                info["command"], self.get_gyro(data)
            ),
            # extension (scale 0.0 default): linear planar-velocity error
            # cost — the translation analog (kills turn-in-place drift)
            "lin_vel_l1": R.lin_vel_l1(
                info["command"], self.get_local_linvel(data)
            ),
        }

    # ---------------------------------------------------------------- command
    def sample_command(self, rng: jax.Array) -> jax.Array:
        cfg = self._config
        keys = jax.random.split(rng, 8)
        f = cfg.head_range_factor

        def u(key, lohi, factor=1.0):
            return jax.random.uniform(
                key, dtype=jnp.float32,
                minval=lohi[0] * factor, maxval=lohi[1] * factor,
            )

        cmd = jnp.hstack(
            [
                u(keys[0], cfg.lin_vel_x),
                u(keys[1], cfg.lin_vel_y),
                u(keys[2], cfg.ang_vel_yaw),
                u(keys[4], cfg.neck_pitch_range, f),
                u(keys[5], cfg.head_pitch_range, f),
                u(keys[6], cfg.head_yaw_range, f),
                u(keys[7], cfg.head_roll_range, f),
            ]
        )
        return jnp.where(jax.random.bernoulli(keys[3], p=0.1), jnp.zeros(7, jnp.float32), cmd)
