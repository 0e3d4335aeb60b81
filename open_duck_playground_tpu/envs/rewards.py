"""Reward/cost terms for the duck tasks.

Behavioral spec: reference `playground/common/rewards.py` (file:line cited per
function). All terms are NaN-guarded like the reference and written for f32
TPU execution; they vmap over env batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def _nn(x):
    return jnp.nan_to_num(x)


def tracking_lin_vel(cmd, local_vel, sigma):
    """Exp-kernel xy velocity tracking with a 0.1 m/s lateral tolerance band
    (rewards.py:11-22)."""
    ex = jnp.square(cmd[0] - local_vel[0])
    ey = jnp.clip(jnp.abs(local_vel[1] - cmd[1]) - 0.1, 0.0, None)
    return _nn(jnp.exp(-(ex + jnp.square(ey)) / sigma))


def tracking_ang_vel(cmd, ang_vel, sigma):
    """Exp-kernel yaw-rate tracking (rewards.py:25-31)."""
    return _nn(jnp.exp(-jnp.square(cmd[2] - ang_vel[2]) / sigma))


def yaw_rate_l1(cmd, ang_vel):
    """Linear |yaw-rate error| cost (this repo's extension, scale 0.0 by
    default = parity). tracking_ang_vel's exp kernel (sigma 0.01) is
    numerically flat once |wz - cmd| > ~0.3 rad/s, so persistent heading
    drift sees no gradient; an L1 cost restores it everywhere (use a small
    negative scale)."""
    return _nn(jnp.abs(cmd[2] - ang_vel[2]))


def lin_vel_l1(cmd, local_vel):
    """Linear planar-velocity-error cost (this repo's extension, scale 0.0
    by default = parity). The translation analog of yaw_rate_l1:
    tracking_lin_vel's exp kernel is flat once the error exceeds ~0.3 m/s,
    so residual translation — e.g. drifting in a slow circle during a
    turn-in-place command — sees no gradient; an L1 cost restores it
    everywhere (use a small negative scale)."""
    return _nn(jnp.sum(jnp.abs(cmd[:2] - local_vel[:2])))


def forward_progress(cmd, local_vel):
    """LINEAR velocity-along-command shaping (this repo's extension, not in
    the reference — shipped with scale 0.0 for behavioral parity).

    The exp-kernel tracking terms are nearly flat around v=0, which leaves
    fragile builds (the no-head variant) in a stand-still local optimum;
    this term pays the commanded-direction velocity component linearly,
    capped at the commanded speed (no incentive to overshoot) and
    normalized by it (weight reads as reward-per-unit-fraction-tracked).
    Zero at zero command."""
    cn = jnp.linalg.norm(cmd[:2])
    along = jnp.dot(local_vel[:2], cmd[:2]) / jnp.maximum(cn, 1e-6)
    frac = jnp.clip(along, 0.0, cn) / jnp.maximum(cn, 1e-6)
    return _nn(frac * (cn > 0.01))


def torques(actuator_force):
    """Sum of squared actuator torques (rewards.py:68-69)."""
    return _nn(jnp.sum(jnp.square(actuator_force)))


def action_rate(act, last_act):
    """Squared action delta (rewards.py:77-79)."""
    return _nn(jnp.sum(jnp.square(act - last_act)))


def alive():
    """Constant survival bonus (rewards.py:124-125)."""
    return jnp.array(1.0, jnp.float32)


def orientation(torso_zaxis):
    """Squared tilt of the up-vector (rewards.py:45-46)."""
    return _nn(jnp.sum(jnp.square(torso_zaxis[:2])))


def stand_still(cmd, joints_qpos, joints_qvel, default_pose, ignore_head=False):
    """L1 pose+velocity deviation, gated to near-zero commands
    (rewards.py:93-117). With ignore_head, only the two 5-dof legs count
    (joint layout: 5 left leg, 4 head, 5 right leg)."""
    cmd_norm = jnp.linalg.norm(cmd[:3])
    if ignore_head and joints_qpos.shape[-1] == 10:
        ignore_head = False  # no-head robot: all joints ARE legs
    if ignore_head:
        sel = jnp.concatenate([jnp.arange(5), jnp.arange(9, 14)])
        pose = jnp.sum(jnp.abs(joints_qpos[sel] - default_pose[sel]))
        vel = jnp.sum(jnp.abs(joints_qvel[sel]))
    else:
        pose = jnp.sum(jnp.abs(joints_qpos - default_pose))
        vel = jnp.sum(jnp.abs(joints_qvel))
    return _nn(pose + vel) * (cmd_norm < 0.01)


def head_pos(joints_qpos, joints_qvel, cmd, ungated: bool = False):
    """Squared head-joint position error vs the 4 head commands, gated to
    moving commands (rewards.py:131-147). Head joints sit at slots 5:9.

    LATENT UPSTREAM BUG, replicated by default: the `move_norm > 0.01` gate
    means this cost is identically ZERO in the standing task (its sampler
    zeroes the locomotion dims, reference standing.py:647-661) — head
    tracking is structurally untrained upstream. `ungated=True` (this
    repo's config-exposed fix, off for parity) drops the gate so the
    standing task actually trains head-command tracking."""
    del joints_qvel
    if joints_qpos.shape[-1] == 10:  # no-head robot: nothing to track
        return jnp.array(0.0, jnp.float32)
    err = jnp.sum(jnp.square(joints_qpos[5:9] - cmd[3:]))
    if ungated:
        return _nn(err)
    move_norm = jnp.linalg.norm(cmd[:3])
    return _nn(err) * (move_norm > 0.01)


# --- extra terms the reference ships but doesn't wire into the two tasks
# (rewards.py:37-62,73-74,85-90,120-121,152-241); provided for capability
# parity so downstream users can compose them.


def lin_vel_z(global_linvel):
    return _nn(jnp.square(global_linvel[2]))


def ang_vel_xy(global_angvel):
    return _nn(jnp.sum(jnp.square(global_angvel[:2])))


def base_height(h, target):
    return _nn(jnp.square(h - target))


def base_y_swing(base_y_speed, freq, amplitude, t, sigma):
    target = amplitude * jnp.sin(2 * jnp.pi * freq * t)
    return _nn(jnp.exp(-jnp.square(target - base_y_speed) / sigma))


def energy(qvel, qfrc_actuator):
    return _nn(jnp.sum(jnp.abs(qvel) * jnp.abs(qfrc_actuator)))


def joint_pos_limits(qpos, soft_lowers, soft_uppers):
    out = -jnp.clip(qpos - soft_lowers, None, 0.0)
    out += jnp.clip(qpos - soft_uppers, 0.0, None)
    return _nn(jnp.sum(out))


def termination(done):
    return done


def joint_deviation(qpos, indices, default_pose, gate=1.0):
    return _nn(jnp.sum(jnp.abs(qpos[indices] - default_pose[indices]))) * gate


def pose(qpos, default_pose, weights):
    return _nn(jnp.sum(jnp.square(qpos - default_pose) * weights))


def feet_slip(contact, global_linvel):
    return _nn(jnp.sum(jnp.linalg.norm(global_linvel[:2], axis=-1) * contact))


def feet_clearance(feet_vel, foot_pos, max_foot_height):
    vel_norm = jnp.sqrt(jnp.linalg.norm(feet_vel[..., :2], axis=-1))
    delta = jnp.abs(foot_pos[..., -1] - max_foot_height)
    return _nn(jnp.sum(delta * vel_norm))


def feet_height(swing_peak, first_contact, max_foot_height):
    err = swing_peak / max_foot_height - 1.0
    return _nn(jnp.sum(jnp.square(err) * first_contact))


def feet_air_time(air_time, first_contact, cmd, tmin=0.1, tmax=0.5):
    t = jnp.clip((air_time - tmin) * first_contact, max=tmax - tmin)
    return _nn(jnp.sum(t)) * (jnp.linalg.norm(cmd[:3]) > 0.01)


def feet_phase(foot_pos, rz):
    err = jnp.sum(jnp.square(foot_pos[..., -1] - rz))
    return _nn(jnp.exp(-err / 0.01))
