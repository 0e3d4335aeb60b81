"""Imitation reward vs the polynomial reference gait.

Behavioral spec: reference `custom_rewards.py:4-149`. Reference frame layout
(40 dims): joint pos 0:16, joint vel 16:32, foot contacts 32:34, base linear
vel 34:37, base angular vel 37:40 (poly_reference_motion.py:6-51). The
16-dim joint order includes neck/head/antennas at 5:11, which the duck's
14-actuator layout drops (head handled by its own commands), so both sides
keep legs only: ref[:5]+ref[11:], robot joints [:5]+[9:].
"""

from __future__ import annotations

import jax.numpy as jnp

_W_LIN_XY = 1.0
_W_LIN_Z = 1.0
_W_ANG_XY = 0.5
_W_ANG_Z = 0.5
_W_JOINT_POS = 15.0
_W_JOINT_VEL = 1.0e-3
_W_CONTACT = 1.0

# The gait library was authored for the FULL robot, whose balanced stance is
# the flat-terrain "home" keyframe (leg slice below, scene_flat_terrain.xml
# keyframe). Robot variants with a different mass distribution re-balance
# their home keyframe (e.g. no-head: hip_pitch -0.63 -> -0.81, ankle
# -0.784 -> -0.554, restoring the full robot's CoM support margin); their gait
# targets must be retargeted by the home-pose delta or the W_JOINT_POS pull
# drags the robot toward a stance that tips it over (the observed stand-still
# local optimum on the no-head build).
GAIT_HOME_LEGS = jnp.array(
    [0.002, 0.053, -0.63, 1.368, -0.784, -0.003, -0.065, 0.635, 1.379, -0.796],
    jnp.float32,
)


def imitation_reward(
    base_qvel,
    joints_qpos,
    joints_qvel,
    contacts,
    ref_frame,
    cmd,
    enabled: bool = True,
    ref_jpos_offset=None,
):
    """`ref_jpos_offset` (10-dim legs order, or None): additive retarget of
    the reference joint positions, = variant home pose − GAIT_HOME_LEGS."""
    if not enabled:
        return jnp.nan_to_num(0.0)

    legs = lambda x16: jnp.concatenate([x16[:5], x16[11:]])
    if joints_qpos.shape[-1] == 10:  # no-head robot: all joints are legs
        robot_legs = lambda x10: x10
    else:
        robot_legs = lambda x14: jnp.concatenate([x14[:5], x14[9:]])

    lin = base_qvel[:3]
    ang = base_qvel[3:6]
    ref_lin = ref_frame[34:37]
    ref_ang = ref_frame[37:40]

    r = _W_LIN_XY * jnp.exp(-8.0 * jnp.sum(jnp.square(lin[:2] - ref_lin[:2])))
    r += _W_LIN_Z * jnp.exp(-8.0 * jnp.square(lin[2] - ref_lin[2]))
    r += _W_ANG_XY * jnp.exp(-2.0 * jnp.sum(jnp.square(ang[:2] - ref_ang[:2])))
    r += _W_ANG_Z * jnp.exp(-2.0 * jnp.square(ang[2] - ref_ang[2]))
    ref_jpos = legs(ref_frame[0:16])
    if ref_jpos_offset is not None:
        ref_jpos = ref_jpos + ref_jpos_offset
    r -= _W_JOINT_POS * jnp.sum(jnp.square(robot_legs(joints_qpos) - ref_jpos))
    r -= _W_JOINT_VEL * jnp.sum(
        jnp.square(robot_legs(joints_qvel) - legs(ref_frame[16:32]))
    )
    ref_contacts = (ref_frame[32:34] > 0.5).astype(contacts.dtype)
    r += _W_CONTACT * jnp.sum(contacts.astype(ref_contacts.dtype) == ref_contacts)

    r *= jnp.linalg.norm(cmd[:3]) > 0.01  # no reward at zero command
    return jnp.nan_to_num(r)
