"""Forward kinematics over the static tree (unrolled at trace time).

Equivalent roles: MuJoCo mj_kinematics + mj_comPos (reference engine is MJX;
see SURVEY §2.2). The kinematic tree is tiny (18 bodies) and static, so we
unroll the Python loop — XLA sees a flat fused graph, which vmaps cleanly over
thousands of envs.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from open_duck_playground_tpu.physics import maths
from open_duck_playground_tpu.physics.types import FREE, HINGE, Data, Model


def kinematics(m: Model, qpos: jnp.ndarray):
    """Returns (xpos, xquat, xanchor, xaxis, xipos, ximat, site_xpos, site_xmat)."""
    s = m.spec
    dtype = qpos.dtype
    xpos = [None] * s.nbody
    xquat = [None] * s.nbody
    xanchor = [None] * s.njnt
    xaxis = [None] * s.njnt

    xpos[0] = jnp.zeros(3, dtype)
    xquat[0] = jnp.array([1.0, 0, 0, 0], dtype)

    for b in range(1, s.nbody):
        p = s.body_parentid[b]
        pos = xpos[p] + maths.quat_rotate(xquat[p], m.body_pos[b])
        quat = maths.quat_mul(xquat[p], m.body_quat[b])
        for j in range(s.body_jntadr[b], s.body_jntadr[b] + s.body_jntnum[b]):
            qadr = s.jnt_qposadr[j]
            if s.jnt_type[j] == FREE:
                pos = qpos[qadr : qadr + 3]
                quat = maths.quat_normalize(qpos[qadr + 3 : qadr + 7])
                xanchor[j] = pos
                xaxis[j] = jnp.array([0.0, 0, 1], dtype)
            elif s.jnt_type[j] == HINGE:
                anchor = pos + maths.quat_rotate(quat, m.jnt_pos[j])
                axis_w = maths.quat_rotate(quat, m.jnt_axis[j])
                angle = qpos[qadr] - m.qpos0[qadr]
                quat = maths.quat_mul(
                    quat, maths.axis_angle_to_quat(m.jnt_axis[j], angle)
                )
                pos = anchor - maths.quat_rotate(quat, m.jnt_pos[j])
                xanchor[j] = anchor
                xaxis[j] = axis_w
            else:  # pragma: no cover
                raise NotImplementedError
        xpos[b] = pos
        xquat[b] = quat

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xanchor = jnp.stack(xanchor)
    xaxis = jnp.stack(xaxis)

    xipos = xpos + maths.quat_rotate(xquat, m.body_ipos)
    ximat = maths.quat_to_mat(maths.quat_mul(xquat, m.body_iquat))

    site_body = jnp.asarray(s.site_bodyid)
    site_xpos = xpos[site_body] + maths.quat_rotate(xquat[site_body], m.site_pos)
    site_xmat = maths.quat_to_mat(maths.quat_mul(xquat[site_body], m.site_quat))

    return xpos, xquat, xanchor, xaxis, xipos, ximat, site_xpos, site_xmat


def com_cdof(m: Model, xquat, xanchor, xaxis, xipos):
    """Robot subtree CoM (spatial origin) + per-dof motion vectors (nv, 6),
    MuJoCo cdof layout: (angular, linear), centered at the subtree CoM."""
    s = m.spec
    dtype = xipos.dtype
    in_tree = m.ancestor_mask.any(axis=1)  # bodies with any dof above them
    w = m.body_mass * in_tree
    com = (w[:, None] * xipos).sum(0) / w.sum()

    cols = []
    for j in range(s.njnt):
        b = s.jnt_bodyid[j]
        if s.jnt_type[j] == FREE:
            eye = jnp.eye(3, dtype=dtype)
            zero = jnp.zeros((3, 3), dtype=dtype)
            # translational dofs: world axes
            for i in range(3):
                cols.append(jnp.concatenate([zero[i], eye[i]]))
            # rotational dofs: body-frame axes (qvel angular part is local)
            rb = maths.quat_to_mat(xquat[b])
            for i in range(3):
                ax = rb[:, i]
                cols.append(jnp.concatenate([ax, jnp.cross(ax, com - xanchor[j])]))
        else:
            ax = xaxis[j]
            cols.append(jnp.concatenate([ax, jnp.cross(ax, com - xanchor[j])]))
    cdof = jnp.stack(cols)
    return com, cdof


def com_vel(m: Model, cdof, qvel):
    """cvel (nbody,6) + cdof_dot (nv,6), MuJoCo mj_comVel semantics: each dof's
    cdof_dot uses the carrier velocity accumulated before that dof."""
    s = m.spec
    dtype = cdof.dtype
    cvel = [jnp.zeros(6, dtype)] * s.nbody
    cdof_dot = [jnp.zeros(6, dtype)] * s.nv
    for b in range(1, s.nbody):
        v = cvel[s.body_parentid[b]]
        for j in range(s.body_jntadr[b], s.body_jntadr[b] + s.body_jntnum[b]):
            dadr = s.jnt_dofadr[j]
            if s.jnt_type[j] == FREE:
                # translational dofs: cdof constant, cdof_dot = 0
                v = v + cdof[dadr : dadr + 3].T @ qvel[dadr : dadr + 3]
                for i in range(3):
                    d = dadr + 3 + i
                    cdof_dot[d] = maths.motion_cross(v, cdof[d])
                v = v + cdof[dadr + 3 : dadr + 6].T @ qvel[dadr + 3 : dadr + 6]
            else:
                d = s.jnt_dofadr[j]
                cdof_dot[d] = maths.motion_cross(v, cdof[d])
                v = v + cdof[d] * qvel[d]
        cvel[b] = v
    return jnp.stack(cvel), jnp.stack(cdof_dot)
