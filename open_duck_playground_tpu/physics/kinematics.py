"""Forward kinematics + CoM-centered spatial quantities, vectorized.

Equivalent roles: MuJoCo mj_kinematics / mj_comPos / mj_comVel (the reference
delegates these to MJX, SURVEY §2.2). Loops run over static *tree levels*
(bodies batched per depth) and joint index sets, not individual bodies/dofs —
this keeps the traced graph ~10x smaller than naive unrolling, which matters
for XLA compile time on both CPU and TPU, while runtime stays fully batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST

from open_duck_playground_tpu.physics import maths, structure
from open_duck_playground_tpu.physics.types import FREE, HINGE, Model


def kinematics(m: Model, qpos: jnp.ndarray):
    """Returns (xpos, xquat, xanchor, xaxis, xipos, ximat, site_xpos, site_xmat)."""
    s = m.spec
    dtype = qpos.dtype
    xpos = jnp.zeros((s.nbody, 3), dtype)
    xquat = jnp.zeros((s.nbody, 4), dtype).at[:, 0].set(1.0)
    xanchor = jnp.zeros((s.njnt, 3), dtype)
    xaxis = jnp.zeros((s.njnt, 3), dtype).at[:, 2].set(1.0)

    for level in structure.tree_levels(s):
        ids = np.asarray(level)
        par = np.asarray([s.body_parentid[b] for b in level])
        pos = xpos[par] + maths.quat_rotate(xquat[par], m.body_pos[ids])
        quat = maths.quat_mul(xquat[par], m.body_quat[ids])

        maxj = max(s.body_jntnum[b] for b in level)
        for k in range(maxj):
            sub = [i for i, b in enumerate(level) if s.body_jntnum[b] > k]
            jids = [s.body_jntadr[level_b] + k for level_b in (level[i] for i in sub)]
            free = [(i, j) for i, j in zip(sub, jids) if s.jnt_type[j] == FREE]
            hinge = [(i, j) for i, j in zip(sub, jids) if s.jnt_type[j] == HINGE]
            if free:
                fi = np.asarray([i for i, _ in free])
                fq = np.asarray([s.jnt_qposadr[j] for _, j in free])
                fj = np.asarray([j for _, j in free])
                fpos = jnp.stack([qpos[a : a + 3] for a in fq])
                fquat = maths.quat_normalize(
                    jnp.stack([qpos[a + 3 : a + 7] for a in fq])
                )
                pos = pos.at[fi].set(fpos)
                quat = quat.at[fi].set(fquat)
                xanchor = xanchor.at[fj].set(fpos)
            if hinge:
                hi = np.asarray([i for i, _ in hinge])
                hj = np.asarray([j for _, j in hinge])
                hq = np.asarray([s.jnt_qposadr[j] for _, j in hinge])
                anchors = pos[hi] + maths.quat_rotate(quat[hi], m.jnt_pos[hj])
                axes_w = maths.quat_rotate(quat[hi], m.jnt_axis[hj])
                angles = qpos[hq] - m.qpos0[hq]
                quat_new = maths.quat_mul(
                    quat[hi], maths.axis_angle_to_quat(m.jnt_axis[hj], angles)
                )
                pos_new = anchors - maths.quat_rotate(quat_new, m.jnt_pos[hj])
                pos = pos.at[hi].set(pos_new)
                quat = quat.at[hi].set(quat_new)
                xanchor = xanchor.at[hj].set(anchors)
                xaxis = xaxis.at[hj].set(axes_w)
        xpos = xpos.at[ids].set(pos)
        xquat = xquat.at[ids].set(quat)

    xipos = xpos + maths.quat_rotate(xquat, m.body_ipos)
    ximat = maths.quat_to_mat(maths.quat_mul(xquat, m.body_iquat))

    site_body = np.asarray(s.site_bodyid)
    site_xpos = xpos[site_body] + maths.quat_rotate(xquat[site_body], m.site_pos)
    site_xmat = maths.quat_to_mat(maths.quat_mul(xquat[site_body], m.site_quat))

    return xpos, xquat, xanchor, xaxis, xipos, ximat, site_xpos, site_xmat


def com_cdof(m: Model, xquat, xanchor, xaxis, xipos):
    """Robot subtree CoM + per-dof motion vectors (nv, 6), MuJoCo cdof layout
    (angular, linear), centered at the subtree CoM."""
    s = m.spec
    dtype = xipos.dtype
    in_tree = m.ancestor_mask.any(axis=1)
    w = m.body_mass * in_tree
    com = (w[:, None] * xipos).sum(0) / w.sum()

    cdof = jnp.zeros((s.nv, 6), dtype)

    hj = structure.hinge_joints(s)
    if hj.size:
        hd = np.asarray([s.jnt_dofadr[j] for j in hj])
        ax = xaxis[hj]
        lin = jnp.cross(ax, com[None, :] - xanchor[hj])
        cdof = cdof.at[hd].set(jnp.concatenate([ax, lin], axis=-1))

    fj = structure.free_joint(s)
    if fj >= 0:
        d = s.jnt_dofadr[fj]
        b = s.jnt_bodyid[fj]
        eye = jnp.eye(3, dtype=dtype)
        zeros = jnp.zeros((3, 3), dtype)
        cdof = cdof.at[d : d + 3].set(jnp.concatenate([zeros, eye], axis=-1))
        rb = maths.quat_to_mat(xquat[b])  # rotational axes are body-frame
        axes = rb.T  # rows = body axes in world
        lin = jnp.cross(axes, com[None, :] - xanchor[fj][None, :])
        cdof = cdof.at[d + 3 : d + 6].set(jnp.concatenate([axes, lin], axis=-1))

    return com, cdof


def com_vel(m: Model, cdof, qvel):
    """cvel (nbody,6) and cdof_dot (nv,6) via static predecessor masks (exact
    mj_comVel semantics, single matmuls instead of a tree walk)."""
    s = m.spec
    dtype = cdof.dtype
    vdof = cdof * qvel[:, None]
    anc = m.ancestor_mask.astype(dtype)
    cvel = jnp.matmul(anc, vdof, precision=_HI)
    pred = jnp.asarray(structure.dof_pred_mask(s), dtype)
    carrier = jnp.matmul(pred, vdof, precision=_HI)
    ftm = jnp.asarray(structure.free_trans_mask(s), dtype)
    cdof_dot = maths.motion_cross(carrier, cdof) * ftm[:, None]
    return cvel, cdof_dot
