"""Smooth (unconstrained) dynamics: mass matrix, bias forces, passive forces,
position-servo actuation. Equivalent roles: mj_crb / mj_rne / mj_passive /
mj_fwdActuation. Dense formulation — at nv<=30 a dense (nv,nv) matrix batched
over thousands of envs is the TPU-friendly layout (MXU-shaped einsums, no
scatter/gather in the hot path)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
import numpy as np

from open_duck_playground_tpu.physics import maths
from open_duck_playground_tpu.physics.types import Model

_batched_inertia = jax.vmap(maths.inertia_matrix)


def body_inertias(m: Model, xipos, ximat, com):
    """Spatial inertia of every body about the CoM origin: (nbody, 6, 6)."""
    return _batched_inertia(m.body_mass, m.body_inertia, xipos - com, ximat)


def mass_matrix(m: Model, cdof, xipos, ximat, com):
    """Dense joint-space inertia M (nv, nv): M = sum_b J_b^T I_b J_b with
    J_b = ancestry-masked cdof. Armature added on the diagonal."""
    ibody = body_inertias(m, xipos, ximat, com)
    mask = m.ancestor_mask.astype(cdof.dtype)  # (nbody, nv)
    jb = mask[:, :, None] * cdof[None, :, :]  # (nbody, nv, 6)
    ij = jnp.einsum("bij,bvj->bvi", ibody, jb, precision=_HI)
    qm = jnp.einsum("bvi,bwi->vw", jb, ij, precision=_HI)
    return qm + jnp.diag(m.dof_armature)


def rne_bias(m: Model, cdof, cdof_dot, cvel, qvel, xipos, ximat, com):
    """qfrc_bias = C(q, qvel) + gravity loads (mj_rne with qacc=0)."""
    dtype = cdof.dtype
    gravity_acc = jnp.concatenate([jnp.zeros(3, dtype), -m.gravity])
    mask = m.ancestor_mask.astype(dtype)
    cacc = gravity_acc[None, :] + jnp.matmul(mask, cdof_dot * qvel[:, None], precision=_HI)
    ibody = body_inertias(m, xipos, ximat, com)
    iv = jnp.einsum("bij,bj->bi", ibody, cvel, precision=_HI)
    f = jnp.einsum("bij,bj->bi", ibody, cacc, precision=_HI) + maths.motion_cross_force(cvel, iv)
    fsum = jnp.matmul(mask.T, f, precision=_HI)  # (nv, 6)
    return jnp.einsum("vk,vk->v", cdof, fsum, precision=_HI)


def passive_force(m: Model, qvel):
    """qfrc_passive: viscous joint damping (duck model has no springs;
    eulerdamp is disabled so damping is explicit here)."""
    return -m.dof_damping * qvel


def actuation(m: Model, qpos, qvel, ctrl):
    """Position-servo actuators (MuJoCo affine gain/bias semantics):
    force = gain0*ctrl + bias1*length + bias2*velocity, clamped to forcerange;
    ctrl clamped to ctrlrange. Returns (actuator_force (nu,), qfrc (nv,))."""
    s = m.spec
    trn_j = np.asarray([s.jnt_qposadr[j] for j in s.actuator_trnid])
    trn_d = np.asarray([s.jnt_dofadr[j] for j in s.actuator_trnid])
    length = qpos[trn_j]
    velocity = qvel[trn_d]
    c = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1])
    force = (
        m.actuator_gainprm[:, 0] * c
        + m.actuator_biasprm[:, 0]
        + m.actuator_biasprm[:, 1] * length
        + m.actuator_biasprm[:, 2] * velocity
    )
    force = jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1])
    qfrc = jnp.zeros(s.nv, dtype=force.dtype).at[trn_d].set(force)
    return force, qfrc
