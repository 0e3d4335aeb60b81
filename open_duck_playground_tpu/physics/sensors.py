"""Sensor pipeline for the duck's 15 site-based sensors
(reference xmls/sensors.xml:1-16): gyro, velocimeter, accelerometer,
frame{z,x}axis, frame{lin,ang}vel, framepos, framequat."""

from __future__ import annotations

import jax.numpy as jnp

from open_duck_playground_tpu.physics import maths
from open_duck_playground_tpu.physics.types import Model


def body_cacc(m: Model, cdof, cdof_dot, qvel, qacc):
    """Post-dynamics body spatial accelerations (mj_rnePostConstraint role):
    cacc_b = [0; -g] + sum_{dofs above b} (cdof_dot*qvel + cdof*qacc)."""
    dtype = cdof.dtype
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -m.gravity])
    mask = m.ancestor_mask.astype(dtype)
    return a0[None, :] + jnp.einsum(
        "bv,vk->bk", mask, cdof_dot * qvel[:, None] + cdof * qacc[:, None]
    )


def sensor_data(
    m: Model,
    xquat,
    site_xpos,
    site_xmat,
    com,
    cvel,
    cacc,
) -> jnp.ndarray:
    s = m.spec
    out = jnp.zeros(s.nsensordata, dtype=site_xpos.dtype)
    for kind, objid, adr, dim in s.sensors:
        b = s.site_bodyid[objid]
        p = site_xpos[objid]
        rot = site_xmat[objid]  # world<-site
        w = cvel[b, :3]
        v_p = cvel[b, 3:] + jnp.cross(w, p - com)
        if kind == "gyro":
            val = rot.T @ w
        elif kind == "velocimeter":
            val = rot.T @ v_p
        elif kind == "accelerometer":
            a_p = cacc[b, 3:] + jnp.cross(cacc[b, :3], p - com) + jnp.cross(w, v_p)
            val = rot.T @ a_p
        elif kind == "framezaxis":
            val = rot[:, 2]
        elif kind == "framexaxis":
            val = rot[:, 0]
        elif kind == "framelinvel":
            val = v_p
        elif kind == "frameangvel":
            val = w
        elif kind == "framepos":
            val = p
        elif kind == "framequat":
            val = maths.quat_mul(xquat[b], m.site_quat[objid])
        else:  # pragma: no cover
            raise NotImplementedError(kind)
        out = out.at[adr : adr + dim].set(val)
    return out
