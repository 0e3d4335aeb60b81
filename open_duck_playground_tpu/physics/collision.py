"""Collision: convex foot hulls vs plane or heightfield floor.

Fixed-slot contact generation (points_per_foot deepest hull vertices per
foot), static shapes throughout — the TPU-native replacement for MJX's
collision drivers + `geoms_colliding` (reference joystick.py:27,315,426).
A contact slot is active iff dist < 0, matching C-MuJoCo's margin=0
instantiation rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.physics import maths
from open_duck_playground_tpu.physics.types import Contact, Model


def _combine_params(m: Model, foot_gid: int, floor_gid: int):
    """MuJoCo contact-parameter combination: higher geom_priority wins
    outright; equal priority -> elementwise max friction, solmix-weighted
    solref/solimp (solmix defaults equal -> mean). The duck floor has
    priority=1 so floor params win; implemented generally anyway."""
    pf = m.geom_priority[foot_gid]
    pl = m.geom_priority[floor_gid]
    floor_wins = pl > pf
    foot_wins = pf > pl
    fric_eq = jnp.maximum(m.geom_friction[foot_gid], m.geom_friction[floor_gid])
    solref_eq = 0.5 * (m.geom_solref[foot_gid] + m.geom_solref[floor_gid])
    solimp_eq = 0.5 * (m.geom_solimp[foot_gid] + m.geom_solimp[floor_gid])

    def pick(a, b, eq):
        return jnp.where(floor_wins, b, jnp.where(foot_wins, a, eq))

    geom_fric = pick(m.geom_friction[foot_gid], m.geom_friction[floor_gid], fric_eq)
    # geom friction is (slide, torsion, roll); CONTACT friction is
    # (tangent1, tangent2, torsional, ...) = (slide, slide, torsion)
    friction = jnp.stack([geom_fric[0], geom_fric[0], geom_fric[1]])
    solref = pick(m.geom_solref[foot_gid], m.geom_solref[floor_gid], solref_eq)
    solimp = pick(m.geom_solimp[foot_gid], m.geom_solimp[floor_gid], solimp_eq)
    return friction, solref, solimp


def _hfield_height_normal(m: Model, x, y):
    """Height + triangle normal of the heightfield under world point (x,y).
    MuJoCo grid: data (nrow, ncol) in [0,1]; x spans [-sx,sx] over columns,
    y spans [-sy,sy] over rows; z = data*size[2]. Cells split into two
    triangles along the (+x,+y) diagonal."""
    s = m.spec
    sx, sy, sz = m.hfield_size[0], m.hfield_size[1], m.hfield_size[2]
    ncol, nrow = s.hfield_ncol, s.hfield_nrow
    dx = 2 * sx / (ncol - 1)
    dy = 2 * sy / (nrow - 1)
    fx = jnp.clip((x + sx) / dx, 0.0, ncol - 1.001)
    fy = jnp.clip((y + sy) / dy, 0.0, nrow - 1.001)
    i = jnp.floor(fx).astype(jnp.int32)
    j = jnp.floor(fy).astype(jnp.int32)
    u = fx - i
    v = fy - j
    z00 = m.hfield_data[j, i] * sz
    z10 = m.hfield_data[j, i + 1] * sz
    z01 = m.hfield_data[j + 1, i] * sz
    z11 = m.hfield_data[j + 1, i + 1] * sz
    lower = u + v <= 1.0  # triangle (00,10,01) else (11,10,01)
    h_lo = z00 + u * (z10 - z00) + v * (z01 - z00)
    h_hi = z11 + (1 - u) * (z01 - z11) + (1 - v) * (z10 - z11)
    h = jnp.where(lower, h_lo, h_hi)
    # triangle normals (unnormalized): lower: (-(z10-z00)/dx, -(z01-z00)/dy, 1)
    nx = jnp.where(lower, -(z10 - z00) / dx, (z01 - z11) / dx)
    ny = jnp.where(lower, -(z01 - z00) / dy, (z10 - z11) / dy)
    n = jnp.stack([nx, ny, jnp.ones_like(nx)], axis=-1)
    return h, n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def collide(m: Model, xpos, xquat) -> Contact:
    """Generate the fixed-slot contact set for all foot geoms vs the floor."""
    s = m.spec
    k = s.points_per_foot
    dtype = xpos.dtype

    floor_b = s.geom_bodyid[s.floor_geom_id]
    floor_pos = xpos[floor_b] + maths.quat_rotate(
        xquat[floor_b], m.geom_pos[s.floor_geom_id]
    )
    floor_quat = maths.quat_mul(xquat[floor_b], m.geom_quat[s.floor_geom_id])

    dists, poss, frames, fric, srefs, simps, foot_ix = [], [], [], [], [], [], []
    for fi, gid in enumerate(s.collide_geom_ids):
        b = s.geom_bodyid[gid]
        gpos = xpos[b] + maths.quat_rotate(xquat[b], m.geom_pos[gid])
        gquat = maths.quat_mul(xquat[b], m.geom_quat[gid])
        verts = gpos + maths.quat_rotate(gquat[None], m.foot_hull[fi])  # (nvert,3)

        if not s.floor_is_hfield:
            n = maths.quat_rotate(floor_quat, jnp.array([0.0, 0, 1], dtype))
            d = (verts - floor_pos) @ n  # signed distance of each vertex
            neg_d, idx = jax.lax.top_k(-d, k)
            vsel = verts[idx]
            dist = -neg_d
            normal = jnp.broadcast_to(n, (k, 3))
        else:
            # hfield is axis-aligned at the floor body frame (identity here)
            rel = verts - floor_pos
            h, n_local = _hfield_height_normal(m, rel[:, 0], rel[:, 1])
            d = (rel[:, 2] - h) * n_local[:, 2]  # project onto normal
            neg_d, idx = jax.lax.top_k(-d, k)
            vsel = verts[idx]
            dist = -neg_d
            normal = n_local[idx]

        pos = vsel - 0.5 * dist[:, None] * normal
        # tangent frame, MuJoCo mju_makeFrame convention: reference axis =
        # the world axis least aligned with the normal, t1 = n x r, t2 = n x t1
        ex = jnp.broadcast_to(jnp.array([1.0, 0, 0], dtype), normal.shape)
        ey = jnp.broadcast_to(jnp.array([0.0, 1, 0], dtype), normal.shape)
        r = jnp.where(
            (jnp.abs(normal[:, 0]) <= jnp.abs(normal[:, 1]))[:, None], ex, ey
        )
        t1 = jnp.cross(normal, r)
        t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
        t2 = jnp.cross(normal, t1)
        frame = jnp.stack([normal, t1, t2], axis=-2)  # (k,3,3)

        friction, solref, solimp = _combine_params(m, gid, s.floor_geom_id)

        dists.append(dist)
        poss.append(pos)
        frames.append(frame)
        fric.append(jnp.broadcast_to(friction, (k, 3)))
        srefs.append(jnp.broadcast_to(solref, (k, 2)))
        simps.append(jnp.broadcast_to(solimp, (k, 5)))
        foot_ix.append(jnp.full((k,), fi, dtype=jnp.int32))

    return Contact(
        dist=jnp.concatenate(dists),
        pos=jnp.concatenate(poss),
        frame=jnp.concatenate(frames),
        friction=jnp.concatenate(fric),
        solref=jnp.concatenate(srefs),
        solimp=jnp.concatenate(simps),
        foot_index=jnp.concatenate(foot_ix),
    )


def feet_contact_flags(m: Model, contact_dist: jnp.ndarray) -> jnp.ndarray:
    """Per-foot boolean contact flags from fixed-slot contact distances (the
    `geoms_colliding` equivalent, reference joystick.py:313-318,424-429)."""
    k = m.spec.points_per_foot
    nfoot = len(m.spec.collide_geom_ids)
    d = contact_dist.reshape(nfoot, k)
    return (d < 0).any(axis=1)
