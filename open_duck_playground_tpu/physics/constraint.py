"""Constraint assembly: static-shape efc rows (dof friction, joint limits,
pyramidal contact facets), MuJoCo soft-constraint semantics.

Row layout (static):
  [0, nfric)                      dof frictionloss rows (always active)
  [nfric, nfric+nlimit)           joint limit rows (active iff violation)
  [nfric+nlimit, nefc)            contact pyramid facets, 4 per contact slot
                                  (2*(condim-1), condim=3), active iff dist<0

Formulas validated against C-MuJoCo 3.10 efc_* arrays (see tests):
  impedance d(pos) from solimp spline; B = 2/(dmax*tc); K = 1/(dmax^2 tc^2 zeta^2)
  aref = -B*vel - K*d*pos;  R = max((1-d)/d * diagApprox, MINVAL);  D = 1/R
  diagApprox: dof_invweight0 for friction/limits;
              2*mu^2*(1+mu^2)*(sum body_invweight0_trn) for pyramid facets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from open_duck_playground_tpu.physics.types import Contact, Model

_MINVAL = 1e-15
_MINIMP, _MAXIMP = 0.0001, 0.9999


class EfcRows(NamedTuple):
    J: jnp.ndarray  # (nefc, nv)
    aref: jnp.ndarray  # (nefc,)
    D: jnp.ndarray  # (nefc,) inverse regularizer (0 for inactive rows)
    R: jnp.ndarray  # (nefc,)
    frictionloss: jnp.ndarray  # (nefc,) >0 marks a friction (Huber) row
    pos: jnp.ndarray  # (nefc,)


def impedance(solimp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    dmin, dmax, width, mid, power = (
        solimp[..., 0],
        solimp[..., 1],
        solimp[..., 2],
        solimp[..., 3],
        solimp[..., 4],
    )
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
    a = 1.0 / jnp.power(mid, power - 1)
    b = 1.0 / jnp.power(1 - mid, power - 1)
    y = jnp.where(
        x < mid, a * jnp.power(x, power), 1 - b * jnp.power(1 - x, power)
    )
    return jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)


def kb(solref: jnp.ndarray, solimp: jnp.ndarray):
    """Stiffness/damping from solref (standard positive form, or direct
    negative form K=-solref0, B=-solref1)."""
    tc, zeta = solref[..., 0], solref[..., 1]
    dmax = solimp[..., 1]
    k_std = 1.0 / jnp.maximum(dmax * dmax * tc * tc * zeta * zeta, _MINVAL)
    b_std = 2.0 / jnp.maximum(dmax * tc, _MINVAL)
    direct = (tc <= 0) | (zeta <= 0)
    k = jnp.where(direct, -tc, k_std)
    b = jnp.where(direct, -zeta, b_std)
    return k, b


def make_constraints(
    m: Model,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    cdof: jnp.ndarray,
    com: jnp.ndarray,
    contact: Contact,
) -> EfcRows:
    s = m.spec
    nv = s.nv
    dtype = qpos.dtype

    J_rows, aref_rows, D_rows, R_rows, fl_rows, pos_rows = [], [], [], [], [], []

    # --- dof friction rows
    for dof in s.friction_dofs:
        J = jnp.zeros(nv, dtype).at[dof].set(1.0)
        imp = impedance(m.dof_solimp[dof], jnp.zeros((), dtype))
        _, b = kb(m.dof_solref[dof], m.dof_solimp[dof])
        aref = -b * qvel[dof]
        r = jnp.maximum((1 - imp) / imp * m.dof_invweight0[dof], _MINVAL)
        J_rows.append(J)
        aref_rows.append(aref)
        R_rows.append(r)
        D_rows.append(1.0 / r)
        fl_rows.append(m.dof_frictionloss[dof])
        pos_rows.append(jnp.zeros((), dtype))

    # --- joint limit rows (hinges; one row per limited joint)
    for j in range(s.njnt):
        if not s.jnt_limited[j] or s.jnt_type[j] != 3:
            continue
        qadr, dof = s.jnt_qposadr[j], s.jnt_dofadr[j]
        q = qpos[qadr]
        lo, hi = m.jnt_range[j, 0], m.jnt_range[j, 1]
        dist_lo = q - lo
        dist_hi = hi - q
        lower_closer = dist_lo < dist_hi
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(lower_closer, 1.0, -1.0).astype(dtype)
        active = dist < m.jnt_margin[j]
        J = jnp.zeros(nv, dtype).at[dof].set(sign)
        pos = dist - m.jnt_margin[j]
        imp = impedance(m.jnt_solimp[j], pos)
        k, b = kb(m.jnt_solref[j], m.jnt_solimp[j])
        aref = -b * sign * qvel[dof] - k * imp * pos
        r = jnp.maximum((1 - imp) / imp * m.dof_invweight0[dof], _MINVAL)
        J_rows.append(jnp.where(active, J, 0.0))
        aref_rows.append(jnp.where(active, aref, 0.0))
        R_rows.append(r)
        D_rows.append(jnp.where(active, 1.0 / r, 0.0))
        fl_rows.append(jnp.zeros((), dtype))
        pos_rows.append(pos)

    # --- contact pyramid facets
    mask = m.ancestor_mask.astype(dtype)  # (nbody, nv)
    floor_b = s.geom_bodyid[s.floor_geom_id]
    inv_trn = m.body_invweight0[:, 0]
    for fi, gid in enumerate(s.collide_geom_ids):
        b_id = s.geom_bodyid[gid]
        invw = inv_trn[b_id] + inv_trn[floor_b]
        for slot in range(s.points_per_foot):
            c = fi * s.points_per_foot + slot
            p = contact.pos[c]
            dist = contact.dist[c]
            active = dist < 0.0
            # translational point jacobian of the foot body at p: (3, nv)
            jp = mask[b_id][None, :] * (
                cdof[:, 3:].T + jnp.cross(cdof[:, :3], p - com).T
            )
            n = contact.frame[c, 0]
            imp = impedance(contact.solimp[c], dist)
            k, b_ = kb(contact.solref[c], contact.solimp[c])
            for t_ix in (1, 2):
                mu = contact.friction[c, t_ix - 1]
                t = contact.frame[c, t_ix]
                diag = 2.0 * mu * mu * (1.0 + mu * mu) * invw
                r = jnp.maximum((1 - imp) / imp * diag, _MINVAL)
                for sgn in (1.0, -1.0):
                    J = (n + sgn * mu * t) @ jp
                    vel = J @ qvel
                    aref = -b_ * vel - k * imp * dist
                    J_rows.append(jnp.where(active, J, 0.0))
                    aref_rows.append(jnp.where(active, aref, 0.0))
                    R_rows.append(r)
                    D_rows.append(jnp.where(active, 1.0 / r, 0.0))
                    fl_rows.append(jnp.zeros((), dtype))
                    pos_rows.append(dist)

    return EfcRows(
        J=jnp.stack(J_rows),
        aref=jnp.stack(aref_rows),
        D=jnp.stack(D_rows),
        R=jnp.stack(R_rows),
        frictionloss=jnp.stack(fl_rows),
        pos=jnp.stack(pos_rows),
    )
