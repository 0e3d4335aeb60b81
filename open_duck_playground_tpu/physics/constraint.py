"""Constraint assembly: static-shape efc rows (dof friction, joint limits,
pyramidal contact facets), MuJoCo soft-constraint semantics, fully vectorized
over static index sets.

Row layout (static):
  [0, nfric)                      dof frictionloss rows (always active)
  [nfric, nfric+nlimit)           joint limit rows (active iff violation)
  [nfric+nlimit, nefc)            contact pyramid facets, 4 per contact slot
                                  (2*(condim-1), condim=3), active iff dist<0

Formulas validated against C-MuJoCo 3.10 efc_* arrays (tests/test_physics_oracle.py):
  impedance d(pos) from solimp spline; B = 2/(dmax*tc); K = 1/(dmax^2 tc^2 zeta^2)
  aref = -B*vel - K*d*pos;  R = max((1-d)/d * diagApprox, MINVAL);  D = 1/R
  diagApprox: dof_invweight0 for friction/limits;
              2*mu^2*(1+mu^2)*(sum of body_invweight0_trn) for pyramid facets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST

from open_duck_playground_tpu.physics import structure
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
    y = jnp.where(x < mid, a * jnp.power(x, power), 1 - b * jnp.power(1 - x, power))
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


def nefc(m: Model) -> int:
    s = m.spec
    return (
        len(s.friction_dofs)
        + len(structure.limited_hinges(s))
        + s.ncon_max * 4
    )


def make_constraints(
    m: Model,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    cdof: jnp.ndarray,
    com: jnp.ndarray,
    contact: Contact,
) -> EfcRows:
    s = m.spec
    dtype = qpos.dtype

    # --- dof friction rows (always active)
    fd = np.asarray(s.friction_dofs, dtype=np.int32)
    e_fric = jnp.asarray(structure.one_hot_dofs(s, s.friction_dofs), dtype)
    imp_f = impedance(m.dof_solimp[fd], jnp.zeros(len(fd), dtype))
    _, b_f = kb(m.dof_solref[fd], m.dof_solimp[fd])
    aref_f = -b_f * qvel[fd]
    r_f = jnp.maximum((1 - imp_f) / imp_f * m.dof_invweight0[fd], _MINVAL)
    J_f, D_f = e_fric, 1.0 / r_f
    fl_f = m.dof_frictionloss[fd]
    pos_f = jnp.zeros(len(fd), dtype)

    # --- joint limit rows (one per limited hinge, active iff dist < margin)
    lj = structure.limited_hinges(s)
    lq = np.asarray([s.jnt_qposadr[j] for j in lj])
    ld = np.asarray([s.jnt_dofadr[j] for j in lj])
    e_lim = jnp.asarray(structure.one_hot_dofs(s, tuple(int(d) for d in ld)), dtype)
    q = qpos[lq]
    lo, hi = m.jnt_range[lj, 0], m.jnt_range[lj, 1]
    dist_lo, dist_hi = q - lo, hi - q
    sign = jnp.where(dist_lo < dist_hi, 1.0, -1.0).astype(dtype)
    dist = jnp.minimum(dist_lo, dist_hi)
    margin = m.jnt_margin[lj]
    active_l = dist < margin
    pos_l = dist - margin
    imp_l = impedance(m.jnt_solimp[lj], pos_l)
    k_l, b_l = kb(m.jnt_solref[lj], m.jnt_solimp[lj])
    aref_l = -b_l * sign * qvel[ld] - k_l * imp_l * pos_l
    r_l = jnp.maximum((1 - imp_l) / imp_l * m.dof_invweight0[ld], _MINVAL)
    J_l = jnp.where(active_l[:, None], sign[:, None] * e_lim, 0.0)
    aref_l = jnp.where(active_l, aref_l, 0.0)
    D_l = jnp.where(active_l, 1.0 / r_l, 0.0)
    fl_l = jnp.zeros(len(lj), dtype)

    # --- contact pyramid facets (4 per slot), vectorized over slots
    ncon = s.ncon_max
    foot_bodies = tuple(s.geom_bodyid[g] for g in s.collide_geom_ids)
    slot_body = np.repeat(
        np.asarray(foot_bodies, dtype=np.int32), s.points_per_foot
    )  # (ncon,)
    floor_b = s.geom_bodyid[s.floor_geom_id]
    mask = m.ancestor_mask.astype(dtype)[slot_body]  # (ncon, nv)
    # translational point jacobian per slot: (ncon, 3, nv)
    jp = mask[:, None, :] * (
        cdof[None, :, 3:] + jnp.cross(cdof[None, :, :3], (contact.pos - com)[:, None, :])
    ).transpose(0, 2, 1)
    n = contact.frame[:, 0]  # (ncon, 3)
    t = contact.frame[:, 1:]  # (ncon, 2, 3)
    mu = contact.friction[:, :2]  # (ncon, 2)
    # facet directions: order (+t1, -t1, +t2, -t2) to match MuJoCo
    sgn = jnp.asarray([1.0, -1.0], dtype)
    dirs = (
        n[:, None, None, :] + sgn[None, None, :, None] * mu[:, :, None, None] * t[:, :, None, :]
    ).reshape(ncon, 4, 3)
    J_c = jnp.einsum("cfk,ckv->cfv", dirs, jp, precision=_HI)  # (ncon, 4, nv)
    dist_c = contact.dist
    active_c = dist_c < 0.0
    imp_c = impedance(contact.solimp, dist_c)
    k_c, b_c = kb(contact.solref, contact.solimp)
    vel_c = jnp.matmul(J_c, qvel, precision=_HI)  # (ncon, 4)
    aref_c = -b_c[:, None] * vel_c - (k_c * imp_c * dist_c)[:, None]
    invw = m.body_invweight0[slot_body, 0] + m.body_invweight0[floor_b, 0]
    mu2 = mu**2  # (ncon, 2)
    diag = (2.0 * mu2 * (1.0 + mu2) * invw[:, None])[:, :, None]  # (ncon,2,1)
    diag = jnp.broadcast_to(diag, (ncon, 2, 2)).reshape(ncon, 4)
    r_c = jnp.maximum((1 - imp_c[:, None]) / imp_c[:, None] * diag, _MINVAL)
    J_c = jnp.where(active_c[:, None, None], J_c, 0.0).reshape(ncon * 4, -1)
    aref_c = jnp.where(active_c[:, None], aref_c, 0.0).reshape(-1)
    D_c = jnp.where(active_c[:, None], 1.0 / r_c, 0.0).reshape(-1)
    r_c = r_c.reshape(-1)
    fl_c = jnp.zeros(ncon * 4, dtype)
    pos_c = jnp.repeat(dist_c, 4)

    return EfcRows(
        J=jnp.concatenate([J_f, J_l, J_c]),
        aref=jnp.concatenate([aref_f, aref_l, aref_c]),
        D=jnp.concatenate([D_f, D_l, D_c]),
        R=jnp.concatenate([r_f, r_l, r_c]),
        frictionloss=jnp.concatenate([fl_f, fl_l, fl_c]),
        pos=jnp.concatenate([pos_f, pos_l, pos_c]),
    )
