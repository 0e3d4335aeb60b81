"""Pallas TPU mega-kernel: the full physics step (all n_substeps) in VMEM.

Layout: envs live on the lane axis — every per-env quantity is shaped
(dims..., T) with T envs per grid program. The whole pipeline (FK, CoM
spatial algebra, mass matrix, RNE bias, servo actuation, hull-plane
collision, constraint assembly, Newton solve with unrolled in-VMEM Cholesky,
analytic linesearch, semi-implicit Euler, sensors) runs inside one kernel;
qpos/qvel never leave VMEM between substeps, so HBM traffic per control step
is one read of the state + randomized model fields and one write of the
outputs — instead of materializing every intermediate at HBM like the
XLA-fused path.

Model data enters two ways: the 8 domain-randomized fields (reference
randomize.py:119-131) are per-env lane tensors; immutable structural arrays
(frames, limits, masks, hull vertices, ...) are broadcast kernel inputs
(Pallas forbids captured array constants). Scalars (solref-derived gains,
timestep) are baked as python floats. Heightfield floors are supported via
per-foot local height patches sliced host-side around each foot's
previous-step site position and interpolated in-kernel with one-hot
contractions (the VPU has no per-lane gather). Math is identical to the
oracle-validated jnp engine (physics/forward.py et al.), which remains the
reference implementation and the CPU/odd-batch fallback.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open_duck_playground_tpu.physics import structure
from open_duck_playground_tpu.physics.types import FREE, HINGE, Data, Model

_MINVAL = 1e-15
_MINIMP, _MAXIMP = 0.0001, 0.9999
LANE_TILE = 128
# Heightfield support: the kernel reads per-foot PxP local height patches
# (world-frame z) extracted around each foot's previous-step site position by
# the host wrapper — a full 256x256 hfield would need per-lane gathers the
# VPU doesn't have, but a PxP patch lookup is two cheap one-hot contractions
# whose cost scales with P^2. The patch only has to cover the foot's reach
# from its previous-step site: max |hull vert - site| is 6.8 cm on the duck
# (+<~3 cm drift/push per control step) vs a 7.8 cm hfield cell, so with the
# margins below (>=2 cells each side) P=8 is sufficient — and 4x cheaper in
# the kernel than the earlier 16x16 scheme.
HFIELD_P = 8  # kernel-visible patch size (cells per side)
HFIELD_WIN = 2  # tile-table alignment window (cells); decoupled from P
HFIELD_KOFF = 2  # patch-center left offset (cells): min left margin
# Margins with (P, WIN, KOFF) = (8, 2, 2): the foot-center column lands
# KOFF..KOFF+WIN-1 = 2..3 cells into the patch, so the guaranteed margin is
# >=2 cells (15.7 cm) on the left and >=P-2-(KOFF+WIN-1) = 3 cells (23.5 cm)
# on the right (bilinear reads cell i+1, hence the extra -1).
INTERPRET = False  # set True to run the kernel in interpreter mode (CPU tests)
DEBUG = False  # adds solver-internal debug outputs (validation only)
# NOTE on issue-slot batching (removed): an experiment batched the per-body
# FK walk / Newton J apply / sensor site poses into grouped (nb,·,T) stacks
# to cut VPU issue slots (the jaxpr op census showed -25% eqns). Measured on
# a real v5e @4096 envs it was strictly slower — all-off 943k env steps/s/chip
# vs all-on 854k (FK-only 917k, Newton-only 883k, Sensors-only 925k): the
# gathered stacks' extra VMEM traffic outweighed the saved slots at this
# model size. The losing paths were deleted (round 3); the per-body walk with
# trace-time constant folding below IS the fast path. The op census lives on
# in tools/count_kernel_ops.py.


def _vmem_limit_bytes() -> int:
    """Per-core VMEM budget for the megakernel's compiler hint.

    110 MiB is the validated setting for the 128 MiB-VMEM chips this has run
    on (v5e; v4/v5p/v6e share the size). Unknown / older kinds fall back to a
    conservative 64 MiB; ODPT_VMEM_LIMIT_MB overrides both.
    """
    ov = os.environ.get("ODPT_VMEM_LIMIT_MB")
    if ov:
        return int(ov) * 1024 * 1024
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    if any(g in kind for g in ("v4", "v5", "v6", "trillium")):
        return 110 * 1024 * 1024
    return 64 * 1024 * 1024


# ---------------------------------------------------------------- lane math
# The env tail of every per-env array is either (T,) (lane tile, classic) or
# (S, L) (sublane x lane tile — 8x denser VPU datapath use). `_TAILND` is the
# tail's ndim; the kernel closure sets it at trace time (builds never
# interleave). Component axes of quaternions/vectors sit just ahead of the
# tail, at axis -(1 + _TAILND).
_TAILND = 1


def _cax() -> int:
    return -1 - _TAILND


def comp(x, k: int):
    """Component k along the axis just ahead of the env tail."""
    return jax.lax.index_in_dim(x, k, axis=x.ndim + _cax(), keepdims=False)


def comps(x, lo: int, hi: int):
    """Slice [lo:hi] along the component axis (keeps the axis)."""
    return jax.lax.slice_in_dim(x, lo, hi, axis=x.ndim + _cax())


def lquat_mul(a, b):
    """(…,4,tail) x (…,4,tail) -> (…,4,tail)."""
    aw, ax, ay, az = (comp(a, k) for k in range(4))
    bw, bx, by, bz = (comp(b, k) for k in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=_cax(),
    )


def lcross(a, b):
    """(…,3,tail) x (…,3,tail) -> (…,3,tail)."""
    a0, a1, a2 = (comp(a, k) for k in range(3))
    b0, b1, b2 = (comp(b, k) for k in range(3))
    return jnp.stack(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0],
        axis=_cax(),
    )


def lquat_rotate(q, v):
    """Rotate (…,3,tail) by quaternion (…,4,tail)."""
    w = comps(q, 0, 1)
    u = comps(q, 1, 4)
    uv = lcross(u, v)
    return v + 2.0 * (w * uv + lcross(u, uv))


def lquat_normalize(q):
    return q * jax.lax.rsqrt(jnp.sum(q * q, axis=_cax(), keepdims=True))


def lquat_mul_constq(a, bq):
    """a (4,T) quaternion-multiplied by a CONSTANT quaternion (4 floats).

    Frame constants (body_quat, site_quat, geom_quat, body_iquat) are
    structural: expanding them as python floats lets identity quats vanish
    and zero components emit no ops at all."""
    bw, bx, by, bz = (float(v) for v in bq)
    if abs(bw - 1) < 1e-12 and abs(bx) < 1e-12 and abs(by) < 1e-12 and abs(bz) < 1e-12:
        return a
    aw, ax, ay, az = a[0], a[1], a[2], a[3]

    def lin(*terms):
        out = None
        for c, v in terms:
            if abs(c) < 1e-12:
                continue
            t = v if c == 1.0 else c * v
            out = t if out is None else out + t
        return out if out is not None else 0.0 * aw

    return jnp.stack(
        [
            lin((bw, aw), (-bx, ax), (-by, ay), (-bz, az)),
            lin((bx, aw), (bw, ax), (bz, ay), (-by, az)),
            lin((by, aw), (-bz, ax), (bw, ay), (bx, az)),
            lin((bz, aw), (by, ax), (-bx, ay), (bw, az)),
        ]
    )


def lquat_rotate_constv(q, v):
    """Rotate a CONSTANT 3-vector (floats) by quaternion q (4,T).

    Returns None when v == 0 (callers skip the add entirely — true for
    every jnt_pos on the duck)."""
    v0, v1, v2 = (float(x) for x in v)
    if abs(v0) < 1e-12 and abs(v1) < 1e-12 and abs(v2) < 1e-12:
        return None
    u0, u1, u2 = q[1], q[2], q[3]

    def lin(ca, a_, cb, b_):
        if abs(ca) < 1e-12 and abs(cb) < 1e-12:
            return 0.0 * u0
        if abs(ca) < 1e-12:
            return b_ if cb == 1.0 else cb * b_
        if abs(cb) < 1e-12:
            return a_ if ca == 1.0 else ca * a_
        return ca * a_ + cb * b_

    uv = jnp.stack(
        [lin(v2, u1, -v1, u2), lin(v0, u2, -v2, u0), lin(v1, u0, -v0, u1)]
    )
    uuv = lcross(q[1:], uv)
    base = jnp.stack([v0 + 0.0 * u0, v1 + 0.0 * u0, v2 + 0.0 * u0])
    return base + 2.0 * (q[:1] * uv + uuv)


def lquat_to_mat(q):
    """(4,T) -> (3,3,T)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], 0),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], 0),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], 0),
        ],
        axis=0,
    )


def _impedance(solimp, pos):
    """solimp: tuple of 5 python floats; pos: (…,T)."""
    dmin, dmax, width, mid, power = solimp
    x = jnp.clip(jnp.abs(pos) * (1.0 / max(width, _MINVAL)), 0.0, 1.0)
    a = 1.0 / mid ** (power - 1)
    b = 1.0 / (1 - mid) ** (power - 1)
    y = jnp.where(x < mid, a * x**power, 1 - b * (1 - x) ** power)
    return jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)


def _kb(solref, solimp):
    tc, zeta = solref
    dmax = solimp[1]
    if tc <= 0 or zeta <= 0:
        return -tc, -zeta
    return (
        1.0 / max(dmax * dmax * tc * tc * zeta * zeta, _MINVAL),
        2.0 / max(dmax * tc, _MINVAL),
    )


# ------------------------------------------------------------ kernel builder
def _build_kernel(m: Model, n_substeps: int, tile: int = LANE_TILE):
    s = m.spec
    # Env-tail geometry: tile envs per grid program, laid out as SUB sublane
    # rows x 128 lanes when tile > 128 (f32's native (8,128) vreg tile; a
    # 1-sublane op wastes 7/8 of the VPU datapath) or as a classic 1-D lane
    # tile when tile == 128. E1 broadcasts a tail-less constant over the tail.
    assert tile >= 128 and tile % 128 == 0, tile
    assert tile // 128 <= 8 or (tile // 128) % 8 == 0, tile
    SUB = tile // 128
    E1 = (1,) if SUB == 1 else (1, 1)
    nq, nv, nu, nbody, njnt = s.nq, s.nv, s.nu, s.nbody, s.njnt
    IS_HFIELD = s.floor_is_hfield

    g = lambda x: np.asarray(x, np.float32)
    jnt_range = g(m.jnt_range)
    jnt_margin = g(m.jnt_margin)
    jnt_solref = np.asarray(m.jnt_solref)
    jnt_solimp = np.asarray(m.jnt_solimp)
    dof_solref = np.asarray(m.dof_solref)
    dof_solimp = np.asarray(m.dof_solimp)
    dof_invweight0 = g(m.dof_invweight0)
    body_invweight0 = g(m.body_invweight0)
    body_inertia = g(m.body_inertia)
    ctrlrange = g(m.actuator_ctrlrange)
    forcerange = g(m.actuator_forcerange)
    dof_damping = g(m.dof_damping)
    body_pos_np = g(m.body_pos)
    body_quat_np = g(m.body_quat)
    body_iquat_np = g(m.body_iquat)
    jnt_pos_np = g(m.jnt_pos)
    jnt_axis_np = g(m.jnt_axis)
    site_pos_np = g(m.site_pos)
    site_quat_np = g(m.site_quat)
    geom_pos_np = g(m.geom_pos)
    geom_quat_np = g(m.geom_quat)
    gravity = [float(v) for v in np.asarray(m.gravity)]
    dt = float(s.timestep)

    floor_gid = s.floor_geom_id
    floor_body = s.geom_bodyid[floor_gid]
    con_solref = tuple(float(v) for v in np.asarray(m.geom_solref[floor_gid]))
    con_solimp = tuple(float(v) for v in np.asarray(m.geom_solimp[floor_gid]))
    k_con, b_con = _kb(con_solref, con_solimp)

    hf = None
    if IS_HFIELD:
        # hfield must be world-axis-aligned at the world origin (true of the
        # duck's rough scenes; same assumption as the jnp fallback,
        # collision.py:102): a static jointless body chain, identity poses
        b_walk = floor_body
        while b_walk != 0:
            assert s.body_jntnum[b_walk] == 0, "hfield body must be static"
            assert np.allclose(np.asarray(m.body_pos[b_walk]), 0.0), (
                "offset hfield body unsupported")
            assert np.allclose(
                np.asarray(m.body_quat[b_walk]), [1.0, 0, 0, 0]
            ), "rotated hfield body unsupported"
            b_walk = s.body_parentid[b_walk]
        fq = np.asarray(m.geom_quat[floor_gid])
        assert abs(float(fq[0]) - 1.0) < 1e-6, "rotated hfield unsupported"
        hsz = np.asarray(m.hfield_size, np.float64)
        fp = np.asarray(m.geom_pos[floor_gid], np.float64)
        ncol_h, nrow_h = s.hfield_ncol, s.hfield_nrow
        dxh = 2.0 * float(hsz[0]) / (ncol_h - 1)
        dyh = 2.0 * float(hsz[1]) / (nrow_h - 1)
        # one site per foot body gives the patch center (previous-step pose)
        foot_site = []
        reach = 0.0  # max |hull vert - site| (orientation-free 3D bound)
        for fi2, gid in enumerate(s.collide_geom_ids):
            b = s.geom_bodyid[gid]
            sites = [i for i, sb in enumerate(s.site_bodyid) if sb == b]
            assert sites, f"foot body {b} needs a site for hfield patches"
            foot_site.append(sites[0])
            hull_b = np.asarray(m.foot_hull)[fi2]  # (hull_nvert, 3)
            gq = np.asarray(m.geom_quat[gid], np.float64)
            w_, x_, y_, z_ = gq
            Rg = np.array(
                [
                    [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_),
                     2 * (x_ * z_ + w_ * y_)],
                    [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_),
                     2 * (y_ * z_ - w_ * x_)],
                    [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_),
                     1 - 2 * (x_ * x_ + y_ * y_)],
                ]
            )
            vb = hull_b @ Rg.T + np.asarray(m.geom_pos[gid], np.float64)
            sp = np.asarray(m.site_pos[foot_site[-1]], np.float64)
            reach = max(reach, float(np.linalg.norm(vb - sp, axis=1).max()))
        # safety: the foot's full reach from its previous-step site (hull
        # radius + one control step of drift/push) must fit inside the
        # guaranteed patch margins, else vertex heights would silently clamp
        drift_allowance = 0.04  # m per control step (pushes kick <=1 m/s)
        min_margin_cells = min(
            HFIELD_KOFF,  # left/below
            HFIELD_P - 2 - (HFIELD_KOFF + HFIELD_WIN - 1),  # right/above
        )
        min_margin = min_margin_cells * min(dxh, dyh)
        assert reach + drift_allowance <= min_margin, (
            f"hfield patch margins too small: foot reach {reach:.3f}m "
            f"+ drift {drift_allowance}m > margin {min_margin:.3f}m — "
            f"raise HFIELD_P or HFIELD_KOFF"
        )
        # Patches are served from a precomputed table of WIN-aligned PxP
        # tiles via a row-gather (jnp.take of contiguous rows) — a vmapped
        # per-env dynamic_slice gather costs ~10 ms/step on TPU
        # (element-wise scalar-core gather), the tile row-gather ~0.2 ms.
        tiled = nrow_h >= HFIELD_P and ncol_h >= HFIELD_P
        hf = dict(
            x0w=float(fp[0] - hsz[0]),  # world x of grid column 0
            y0w=float(fp[1] - hsz[1]),
            zw=float(fp[2]),
            zscale=float(hsz[2]),
            dxh=dxh,
            dyh=dyh,
            ncol=ncol_h,
            nrow=nrow_h,
            P=HFIELD_P,
            win=HFIELD_WIN,
            koff=HFIELD_KOFF,
            tiled=tiled,
            foot_site=tuple(foot_site),
        )

    anc_np = np.asarray(m.ancestor_mask, np.float32)

    # CRBA structure: desc[b, d] = 1 iff body b is an ancestor-or-self of
    # body d (so IC[b] = sum of body spatial inertias over subtree(b)), and
    # dofpair[i, j] = 1 iff dof j supports M's row i strictly at-or-below
    # the diagonal: j on a strict-ancestor body of dof i's body, or on the
    # same body with j <= i (same-body pairs must appear in ONE triangle
    # only — Mlow + Mlow^T would double-count them otherwise).
    dofbody = [int(b) for b in s.dof_bodyid]
    desc_np = np.zeros((nbody, nbody), np.float32)
    for d_ in range(nbody):
        b_walk = d_
        while True:
            desc_np[b_walk, d_] = 1.0
            if b_walk == 0:
                break
            b_walk = int(s.body_parentid[b_walk])
    dofpair_np = np.zeros((nv, nv), np.float32)
    for i_ in range(nv):
        for j_ in range(nv):
            if dofbody[j_] == dofbody[i_]:
                dofpair_np[i_, j_] = 1.0 if j_ <= i_ else 0.0
            else:
                dofpair_np[i_, j_] = anc_np[dofbody[i_], j_]

    fd = [int(i) for i in s.friction_dofs]
    lim_j = [int(j) for j in structure.limited_hinges(s)]
    lim_q = [s.jnt_qposadr[j] for j in lim_j]
    lim_d = [s.jnt_dofadr[j] for j in lim_j]
    nfric, nlim = len(fd), len(lim_j)
    nfoot = len(s.collide_geom_ids)
    k_pts = s.points_per_foot
    ncon = nfoot * k_pts
    nefc = nfric + nlim + ncon * 4
    nvert = s.hull_nvert

    trn_q = [s.jnt_qposadr[j] for j in s.actuator_trnid]
    trn_d = [s.jnt_dofadr[j] for j in s.actuator_trnid]

    fric_R, fric_B = [], []
    for dof in fd:
        imp0 = float(np.clip(dof_solimp[dof][0], _MINIMP, _MAXIMP))
        fric_R.append(max((1 - imp0) / imp0 * float(dof_invweight0[dof]), _MINVAL))
        fric_B.append(_kb(tuple(dof_solref[dof]), tuple(dof_solimp[dof]))[1])
    fric_D = [1.0 / r for r in fric_R]

    lim_kb = [_kb(tuple(jnt_solref[j]), tuple(jnt_solimp[j])) for j in lim_j]
    lim_solimp = [tuple(float(v) for v in jnt_solimp[j]) for j in lim_j]
    lim_invw = [float(dof_invweight0[d]) for d in lim_d]

    levels = structure.tree_levels(s)
    iterations, ls_iterations = s.iterations, s.ls_iterations

    # Block-arrow partition of the dof space (root free joint + decoupled
    # serial chains): lets the two in-kernel factorizations run per-block
    # (zero fill-in — chains only couple through the root block) and the
    # constraint-Hessian contact updates touch only each foot's own chain
    # block instead of dense (nv,nv) outer products.
    _blocks = structure.dof_chain_blocks(s)
    USE_BLOCK = _blocks is not None
    foot_chain: List[int] = []
    if USE_BLOCK:
        FB, CHAINS = _blocks
        for gid in s.collide_geom_ids:
            b = s.geom_bodyid[gid]
            anc_dofs = [d2 for d2 in range(FB[1], nv) if anc_np[b, d2] > 0]
            owners = {
                ci
                for d2 in anc_dofs
                for ci, (a2, e2) in enumerate(CHAINS)
                if a2 <= d2 < e2
            }
            if len(owners) != 1:
                USE_BLOCK = False
                break
            foot_chain.append(owners.pop())
    free_j = structure.free_joint(s)
    hinge_j = [int(j) for j in structure.hinge_joints(s)]
    seg_order = sorted(range(njnt), key=lambda j: s.jnt_qposadr[j])
    # one fused slice update for the hinge part of the integrator when all
    # non-free joints are hinges laid out contiguously in qpos/dof space
    _hj = [j for j in seg_order if s.jnt_type[j] != FREE]
    HINGE_CONTIG = (
        bool(_hj)
        and all(s.jnt_type[j] == HINGE for j in _hj)
        and all(
            s.jnt_qposadr[j2] == s.jnt_qposadr[_hj[0]] + k
            and s.jnt_dofadr[j2] == s.jnt_dofadr[_hj[0]] + k
            for k, j2 in enumerate(_hj)
        )
        and all(
            s.jnt_qposadr[j2] < s.jnt_qposadr[_hj[0]]
            for j2 in seg_order
            if s.jnt_type[j2] == FREE
        )
    )
    if HINGE_CONTIG:
        H_Q0, H_D0, H_N = s.jnt_qposadr[_hj[0]], s.jnt_dofadr[_hj[0]], len(_hj)

    adr = 0
    for kind, objid, a, dim in s.sensors:
        assert a == adr, "sensors must be contiguous"
        adr += dim

    CONSTS = dict(
        # E1 dims applied in numpy: a trace-level reshape of a loaded ref
        # (vector<nvert x 3> -> <nvert x 3 x 1 x 1>) is an unsupported
        # Mosaic shape cast when the env tail is 2-D (sublane x lane)
        foot_hull=g(m.foot_hull).reshape(nfoot * nvert, 3, *E1),
        anc_mask=anc_np,
        pred_mask=structure.dof_pred_mask(s).astype(np.float32),
        ftm=structure.free_trans_mask(s).astype(np.float32).reshape(nv, 1, *E1),
        eye_nv1=np.eye(nv, dtype=np.float32).reshape(nv, nv, *E1),
        desc_mask=desc_np,
        dofpair1=dofpair_np.reshape(nv, nv, *E1),
        body_inertia3=body_inertia.reshape(nbody, 1, 3, *E1),
        # desc_mask rows re-indexed per dof: (sel @ desc) folds the
        # subtree-sum matmul and the dof->body gather-stack into ONE
        # (nv,nbody) mask_dot (the per-body subtree intermediates were
        # consumed only by that gather)
        dofsub_mask=desc_np[dofbody, :],
        # friction-row D and 0.5*R: structural solref/solimp constants,
        # stacked once so the solver's friction class needs no per-row muls
        fricD=np.asarray(fric_D, np.float32).reshape((nfric,) + E1),
        fricRh=0.5 * np.asarray(fric_R, np.float32).reshape((nfric,) + E1),
    )

    in_tree = anc_np.any(axis=1).astype(np.float32)
    const_names = list(CONSTS.keys())
    const_values = [CONSTS[k] for k in const_names]

    def kernel(*refs):
        (qpos_ref, qvel_ref, ctrl_ref, warm_ref, qpos0_ref, gain0_ref,
         bias0_ref, bias1_ref, bias2_ref, fl_ref, arma_ref, mass_ref,
         ipos_ref, mu_ref) = refs[:14]
        base = 14
        if IS_HFIELD:
            patch_ref, porig_ref = refs[14:16]
            base = 16
        cdict = dict(zip(const_names, refs[base : base + len(const_names)]))
        out_refs = refs[base + len(const_names):]

        C = {k: v[:] for k, v in cdict.items()}
        if IS_HFIELD:
            patch_all = patch_ref[:]  # (nfoot*P, P, T) world-frame heights
            porig = porig_ref[:]  # (2*nfoot, T): ox_f0, oy_f0, ox_f1, oy_f1
        ctrl = ctrl_ref[:]
        qpos0 = qpos0_ref[:]
        gain0, bias0, bias1, bias2 = (
            gain0_ref[:], bias0_ref[:], bias1_ref[:], bias2_ref[:],
        )
        frictionloss = fl_ref[:]
        armature = arma_ref[:]
        body_mass = mass_ref[:]
        body_ipos = ipos_ref[:]
        floor_mu = mu_ref[0]

        global _TAILND
        tail = tuple(qpos_ref.shape[1:])
        _TAILND = len(tail)
        f32 = jnp.float32
        anc = C["anc_mask"]

        def forward_lane(qpos, qvel, warm, with_sensors=True):
            zeroT = qpos[0] * 0.0
            oneT = zeroT + 1.0
            zero3 = jnp.stack([zeroT, zeroT, zeroT])

            # ----- FK
            xpos: List = [None] * nbody
            xquat: List = [None] * nbody
            xpos[0] = zero3
            xquat[0] = jnp.stack([oneT, zeroT, zeroT, zeroT])
            xanchor: List = [None] * njnt
            xaxis: List = [None] * njnt
            # all hinge sin/cos in one packed pair of transcendentals
            # instead of a 1-sublane pair per joint inside the level walk
            hrow = {j: i for i, j in enumerate(hinge_j)}
            if hinge_j:
                half_all = 0.5 * (
                    jnp.stack([qpos[s.jnt_qposadr[j]] for j in hinge_j], axis=0)
                    - jnp.stack([qpos0[s.jnt_qposadr[j]] for j in hinge_j], axis=0)
                )
                sh_all = jnp.sin(half_all)
                ch_all = jnp.cos(half_all)
            for level in levels:
                for b in level:
                    p = s.body_parentid[b]
                    rr = lquat_rotate_constv(xquat[p], body_pos_np[b])
                    pos = xpos[p] if rr is None else xpos[p] + rr
                    quat = lquat_mul_constq(xquat[p], body_quat_np[b])
                    for j in range(
                        s.body_jntadr[b], s.body_jntadr[b] + s.body_jntnum[b]
                    ):
                        qadr = s.jnt_qposadr[j]
                        if s.jnt_type[j] == FREE:
                            pos = qpos[qadr : qadr + 3]
                            quat = lquat_normalize(
                                jnp.stack([qpos[qadr + 3 + i] for i in range(4)])
                            )
                            xanchor[j] = pos
                            xaxis[j] = jnp.stack([zeroT, zeroT, oneT])
                        else:
                            jpv = jnt_pos_np[j]
                            jav = jnt_axis_np[j]
                            ra = lquat_rotate_constv(quat, jpv)
                            anchor = pos if ra is None else pos + ra
                            ax_w = lquat_rotate_constv(quat, jav)
                            sh = sh_all[hrow[j]]
                            jq = jnp.stack(
                                [
                                    ch_all[hrow[j]],
                                    float(jav[0]) * sh if abs(jav[0]) > 1e-12 else zeroT,
                                    float(jav[1]) * sh if abs(jav[1]) > 1e-12 else zeroT,
                                    float(jav[2]) * sh if abs(jav[2]) > 1e-12 else zeroT,
                                ]
                            )
                            quat = lquat_mul(quat, jq)
                            if ra is not None:
                                pos = anchor - lquat_rotate_constv(quat, jpv)
                            xanchor[j] = anchor
                            xaxis[j] = ax_w
                    xpos[b] = pos
                    xquat[b] = quat

            xipos = [
                xpos[b] + lquat_rotate(xquat[b], body_ipos[b])
                for b in range(nbody)
            ]
            ximat = [
                lquat_to_mat(lquat_mul_constq(xquat[b], body_iquat_np[b]))
                for b in range(nbody)
            ]

            # ----- CoM + cdof
            total_mass = sum(
                body_mass[b] * float(in_tree[b]) for b in range(nbody)
            )
            com = (
                sum(
                    body_mass[b][None] * float(in_tree[b]) * xipos[b]
                    for b in range(nbody)
                )
                * (1.0 / total_mass)[None]
            )

            cdof_list: List = [None] * nv
            for j in hinge_j:
                d_ = s.jnt_dofadr[j]
                lin = lcross(xaxis[j], com - xanchor[j])
                cdof_list[d_] = jnp.concatenate([xaxis[j], lin], axis=0)
            if free_j >= 0:
                d_ = s.jnt_dofadr[free_j]
                b = s.jnt_bodyid[free_j]
                basis = [
                    jnp.stack([oneT, zeroT, zeroT]),
                    jnp.stack([zeroT, oneT, zeroT]),
                    jnp.stack([zeroT, zeroT, oneT]),
                ]
                for i in range(3):
                    cdof_list[d_ + i] = jnp.concatenate(
                        [zero3, basis[i]], axis=0
                    )
                rb = lquat_to_mat(xquat[b])
                for i in range(3):
                    axis = rb[:, i]
                    lin = lcross(axis, com - xanchor[free_j])
                    cdof_list[d_ + 3 + i] = jnp.concatenate(
                        [axis, lin], axis=0
                    )
            cdof = jnp.stack(cdof_list, axis=0)  # (nv,6,T)

            # ----- velocities
            vdof = cdof * qvel[:, None]

            def mask_dot(mask, x):
                c_, rest = x.shape[0], x.shape[1:]
                flat = 1
                for r_ in rest:
                    flat *= r_
                y = jnp.dot(mask, x.reshape(c_, flat), preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
                return y.reshape((mask.shape[0],) + rest)

            cvel = mask_dot(anc, vdof)
            carrier = mask_dot(C["pred_mask"], vdof)
            cw, cv = carrier[:, :3], carrier[:, 3:]
            dw, dv = cdof[:, :3], cdof[:, 3:]
            cdof_dot = (
                jnp.concatenate(
                    [lcross(cw, dw), lcross(cw, dv) + lcross(cv, dw)], axis=1
                )
                * C["ftm"]
            )

            # ----- inertias: mass matrix + rne accumulations
            if not USE_BLOCK:
                # dense (nv,nv,T) armature diagonal — only the fallback
                # consumes M; under USE_BLOCK armature enters per block
                M = C["eye_nv1"] * armature[:, None]
            vdofdot = cdof_dot * qvel[:, None]
            gx, gy, gz = gravity
            grav = jnp.stack(
                [zeroT, zeroT, zeroT, -gx * oneT, -gy * oneT, -gz * oneT], axis=0
            )
            cacc_dofsum = mask_dot(anc, vdofdot)

            # spatial body inertias, batched over all bodies at once (the
            # world body's zero mass/inertia makes its row identically zero)
            xipos_st = jnp.stack(xipos, 0)  # (nbody,3,T)
            ximat_st = jnp.stack(ximat, 0)  # (nbody,3,3,T)
            RI = ximat_st * C["body_inertia3"]  # R[b,i,k] * I[b,k]
            ricr = sum(
                RI[:, :, k][:, :, None] * ximat_st[:, :, k][:, None]
                for k in range(3)
            )  # (nbody,3,3,T): R I R^T
            c = xipos_st - com[None]  # (nbody,3,T)
            c0, c1, c2 = c[:, 0], c[:, 1], c[:, 2]
            zb = 0.0 * c0
            cx = jnp.stack(
                [
                    jnp.stack([zb, -c2, c1], axis=1),
                    jnp.stack([c2, zb, -c0], axis=1),
                    jnp.stack([-c1, c0, zb], axis=1),
                ],
                axis=1,
            )  # (nbody,3,3,T)
            cxcxT = sum(
                cx[:, :, k][:, :, None] * cx[:, :, k][:, None]
                for k in range(3)
            )
            mN = body_mass[:, None, None]
            # spatial inertia in 3x3 blocks [[TL, TR], [TR^T, m·I]]: the
            # (nbody,6,6,T) stack is never concatenated — the lower-left
            # block is TR contracted along the other axis and the
            # lower-right is diagonal mass, so both cost nothing to store
            ib_tl = ricr + mN * cxcxT  # (nbody,3,3,T)
            ib_tr = mN * cx  # (nbody,3,3,T)

            def ib_apply(w3, v3):
                # [[TL,TR],[TR^T,m·I]] @ [w3; v3] without materializing 6x6
                top = jnp.sum(ib_tl * w3[:, None], axis=2) + jnp.sum(
                    ib_tr * v3[:, None], axis=2
                )
                bot = (
                    jnp.sum(ib_tr * w3[:, :, None], axis=1)
                    + body_mass[:, None] * v3
                )
                return top, bot

            # RNE bias forces, batched: per-body f = I*acc + v x* I*v, then
            # qfrc_bias_i = cdof_i . (subtree sum of f at body(i)) — the
            # subtree reduction is one descendant-mask MXU matmul.
            acc_all = grav[None] + cacc_dofsum  # (nbody,6,T)
            vang, vlin = cvel[:, :3], cvel[:, 3:]
            ia_top, ia_bot = ib_apply(acc_all[:, :3], acc_all[:, 3:])
            ftor, flin = ib_apply(vang, vlin)
            # torque/force halves kept separate end-to-end (two (nbody,3,T)
            # mask_dots instead of one (nbody,6,T)): same MXU FLOPs, no
            # 6-row concat copies through VMEM
            f_top = ia_top + lcross(vang, ftor) + lcross(vlin, flin)
            f_bot = ia_bot + lcross(vang, flin)
            # subtree sums land directly on dof rows: one (nv,nbody) mask
            # matmul instead of a (nbody,nbody) matmul + nv-row gather-stack
            fdof_top = mask_dot(C["dofsub_mask"], f_top)
            fdof_bot = mask_dot(C["dofsub_mask"], f_bot)
            qfrc_bias = jnp.sum(dw * fdof_top, axis=1) + jnp.sum(
                dv * fdof_bot, axis=1
            )

            # ----- mass matrix via CRBA: composite (subtree) inertias from a
            # descendant-mask reduction (one MXU matmul over bodies), then
            # M[i,j] = (IC[body(i)] @ cdof_i) . cdof_j on the ancestor-pair
            # support — O(nv^2*6) instead of the O(nbody*nv^2*6) per-body
            # J^T I J accumulation.
            # composite inertias per 3x3 block (lower-left = TR^T, lower-
            # right = subtree-mass diagonal — both free given TL/TR/msub)
            tl_dof = mask_dot(
                C["dofsub_mask"], ib_tl.reshape(nbody, 9, *tail)
            ).reshape(nv, 3, 3, *tail)
            tr_dof = mask_dot(
                C["dofsub_mask"], ib_tr.reshape(nbody, 9, *tail)
            ).reshape(nv, 3, 3, *tail)
            ms_dof = mask_dot(C["dofsub_mask"], body_mass[:, None])[:, 0]
            cdw = cdof[:, :3]
            cdv = cdof[:, 3:]
            fC_top = jnp.sum(tl_dof * cdw[:, None], axis=2) + jnp.sum(
                tr_dof * cdv[:, None], axis=2
            )
            fC_bot = (
                jnp.sum(tr_dof * cdw[:, :, None], axis=1)
                + ms_dof[:, None] * cdv
            )
            # fC stays in (torque, force) halves — the k-indexed accumulations
            # below address the halves directly, so the (nv,6,T) concat copy
            # never exists
            def fC_k(k):
                return fC_top[:, k] if k < 3 else fC_bot[:, k - 3]

            def cdof_k(k):
                return dw[:, k] if k < 3 else dv[:, k - 3]

            mdiag = sum(fC_k(k) * cdof_k(k) for k in range(6))  # (nv,T)
            if USE_BLOCK:
                # assemble M directly in block-arrow form: the only nonzero
                # blocks are the chain diagonal blocks, the chain-root
                # panels, and the root block — never materialize (nv,nv,T)
                eyeb = C["eye_nv1"]

                def crba_diag_block(a_, e_):
                    W = fC_k(0)[a_:e_][:, None] * cdof_k(0)[a_:e_][None]
                    for k in range(1, 6):
                        W = W + (
                            fC_k(k)[a_:e_][:, None]
                            * cdof_k(k)[a_:e_][None]
                        )
                    Wl = C["dofpair1"][a_:e_, a_:e_] * W
                    return (
                        eyeb[a_:e_, a_:e_] * armature[a_:e_][:, None]
                        + Wl
                        + jnp.swapaxes(Wl, 0, 1)
                        - eyeb[a_:e_, a_:e_] * mdiag[a_:e_][:, None]
                    )

                def crba_panel(a_, e_):
                    # chain dofs are strict descendants of every root dof:
                    # M[i, f] = (IC[body(i)] cdof_i) · cdof_f, full block
                    P = (
                        fC_k(0)[a_:e_][:, None]
                        * cdof_k(0)[FB[0] : FB[1]][None]
                    )
                    for k in range(1, 6):
                        P = P + (
                            fC_k(k)[a_:e_][:, None]
                            * cdof_k(k)[FB[0] : FB[1]][None]
                        )
                    return P

                Mb = (
                    [crba_diag_block(a_, e_) for a_, e_ in CHAINS],
                    [crba_panel(a_, e_) for a_, e_ in CHAINS],
                    crba_diag_block(FB[0], FB[1]),
                )
            else:
                Mlow = fC_k(0)[:, None] * cdof_k(0)[None]
                for k in range(1, 6):
                    Mlow = Mlow + fC_k(k)[:, None] * cdof_k(k)[None]
                Mlow = C["dofpair1"] * Mlow
                M = (
                    M
                    + Mlow
                    + jnp.swapaxes(Mlow, 0, 1)
                    - C["eye_nv1"] * mdiag[:, None]
                )

            # ----- passive + actuation
            qfrc_passive = jnp.stack(
                [-float(dof_damping[i]) * qvel[i] for i in range(nv)], 0
            )
            length = jnp.stack([qpos[i] for i in trn_q], axis=0)
            velocity = jnp.stack([qvel[i] for i in trn_d], axis=0)
            cl = jnp.stack(
                [
                    jnp.clip(
                        ctrl[i],
                        float(ctrlrange[i, 0]),
                        float(ctrlrange[i, 1]),
                    )
                    for i in range(nu)
                ],
                0,
            )
            force = gain0 * cl + bias0 + bias1 * length + bias2 * velocity
            force = jnp.stack(
                [
                    jnp.clip(
                        force[i],
                        float(forcerange[i, 0]),
                        float(forcerange[i, 1]),
                    )
                    for i in range(nu)
                ],
                0,
            )
            qfrc_act_rows: List = [None] * nv
            for i, dof in enumerate(trn_d):
                qfrc_act_rows[dof] = force[i]
            qfrc_actuator = jnp.stack(
                [r if r is not None else zeroT for r in qfrc_act_rows], 0
            )
            qfrc_smooth = qfrc_passive - qfrc_bias + qfrc_actuator

            # ----- in-VMEM cholesky (right-looking, trailing submatrix only:
            # the update at step k touches (nv-k)^2 entries, nv^3/3 total —
            # 3x less VPU work than updating the full matrix every step)
            def chol(Mm):
                # returns (L, rdiag): lower factor and per-column reciprocal
                # pivots — VPU division is many times a multiply, so every
                # column/solve divide below becomes a broadcast multiply
                n = Mm.shape[0]
                rem = Mm
                cols = []
                rdiag: List = []
                for kk in range(n):
                    rpiv = jax.lax.rsqrt(jnp.maximum(rem[0, 0], 1e-12))
                    rdiag.append(rpiv)
                    col_t = rem[:, 0] * rpiv[None]  # (n-kk, T)
                    if kk:
                        cols.append(
                            jnp.concatenate(
                                [jnp.zeros((kk,) + tail, f32), col_t], axis=0
                            )
                        )
                    else:
                        cols.append(col_t)
                    if kk < n - 1:
                        tcol = col_t[1:]
                        rem = (
                            rem[1:, 1:]
                            - tcol[:, None] * tcol[None]
                        )
                return jnp.stack(cols, axis=1), jnp.stack(rdiag, axis=0)

            def fwd_sub(fac, bb):
                # solve L u = bb with a running accumulator of finished
                # columns' contributions (no per-step masked writes)
                L, rd = fac
                n = L.shape[0]
                rows: List = []
                acc = 0.0 * bb
                for kk in range(n):
                    xk = (bb[kk] - acc[kk]) * rd[kk]
                    rows.append(xk)
                    acc = acc + L[:, kk] * xk[None]
                return jnp.stack(rows, axis=0)

            def bwd_sub(fac, bb):
                # solve L^T x = bb
                L, rd = fac
                n = L.shape[0]
                rows2: List = [None] * n
                acc2 = 0.0 * bb
                for kk in range(n - 1, -1, -1):
                    yk = (bb[kk] - acc2[kk]) * rd[kk]
                    rows2[kk] = yk
                    acc2 = acc2 + L[kk] * yk[None]
                return jnp.stack(rows2, axis=0)

            def chol_solve(fac, bb):
                return bwd_sub(fac, fwd_sub(fac, bb))

            # --- column-form factorization kit (USE_BLOCK path). Matrices
            # live as TRAILING-COLUMN lists: cols[j] = A[j:, j] — only the
            # lower triangle ever exists, so the symmetric rank-1 updates,
            # the right-looking cholesky update, and the forward-solve
            # accumulators all do half the VPU work of their square-matrix
            # equivalents (the dense fallback below keeps the square forms).
            def chol_c(cols):
                # cols -> (trailing L columns, reciprocal pivots)
                n = len(cols)
                colts: List = []
                rdiag: List = []
                rem = list(cols)
                for kk in range(n):
                    c0 = rem[0]
                    rpiv = jax.lax.rsqrt(jnp.maximum(c0[0], 1e-12))
                    colt = c0 * rpiv[None]  # (n-kk, T)
                    colts.append(colt)
                    rdiag.append(rpiv)
                    t = colt[1:]
                    rem = [
                        rem[j] - t[j - 1 :] * t[j - 1][None]
                        for j in range(1, n - kk)
                    ]
                return colts, rdiag

            def fsub_c(fac, bb):
                # solve L u = bb with a TRAILING accumulator (rows already
                # solved drop out of the update)
                colts, rd = fac
                n = len(colts)
                xs: List = []
                acc = bb
                for kk in range(n):
                    xk = acc[0] * rd[kk]
                    xs.append(xk)
                    if kk < n - 1:
                        acc = acc[1:] - colts[kk][1:] * xk[None]
                return jnp.stack(xs, axis=0)

            def bsub_c(fac, bb):
                # solve L^T x = bb: row kk's off-diagonal of L^T IS trailing
                # column kk of L — a shrinking per-row accumulation against
                # the solved tail (kept elementwise: Mosaic rejects
                # reductions whose operand carries a sublane offset, which
                # sliced trailing columns do at the 1-D lane tile)
                colts, rd = fac
                n = len(colts)
                xs: List = [None] * n
                for kk in range(n - 1, -1, -1):
                    v = bb[kk]
                    t = colts[kk]
                    for j in range(1, n - kk):
                        v = v - t[j] * xs[kk + j]
                    xs[kk] = v * rd[kk]
                return jnp.stack(xs, axis=0)

            def fpanel_c(fac, Bp):
                # solve L P = Bp for a panel Bp (n, kc, T), trailing acc
                colts, rd = fac
                n = len(colts)
                rows: List = []
                acc = Bp
                for kk in range(n):
                    xk = acc[0] * rd[kk][None]
                    rows.append(xk)
                    if kk < n - 1:
                        acc = acc[1:] - colts[kk][1:][:, None] * xk[None]
                return jnp.stack(rows, axis=0)

            def block_factor(AccC, Acf, AffC):
                """Block-arrow Cholesky: per-chain factors + root Schur.

                Eliminating chain blocks before the root block is fill-in
                free (chains are mutually decoupled), so the factorization
                is exact — same math as dense chol in a permuted dof order.
                AccC/AffC are trailing-column lists (lower triangle only).
                """
                Ls, Ps = [], []
                S = list(AffC)
                nSr = len(S)
                for ci in range(len(CHAINS)):
                    Lc = chol_c(AccC[ci])
                    Pc = fpanel_c(Lc, Acf[ci])  # (nc, nF, T)
                    for k in range(Pc.shape[0]):
                        pk = Pc[k]
                        S = [S[j] - pk[j:] * pk[j][None] for j in range(nSr)]
                    Ls.append(Lc)
                    Ps.append(Pc)
                return Ls, Ps, chol_c(S)

            def block_solve(fac, bb):
                # bb/result in SEGMENT form: (xF (nF,T), [xc (nc,T)/chain])
                Ls, Ps, LF = fac
                bF, bs = bb
                us = []
                for ci in range(len(CHAINS)):
                    u = fsub_c(Ls[ci], bs[ci])
                    for k in range(u.shape[0]):
                        bF = bF - Ps[ci][k] * u[k][None]
                    us.append(u)
                xF = bsub_c(LF, fsub_c(LF, bF))
                xs = []
                for ci in range(len(CHAINS)):
                    w = us[ci] - jnp.sum(Ps[ci] * xF[None], axis=1)
                    xs.append(bsub_c(Ls[ci], w))
                return xF, xs

            # dof-space segment helpers (root + per-chain pieces stay
            # unstacked through the whole factor/solve path; the only
            # concatenate left is the final qacc assembly)
            if USE_BLOCK:

                def seg_split(xd):
                    return (
                        xd[FB[0] : FB[1]],
                        [xd[a_:e_] for a_, e_ in CHAINS],
                    )

                def seg_cat(xx):
                    return jnp.concatenate([xx[0]] + list(xx[1]), axis=0)

                def seg_sub(aa, bb):
                    return (
                        aa[0] - bb[0],
                        [u - v for u, v in zip(aa[1], bb[1])],
                    )

                def seg_add(aa, bb):
                    return (
                        aa[0] + bb[0],
                        [u + v for u, v in zip(aa[1], bb[1])],
                    )

                def seg_dot(aa, bb):
                    t = jnp.sum(aa[0] * bb[0], axis=0)
                    for u, v in zip(aa[1], bb[1]):
                        t = t + jnp.sum(u * v, axis=0)
                    return t

                def mcols(blk):
                    return [blk[j:, j] for j in range(blk.shape[0])]

                Mb_fac = block_factor(
                    [mcols(Mb[0][ci3]) for ci3 in range(len(CHAINS))],
                    list(Mb[1]),
                    mcols(Mb[2]),
                )
                qs_seg = block_solve(Mb_fac, seg_split(qfrc_smooth))
                if DEBUG:
                    qacc_smooth = seg_cat(qs_seg)
            else:
                Lm = chol(M)
                qacc_smooth = chol_solve(Lm, qfrc_smooth)

            # ----- collision (hull vs plane | hfield patch)
            con_dist, con_pos, con_foot, con_nrm = [], [], [], []
            if not IS_HFIELD:
                # the floor normal is a pure structural constant: rotate ez
                # by the (numpy) floor geom quat at build time
                fw, fx_, fy_, fz_ = (float(v) for v in geom_quat_np[floor_gid])
                nrm_np = [
                    2.0 * (fx_ * fz_ + fw * fy_),
                    2.0 * (fy_ * fz_ - fw * fx_),
                    1.0 - 2.0 * (fx_ * fx_ + fy_ * fy_),
                ]
                nrm = jnp.stack([c + zeroT for c in nrm_np])
                rfb = lquat_rotate_constv(
                    xquat[floor_body], geom_pos_np[floor_gid]
                )
                fb_pos = (
                    xpos[floor_body] if rfb is None else xpos[floor_body] + rfb
                )
            for fi, gid in enumerate(s.collide_geom_ids):
                b = s.geom_bodyid[gid]
                rg = lquat_rotate_constv(xquat[b], geom_pos_np[gid])
                gp = xpos[b] if rg is None else xpos[b] + rg
                gq = lquat_mul_constq(xquat[b], geom_quat_np[gid])
                hull = C["foot_hull"][fi * nvert : (fi + 1) * nvert]
                verts = gp[None] + lquat_rotate(
                    gq[None], hull + 0.0 * gp[None]
                )
                if IS_HFIELD:
                    # bilinear-triangle height under each vertex, from the
                    # per-foot PxP world-frame patch (one-hot contractions
                    # instead of per-lane gathers; collision.py:44-73)
                    PP = hf["P"]
                    pf = patch_all[fi * PP : (fi + 1) * PP]  # (P,P,T): [j,i,:]
                    ox = porig[2 * fi]
                    oy = porig[2 * fi + 1]
                    fx = jnp.clip(
                        (verts[:, 0] - ox[None]) * (1.0 / hf["dxh"]),
                        0.0, PP - 1.001,
                    )
                    fy = jnp.clip(
                        (verts[:, 1] - oy[None]) * (1.0 / hf["dyh"]),
                        0.0, PP - 1.001,
                    )
                    iw = fx.astype(jnp.int32)  # fx >= 0: trunc == floor
                    jw = fy.astype(jnp.int32)
                    u = fx - iw.astype(f32)
                    v = fy - jw.astype(f32)
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (nvert, PP) + tail, 1
                    )
                    ohi = (iota == iw[:, None]).astype(f32)
                    ohi1 = (iota == (iw + 1)[:, None]).astype(f32)
                    ohj = (iota == jw[:, None]).astype(f32)
                    ohj1 = (iota == (jw + 1)[:, None]).astype(f32)
                    row0 = jnp.sum(ohj[:, :, None] * pf[None], axis=1)
                    row1 = jnp.sum(ohj1[:, :, None] * pf[None], axis=1)
                    z00 = jnp.sum(row0 * ohi, axis=1)
                    z10 = jnp.sum(row0 * ohi1, axis=1)
                    z01 = jnp.sum(row1 * ohi, axis=1)
                    z11 = jnp.sum(row1 * ohi1, axis=1)
                    lower = u + v <= 1.0  # cell split along the (+x,+y) diag
                    h = jnp.where(
                        lower,
                        z00 + u * (z10 - z00) + v * (z01 - z00),
                        z11 + (1 - u) * (z01 - z11) + (1 - v) * (z10 - z11),
                    )
                    nx = jnp.where(
                        lower,
                        -(z10 - z00) * (1.0 / hf["dxh"]),
                        (z01 - z11) * (1.0 / hf["dxh"]),
                    )
                    ny = jnp.where(
                        lower,
                        -(z01 - z00) * (1.0 / hf["dyh"]),
                        (z10 - z11) * (1.0 / hf["dyh"]),
                    )
                    ninv = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
                    vert_nrm = jnp.stack([nx * ninv, ny * ninv, ninv], axis=1)
                    dvert = (verts[:, 2] - h) * ninv  # (vz-h) onto normal
                else:
                    dvert = jnp.sum((verts - fb_pos[None]) * nrm[None], axis=1)
                dmask = dvert
                for _k in range(k_pts):
                    idx = jnp.argmin(dmask, axis=0)
                    oh = (
                        jax.lax.broadcasted_iota(jnp.int32, (nvert,) + tail, 0)
                        == idx[None]
                    ).astype(f32)
                    dist_k = jnp.sum(oh * dvert, axis=0)
                    vsel = jnp.sum(oh[:, None] * verts, axis=0)
                    nrm_k = (
                        jnp.sum(oh[:, None] * vert_nrm, axis=0)
                        if IS_HFIELD
                        else nrm
                    )
                    pos_k = vsel - 0.5 * dist_k[None] * nrm_k
                    con_dist.append(dist_k)
                    con_pos.append(pos_k)
                    con_foot.append(fi)
                    con_nrm.append(nrm_k)
                    dmask = jnp.where(oh > 0, 1e9 + zeroT[None], dmask)
            contact_dist = jnp.stack(con_dist, axis=0)

            ex = jnp.stack([oneT, zeroT, zeroT])
            ey = jnp.stack([zeroT, oneT, zeroT])

            def contact_frame(nrm_c):
                """mju_makeFrame tangents for one contact normal (3,T)."""
                use_x = (jnp.abs(nrm_c[0]) <= jnp.abs(nrm_c[1]))[None]
                ref_v = jnp.where(use_x, ex, ey)
                t1 = lcross(nrm_c, ref_v)
                t1 = t1 * jax.lax.rsqrt(jnp.sum(t1 * t1, axis=0, keepdims=True))
                return t1, lcross(nrm_c, t1)

            # ----- efc rows. Friction/limit rows have single-dof Jacobians
            # (+-e_dof): they are kept as (dof, per-lane coefficient) pairs
            # instead of dense nv-rows — J apply/transpose and the Hessian
            # only materialize dense rows for the 4*ncon contact facets.
            # rows are built per CLASS (friction | limit | contact): the
            # friction/uni cost split is static, so the solver below never
            # spends a blend op mixing them. Friction-row D/R are structural
            # constants (solref/solimp of the dof), folded at build time.
            arF: List = []  # friction rows: J = +e_dof
            for i in range(nfric):
                arF.append(-fric_B[i] * qvel[fd[i]])
            coefL: List = []  # limit rows: J = coef * e_dof
            arL: List = []
            DL: List = []
            RL: List = []
            for i in range(nlim):
                qadr, dof = lim_q[i], lim_d[i]
                j = lim_j[i]
                q = qpos[qadr]
                lo, hi = float(jnt_range[j, 0]), float(jnt_range[j, 1])
                dist_lo, dist_hi = q - lo, hi - q
                sign = jnp.where(dist_lo < dist_hi, 1.0, -1.0)
                dist = jnp.minimum(dist_lo, dist_hi)
                margin = float(jnt_margin[j])
                active = dist < margin
                pos_ = dist - margin
                imp = _impedance(lim_solimp[i], pos_)
                k_l, b_l = lim_kb[i]
                aref = -b_l * sign * qvel[dof] - k_l * imp * pos_
                r = jnp.maximum((1 - imp) / imp * lim_invw[i], _MINVAL)
                coefL.append(jnp.where(active, sign, 0.0))
                arL.append(jnp.where(active, aref, 0.0))
                DL.append(jnp.where(active, 1.0 / r, 0.0))
                RL.append(r)
            inv_trn = body_invweight0[:, 0]
            # Contact-row Jacobians via the triple-product identity
            # J[v]·d = cdof_lin[v]·d + cdof_ang[v]·(pc × d): one 3-vector
            # cross per facet instead of materializing the (nv,3,T) point
            # Jacobian per contact. Under USE_BLOCK rows are kept compact on
            # their static support (root block + own chain block).
            conBF: List = []  # per contact: [Bn,Bt1,Bt2] root parts (nF,T)
            conBC: List = []  # per contact: base-row chain parts (nc,T)
            con_chain: List[int] = []
            J_rows: List = []  # dense (nv,T) facet rows (non-block fallback)
            arC: List = []
            DC: List = []
            RC: List = []
            for ci in range(ncon):
                fi = con_foot[ci]
                b = s.geom_bodyid[s.collide_geom_ids[fi]]
                invw = float(inv_trn[b] + inv_trn[floor_body])
                p = con_pos[ci]
                dist = con_dist[ci]
                nrm_c = con_nrm[ci]
                t1, t2 = contact_frame(nrm_c)
                active = dist < 0.0
                imp = _impedance(con_solimp, dist)
                mu = floor_mu
                diag = 2.0 * mu * mu * (1.0 + mu * mu) * invw
                r = jnp.maximum((1 - imp) / imp * diag, _MINVAL)
                pc = p - com
                if USE_BLOCK:
                    # the 4 pyramid facets J = Jn ± mu*Jt1/t2 are mu-combos
                    # of THREE base rows — build and keep only the base
                    # rows; jmul/jtmul/Hessian below stay in base space
                    chi = foot_chain[fi]
                    ca_, ce_ = CHAINS[chi]
                    BF, BC, bvel = [], [], []
                    for d_vec in (nrm_c, t1, t2):
                        m_vec = lcross(pc, d_vec)

                        def jpart(a2, e2, d_vec=d_vec, m_vec=m_vec):
                            out = jnp.sum(
                                dv[a2:e2] * d_vec[None]
                                + dw[a2:e2] * m_vec[None],
                                axis=1,
                            )
                            msk = anc_np[b, a2:e2]
                            if not msk.all():  # static: zero non-ancestors
                                out = out * msk.reshape((-1,) + E1)
                            return out

                        bF = jnp.where(
                            active[None], jpart(FB[0], FB[1]), 0.0
                        )
                        bC = jnp.where(active[None], jpart(ca_, ce_), 0.0)
                        BF.append(bF)
                        BC.append(bC)
                        bvel.append(
                            jnp.sum(bF * qvel[FB[0] : FB[1]], axis=0)
                            + jnp.sum(bC * qvel[ca_:ce_], axis=0)
                        )
                    conBF.append(BF)
                    conBC.append(BC)
                    con_chain.append(chi)
                    mv1 = mu * bvel[1]
                    mv2 = mu * bvel[2]
                    vels = [
                        bvel[0] + mv1,
                        bvel[0] - mv1,
                        bvel[0] + mv2,
                        bvel[0] - mv2,
                    ]
                    for vel in vels:
                        aref = -b_con * vel - k_con * imp * dist
                        arC.append(jnp.where(active, aref, 0.0))
                        DC.append(jnp.where(active, 1.0 / r, 0.0))
                        RC.append(r)
                else:
                    for t_vec in (t1, t2):
                        for sgn in (1.0, -1.0):
                            d_vec = nrm_c + sgn * mu[None] * t_vec
                            m_vec = lcross(pc, d_vec)

                            def jpart(a2, e2, d_vec=d_vec, m_vec=m_vec):
                                out = jnp.sum(
                                    dv[a2:e2] * d_vec[None]
                                    + dw[a2:e2] * m_vec[None],
                                    axis=1,
                                )
                                msk = anc_np[b, a2:e2]
                                if not msk.all():
                                    out = out * msk.reshape((-1,) + E1)
                                return out

                            Jrow = jnp.where(
                                active[None], jpart(0, nv), 0.0
                            )
                            vel = jnp.sum(Jrow * qvel, axis=0)
                            J_rows.append(Jrow)
                            aref = -b_con * vel - k_con * imp * dist
                            arC.append(jnp.where(active, aref, 0.0))
                            DC.append(jnp.where(active, 1.0 / r, 0.0))
                            RC.append(r)

            sdofs = fd + lim_d  # static dof index per single row
            nsingle = nfric + nlim

            if USE_BLOCK:
                # ----- Newton solve, segment/class form. Everything stays
                # split by dof segment (root, chains) and by row class
                # (friction | limit | contact) end-to-end; the friction-row
                # D/R constants fold to numpy.
                arF_st = jnp.stack(arF, axis=0)  # (nfric,T)
                arL_st = jnp.stack(arL, axis=0)  # (nlim,T)
                arC_st = jnp.stack(arC, axis=0)  # (ncon*4,T)
                DvL = jnp.stack(DL, axis=0)
                DvC = jnp.stack(DC, axis=0)
                flvF = jnp.stack([frictionloss[i] for i in fd], axis=0)
                DvF = C["fricD"]
                RvFh = C["fricRh"]

                def dof_loc(dof):
                    if FB[0] <= dof < FB[1]:
                        return -1, dof - FB[0]
                    for ci5, (a_, e_) in enumerate(CHAINS):
                        if a_ <= dof < e_:
                            return ci5, dof - a_
                    raise AssertionError(dof)

                sloc = [dof_loc(d) for d in sdofs]

                def srow(xx, i):
                    ci5, k = sloc[i]
                    return (xx[0] if ci5 < 0 else xx[1][ci5])[k]

                def jmul(xx):
                    jf = jnp.stack(
                        [srow(xx, i) for i in range(nfric)], axis=0
                    )
                    jl = jnp.stack(
                        [
                            coefL[i] * srow(xx, nfric + i)
                            for i in range(nlim)
                        ],
                        axis=0,
                    )
                    xF = xx[0]
                    jc_rows: List = []
                    for ci5 in range(ncon):
                        BF, BC = conBF[ci5], conBC[ci5]
                        xc = xx[1][con_chain[ci5]]
                        un = jnp.sum(BF[0] * xF, axis=0) + jnp.sum(
                            BC[0] * xc, axis=0
                        )
                        m1 = floor_mu * (
                            jnp.sum(BF[1] * xF, axis=0)
                            + jnp.sum(BC[1] * xc, axis=0)
                        )
                        m2 = floor_mu * (
                            jnp.sum(BF[2] * xF, axis=0)
                            + jnp.sum(BC[2] * xc, axis=0)
                        )
                        jc_rows += [un + m1, un - m1, un + m2, un - m2]
                    jc = jnp.stack(jc_rows, axis=0)
                    return jf, jl, jc

                def jar_of(xx):
                    jf, jl, jc = jmul(xx)
                    return jf - arF_st, jl - arL_st, jc - arC_st

                def jtmul(gg):
                    gf, gl, gc = gg
                    rowsF: List = [zeroT] * (FB[1] - FB[0])
                    rowsC: List = [
                        [zeroT] * (e_ - a_) for a_, e_ in CHAINS
                    ]

                    def _rows(ci5):
                        return rowsF if ci5 < 0 else rowsC[ci5]

                    for i in range(nfric):
                        ci5, k = sloc[i]
                        _rows(ci5)[k] = _rows(ci5)[k] + gf[i]
                    for i in range(nlim):
                        ci5, k = sloc[nfric + i]
                        _rows(ci5)[k] = _rows(ci5)[k] + coefL[i] * gl[i]
                    outF = jnp.stack(rowsF, axis=0)
                    outC = [jnp.stack(r_, axis=0) for r_ in rowsC]
                    for ci5 in range(ncon):
                        y0, y1, y2, y3 = (
                            gc[4 * ci5 + k] for k in range(4)
                        )
                        sn = ((y0 + y1) + (y2 + y3))[None]
                        s1 = (floor_mu * (y0 - y1))[None]
                        s2 = (floor_mu * (y2 - y3))[None]
                        BF, BC = conBF[ci5], conBC[ci5]
                        ch = con_chain[ci5]
                        outF = (
                            outF + BF[0] * sn + BF[1] * s1 + BF[2] * s2
                        )
                        outC[ch] = (
                            outC[ch] + BC[0] * sn + BC[1] * s1 + BC[2] * s2
                        )
                    return outF, outC

                def mmul(xx):
                    Mcc, Mcf, Mff = Mb
                    xF = xx[0]
                    yF = jnp.sum(Mff * xF[None], axis=1)
                    ys = []
                    for ci3, xc in enumerate(xx[1]):
                        ys.append(
                            jnp.sum(Mcc[ci3] * xc[None], axis=1)
                            + jnp.sum(Mcf[ci3] * xF[None], axis=1)
                        )
                        # panel^T contribution, unrolled (Mosaic lacks the
                        # 3D axis-0 reduction this would otherwise need)
                        for k in range(xc.shape[0]):
                            yF = yF + Mcf[ci3][k] * xc[k][None]
                    return yF, ys

                def force_hess(jar):
                    jf, jl, jc = jar
                    qf = DvF * jf
                    gf = jnp.clip(qf, -flvF, flvF)
                    hf_ = jnp.where(jnp.abs(qf) < flvF, DvF, 0.0)
                    ml_ = jl < 0
                    gl = jnp.where(ml_, DvL * jl, 0.0)
                    hl = jnp.where(ml_, DvL, 0.0)
                    mc_ = jc < 0
                    gc = jnp.where(mc_, DvC * jc, 0.0)
                    hc = jnp.where(mc_, DvC, 0.0)
                    return (gf, gl, gc), (hf_, hl, hc)

                def ccost(jar):
                    # constraint-space cost only (the M half is added by the
                    # callers that need it — it is identically 0 at
                    # x = qacc_smooth)
                    jf, jl, jc = jar
                    qf = DvF * jf
                    fr = jnp.where(
                        jnp.abs(qf) < flvF,
                        0.5 * qf * jf,
                        flvF * jnp.abs(jf) - RvFh * flvF * flvF,
                    )
                    ul = jnp.where(jl < 0, (0.5 * DvL) * jl * jl, 0.0)
                    uc = jnp.where(jc < 0, (0.5 * DvC) * jc * jc, 0.0)
                    return (
                        jnp.sum(fr, axis=0)
                        + jnp.sum(ul, axis=0)
                        + jnp.sum(uc, axis=0)
                    )

                ws = seg_split(warm)
                dws = seg_sub(ws, qs_seg)
                c_w = ccost(jar_of(ws)) + 0.5 * seg_dot(dws, mmul(dws))
                c_s = ccost(jar_of(qs_seg))
                sel_w = (c_w < c_s)[None]
                x = (
                    jnp.where(sel_w, ws[0], qs_seg[0]),
                    [
                        jnp.where(sel_w, u, v)
                        for u, v in zip(ws[1], qs_seg[1])
                    ],
                )

                for _ in range(iterations):
                    jar = jar_of(x)
                    gg, hh = force_hess(jar)
                    mdx = mmul(seg_sub(x, qs_seg))
                    grad = seg_add(mdx, jtmul(gg))
                    # dof-friction and joint-limit rows have single-dof
                    # Jacobians (+-e_dof): their J^T diag(h) J contribution
                    # is purely diagonal; only contact rows need rank-1
                    # outer products — and those touch only the LOWER
                    # triangle (trailing columns) the factorization reads.
                    hf_, hl, hc = hh
                    hdF: List = [None] * (FB[1] - FB[0])
                    hdC: List = [[None] * (e_ - a_) for a_, e_ in CHAINS]

                    def _hrows(ci5):
                        return hdF if ci5 < 0 else hdC[ci5]

                    for i in range(nfric):
                        ci5, k = sloc[i]
                        prev = _hrows(ci5)[k]
                        _hrows(ci5)[k] = (
                            hf_[i] if prev is None else prev + hf_[i]
                        )
                    for i in range(nlim):
                        ci5, k = sloc[nfric + i]
                        prev = _hrows(ci5)[k]
                        _hrows(ci5)[k] = (
                            hl[i] if prev is None else prev + hl[i]
                        )

                    def hcols(blk, hrows):
                        # trailing cols of blk with per-dof diagonal adds
                        n_ = blk.shape[0]
                        cols = []
                        for j in range(n_):
                            cj = blk[j:, j]
                            if hrows[j] is not None:
                                d0 = (cj[0] + hrows[j])[None]
                                cj = (
                                    jnp.concatenate([d0, cj[1:]], axis=0)
                                    if n_ - j > 1
                                    else d0
                                )
                            cols.append(cj)
                        return cols

                    Mcc, Mcf, Mff = Mb
                    AccH = [
                        hcols(Mcc[ci5], hdC[ci5])
                        for ci5 in range(len(CHAINS))
                    ]
                    AcfH = list(Mcf)
                    AffH = hcols(Mff, hdF)
                    for ci5 in range(ncon):
                        # facet-space J^T diag(h) J folded to base space:
                        # with facets F = P B (P the 4x3 mu-combo matrix),
                        # the update is B^T G B, G = P^T diag(h) P — a 3x3
                        # PSD matrix with G[1,2]=0. Factor G = L L^T and
                        # add the THREE combined rows C = L^T B as plain
                        # symmetric rank-1s (3 outer products instead of 4,
                        # on the lower-triangle columns only).
                        h0, h1, h2, h3 = (
                            hc[4 * ci5 + k] for k in range(4)
                        )
                        mu2 = floor_mu * floor_mu
                        g00 = (h0 + h1) + (h2 + h3)
                        g01 = floor_mu * (h0 - h1)
                        g02 = floor_mu * (h2 - h3)
                        g11 = mu2 * (h0 + h1)
                        g22 = mu2 * (h2 + h3)
                        r11 = jax.lax.rsqrt(jnp.maximum(g00, 1e-30))
                        l11 = g00 * r11
                        l21 = g01 * r11
                        l31 = g02 * r11
                        d2 = jnp.maximum(g11 - l21 * l21, 0.0)
                        r22 = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
                        l22 = d2 * r22
                        # G[1,2] = 0 (t1/t2 facet pairs share no h terms)
                        l32 = -(l21 * l31) * r22
                        d3 = jnp.maximum(
                            g22 - l31 * l31 - l32 * l32, 0.0
                        )
                        l33 = d3 * jax.lax.rsqrt(jnp.maximum(d3, 1e-30))
                        BF, BC = conBF[ci5], conBC[ci5]
                        ch = con_chain[ci5]
                        crows = [
                            (
                                l11[None] * BF[0]
                                + l21[None] * BF[1]
                                + l31[None] * BF[2],
                                l11[None] * BC[0]
                                + l21[None] * BC[1]
                                + l31[None] * BC[2],
                            ),
                            (
                                l22[None] * BF[1] + l32[None] * BF[2],
                                l22[None] * BC[1] + l32[None] * BC[2],
                            ),
                            (l33[None] * BF[2], l33[None] * BC[2]),
                        ]
                        for cF, cC in crows:
                            AccH[ch] = [
                                AccH[ch][j] + cC[j:] * cC[j][None]
                                for j in range(len(AccH[ch]))
                            ]
                            AcfH[ch] = AcfH[ch] + cC[:, None] * cF[None]
                            AffH = [
                                AffH[j] + cF[j:] * cF[j][None]
                                for j in range(len(AffH))
                            ]
                    ngF, ngs = grad
                    dxn = block_solve(
                        block_factor(AccH, AcfH, AffH),
                        (-ngF, [-u for u in ngs]),
                    )
                    jvf, jvl, jvc = jmul(dxn)
                    mv = mmul(dxn)
                    g0 = seg_dot(dxn, mdx)
                    hq = seg_dot(dxn, mv)
                    # linesearch over the 1-D piecewise-quadratic: work in
                    # t = D*(jar + alpha*jv) per class, with D*jar, D*jv,
                    # D*jv^2 hoisted out of the alpha loop
                    jf0, jl0, jc0 = jar
                    qf0 = DvF * jf0
                    qvf = DvF * jvf
                    Dj2f = qvf * jvf
                    ql0 = DvL * jl0
                    qvl = DvL * jvl
                    Dj2l = qvl * jvl
                    qc0 = DvC * jc0
                    qvc = DvC * jvc
                    Dj2c = qvc * jvc
                    alpha = zeroT
                    for _ in range(ls_iterations):
                        tf = qf0 + alpha[None] * qvf
                        tl = ql0 + alpha[None] * qvl
                        tc = qc0 + alpha[None] * qvc
                        mf_ = jnp.abs(tf) < flvF
                        ml_ = tl < 0
                        mc_ = tc < 0
                        gjv = (
                            jnp.sum(
                                jnp.clip(tf, -flvF, flvF) * jvf, axis=0
                            )
                            + jnp.sum(jnp.where(ml_, tl * jvl, 0.0), axis=0)
                            + jnp.sum(jnp.where(mc_, tc * jvc, 0.0), axis=0)
                        )
                        hjv2 = (
                            jnp.sum(jnp.where(mf_, Dj2f, 0.0), axis=0)
                            + jnp.sum(jnp.where(ml_, Dj2l, 0.0), axis=0)
                            + jnp.sum(jnp.where(mc_, Dj2c, 0.0), axis=0)
                        )
                        dphi = g0 + alpha * hq + gjv
                        ddphi = hq + hjv2
                        alpha = alpha - dphi / jnp.maximum(ddphi, 1e-12)
                    x = (
                        x[0] + alpha[None] * dxn[0],
                        [
                            u + alpha[None] * v
                            for u, v in zip(x[1], dxn[1])
                        ],
                    )

                qacc = seg_cat(x)
            else:
                # ----- dense fallback (models without block-arrow shape)
                scoef: List = [oneT] * nfric + coefL
                Jc = jnp.stack(J_rows, axis=0)  # (ncon*4, nv, T) dense rows
                aref = jnp.stack(arF + arL + arC, axis=0)
                Dv = jnp.stack(
                    [fric_D[i] * oneT for i in range(nfric)] + DL + DC,
                    axis=0,
                )
                Rv = jnp.stack(
                    [fric_R[i] * oneT for i in range(nfric)] + RL + RC,
                    axis=0,
                )
                flv = jnp.concatenate(
                    [
                        jnp.stack([frictionloss[i] for i in fd], axis=0),
                        jnp.zeros_like(Dv[: nlim + ncon * 4]),
                    ],
                    axis=0,
                )
                fric_sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (nefc,) + E1, 0)
                    < nfric
                ).astype(f32)

                def jmul(x):
                    single = jnp.stack(
                        [scoef[i] * x[sdofs[i]] for i in range(nsingle)],
                        axis=0,
                    )
                    con = jnp.sum(Jc * x[None], axis=1)
                    return jnp.concatenate([single, con], axis=0)

                def jtmul(y):
                    rows: List = [zeroT] * nv
                    for i in range(nsingle):
                        rows[sdofs[i]] = rows[sdofs[i]] + scoef[i] * y[i]
                    out = jnp.stack(rows, axis=0)
                    for e in range(ncon * 4):
                        out = out + Jc[e] * y[nsingle + e][None]
                    return out

                def mmul(x):
                    return jnp.sum(M * x[None], axis=1)

                def force_hess(jar):
                    quad_f = Dv * jar
                    uni_g = jnp.where(jar < 0, quad_f, 0.0)
                    uni_h = jnp.where(jar < 0, Dv, 0.0)
                    fr_g = jnp.clip(quad_f, -flv, flv)
                    fr_h = jnp.where(jnp.abs(quad_f) < flv, Dv, 0.0)
                    gg = fric_sel * fr_g + (1 - fric_sel) * uni_g
                    hh = fric_sel * fr_h + (1 - fric_sel) * uni_h
                    return gg, hh

                def cost(x):
                    jar = jmul(x) - aref
                    quad = 0.5 * Dv * jar * jar
                    uni = jnp.where(jar < 0, quad, 0.0)
                    lin = flv * jnp.abs(jar) - 0.5 * flv * flv * Rv
                    fr = jnp.where(jnp.abs(Dv * jar) < flv, quad, lin)
                    ccost = jnp.sum(
                        fric_sel * fr + (1 - fric_sel) * uni, axis=0
                    )
                    dx = x - qacc_smooth
                    return 0.5 * jnp.sum(dx * mmul(dx), axis=0) + ccost

                c_w = cost(warm)
                c_s = cost(qacc_smooth)
                x = jnp.where((c_w < c_s)[None], warm, qacc_smooth)

                for _ in range(iterations):
                    jar = jmul(x) - aref
                    gg, hh = force_hess(jar)
                    grad = mmul(x - qacc_smooth) + jtmul(gg)
                    hd_rows = [zeroT] * nv
                    for e, dof in enumerate(fd + lim_d):
                        hd_rows[dof] = hd_rows[dof] + hh[e]
                    hdiag = jnp.stack(hd_rows, axis=0)  # (nv, T)
                    H = M + C["eye_nv1"] * hdiag[:, None]
                    for e in range(ncon * 4):
                        Je = Jc[e]
                        H = H + (hh[nsingle + e] * Je[:, None]) * Je[None]
                    Lh = chol(H)
                    dxn = -chol_solve(Lh, grad)
                    jv = jmul(dxn)
                    mv = mmul(dxn)
                    g0 = jnp.sum(dxn * mmul(x - qacc_smooth), axis=0)
                    hq = jnp.sum(dxn * mv, axis=0)
                    alpha = zeroT
                    for _ in range(ls_iterations):
                        jar_a = jar + alpha[None] * jv
                        gg, hh = force_hess(jar_a)
                        dphi = g0 + alpha * hq + jnp.sum(jv * gg, axis=0)
                        ddphi = hq + jnp.sum(hh * jv * jv, axis=0)
                        alpha = alpha - dphi / jnp.maximum(ddphi, 1e-12)
                    x = x + alpha[None] * dxn

                qacc = x

            # ----- sensors. Derived quantities (sensordata, site poses)
            # describe the START of a substep and feed nothing downstream
            # inside the kernel, so only the LAST substep needs them — the
            # first n-1 substeps skip this whole section (with_sensors=False)
            # and pass the stale carry values through.
            if not with_sensors:
                return dict(
                    qacc=qacc,
                    actuator_force=force,
                    contact_dist=contact_dist,
                )
            site_xpos_l, site_xmat_l, site_xquat_l = [], [], []
            for i in range(s.nsite):
                b = s.site_bodyid[i]
                rs = lquat_rotate_constv(xquat[b], site_pos_np[i])
                sp = xpos[b] if rs is None else xpos[b] + rs
                sq = lquat_mul_constq(xquat[b], site_quat_np[i])
                site_xpos_l.append(sp)
                site_xquat_l.append(sq)
                site_xmat_l.append(lquat_to_mat(sq))
            site_xpos_st = jnp.stack(site_xpos_l, 0)
            site_xmat_st = jnp.stack(site_xmat_l, 0)

            vdofacc = cdof_dot * qvel[:, None] + cdof * qacc[:, None]
            cacc = grav[None] + mask_dot(anc, vdofacc)

            # per-site kinematic quantities computed once (sensors sharing a
            # site — e.g. the IMU's gyro/velocimeter/accelerometer — reuse
            # them), and all body-frame rotations of one site batched into a
            # single (m,3,3,T) contraction instead of m separate rot_t calls
            _site_w, _site_vp = {}, {}

            def site_w(objid):
                if objid not in _site_w:
                    _site_w[objid] = cvel[s.site_bodyid[objid]][:3]
                return _site_w[objid]

            def site_vp(objid):
                if objid not in _site_vp:
                    b_ = s.site_bodyid[objid]
                    _site_vp[objid] = cvel[b_][3:] + lcross(
                        site_w(objid), site_xpos_l[objid] - com
                    )
                return _site_vp[objid]

            def sensor_vec(kind, objid):
                if kind == "gyro":
                    return site_w(objid)
                if kind == "velocimeter":
                    return site_vp(objid)
                # accelerometer
                b_ = s.site_bodyid[objid]
                pnt = site_xpos_l[objid]
                return (
                    cacc[b_][3:]
                    + lcross(cacc[b_][:3], pnt - com)
                    + lcross(site_w(objid), site_vp(objid))
                )

            rot_groups: dict = {}  # objid -> [sensor index]
            for si, (kind, objid, a, dim) in enumerate(s.sensors):
                if kind in ("gyro", "velocimeter", "accelerometer"):
                    rot_groups.setdefault(objid, []).append(si)
            rot_vals: dict = {}  # sensor index -> rotated (3,T)
            for objid, sids in rot_groups.items():
                V = jnp.stack(
                    [sensor_vec(s.sensors[si][0], objid) for si in sids], 0
                )  # (m,3,T)
                rot = site_xmat_l[objid]  # (3,3,T); out[m,i] = Σ_k rot[k,i]·V[m,k]
                rotated = jnp.sum(rot[None] * V[:, :, None], axis=1)
                for mi, si in enumerate(sids):
                    rot_vals[si] = rotated[mi]

            sens = []
            for si, (kind, objid, a, dim) in enumerate(s.sensors):
                rot = site_xmat_l[objid]
                if si in rot_vals:
                    val = rot_vals[si]
                elif kind == "framezaxis":
                    val = rot[:, 2]
                elif kind == "framexaxis":
                    val = rot[:, 0]
                elif kind == "framelinvel":
                    val = site_vp(objid)
                elif kind == "frameangvel":
                    val = site_w(objid)
                elif kind == "framepos":
                    val = site_xpos_l[objid]
                elif kind == "framequat":
                    val = site_xquat_l[objid]
                else:  # pragma: no cover
                    raise NotImplementedError(kind)
                sens.append(val)
            sensordata = jnp.concatenate(sens, axis=0)

            out = dict(
                qacc=qacc,
                site_xpos=site_xpos_st,
                site_xmat=site_xmat_st,
                actuator_force=force,
                contact_dist=contact_dist,
                sensordata=sensordata,
            )
            if DEBUG:
                out["dbg_qacc_smooth"] = qacc_smooth
                out["dbg_qfrc_bias"] = qfrc_bias
                out["dbg_qfrc_smooth"] = qfrc_smooth
                out["dbg_mdiag"] = armature + mdiag  # = diag(M)
                if USE_BLOCK:
                    out["dbg_aref"] = jnp.concatenate(
                        [arF_st, arL_st, arC_st], axis=0
                    )
                    out["dbg_D"] = jnp.concatenate(
                        [DvF + 0.0 * arF_st, DvL, DvC], axis=0
                    )
                    out["dbg_grad0"] = seg_cat(
                        jtmul(force_hess(jar_of(x))[0])
                    )
                else:
                    out["dbg_aref"] = aref
                    out["dbg_D"] = Dv
                    out["dbg_grad0"] = jtmul(force_hess(jmul(x) - aref)[0])
            return out

        def integrate(qpos, qvel, qacc):
            qvel_n = qvel + dt * qacc
            segs = []
            for j in seg_order:
                qadr, dadr = s.jnt_qposadr[j], s.jnt_dofadr[j]
                if s.jnt_type[j] == FREE:
                    segs.append(qpos[qadr : qadr + 3] + dt * qvel_n[dadr : dadr + 3])
                    quat = jnp.stack([qpos[qadr + 3 + i] for i in range(4)])
                    w = jnp.stack([qvel_n[dadr + 3 + i] for i in range(3)])
                    angle = jnp.sqrt(jnp.sum(w * w, axis=0))
                    safe = jnp.maximum(angle, 1e-12)
                    axis = w * (1.0 / safe)[None]
                    half = 0.5 * angle * dt
                    sh = jnp.sin(half)
                    dq = jnp.concatenate([jnp.cos(half)[None], axis * sh[None]], 0)
                    ident = jnp.concatenate([1.0 + 0.0 * half[None], 0.0 * axis], 0)
                    dq = jnp.where((angle < 1e-12)[None], ident, dq)
                    segs.append(lquat_normalize(lquat_mul(quat, dq)))
                elif HINGE_CONTIG:
                    if qadr == H_Q0:  # all hinges in one fused slice update
                        segs.append(
                            qpos[H_Q0 : H_Q0 + H_N]
                            + dt * qvel_n[H_D0 : H_D0 + H_N]
                        )
                else:
                    segs.append(qpos[qadr : qadr + 1] + dt * qvel_n[dadr : dadr + 1])
            return jnp.concatenate(segs, axis=0), qvel_n

        def substep(_, carry, with_sensors=True):
            qpos, qvel, warm = carry[:3]
            out = forward_lane(
                qpos, qvel, warm, with_sensors=with_sensors or DEBUG
            )
            qpos_n, qvel_n = integrate(qpos, qvel, out["qacc"])
            if not (with_sensors or DEBUG):
                # intermediate substep: site/sensor slots ride the carry
                return (
                    qpos_n, qvel_n, out["qacc"], out["qacc"], carry[4],
                    carry[5], out["actuator_force"], out["contact_dist"],
                    carry[8],
                )
            res = (
                qpos_n, qvel_n, out["qacc"], out["qacc"], out["site_xpos"],
                out["site_xmat"], out["actuator_force"], out["contact_dist"],
                out["sensordata"],
            )
            if DEBUG:
                res = res + (
                    out["dbg_qacc_smooth"], out["dbg_qfrc_bias"],
                    out["dbg_qfrc_smooth"], out["dbg_mdiag"], out["dbg_aref"],
                    out["dbg_D"], out["dbg_grad0"],
                )
            return res

        z = lambda *shape: jnp.zeros(shape + tail, f32)
        init = (
            qpos_ref[:], qvel_ref[:], warm_ref[:], z(nv), z(s.nsite, 3),
            z(s.nsite, 3, 3), z(nu), z(ncon), z(s.nsensordata),
        )
        if DEBUG:
            init = init + (z(nv), z(nv), z(nv), z(nv), z(nefc), z(nefc), z(nv))
        # n-1 sensor-free substeps in the loop, then one final substep with
        # the sensor/site tail (the only one whose derived values are read)
        out = jax.lax.fori_loop(
            0,
            n_substeps - 1,
            lambda i, c: substep(i, c, with_sensors=False),
            init,
        )
        out = substep(0, out, with_sensors=True)
        (qpos_n, qvel_n, warm_n, qacc, sxp, sxm, af, cd, sd) = out[:9]
        vals = (qpos_n, qvel_n, qacc, warm_n, sxp, sxm, af, cd, sd) + tuple(out[9:])
        for ref, val in zip(out_refs, vals):
            ref[:] = val

    out_shapes = dict(
        qpos=(nq,), qvel=(nv,), qacc=(nv,), qacc_warmstart=(nv,),
        site_xpos=(s.nsite, 3), site_xmat=(s.nsite, 3, 3),
        actuator_force=(nu,), contact_dist=(ncon,),
        sensordata=(s.nsensordata,),
    )
    if DEBUG:
        out_shapes.update(
            dbg_qacc_smooth=(nv,), dbg_qfrc_bias=(nv,), dbg_qfrc_smooth=(nv,),
            dbg_mdiag=(nv,), dbg_aref=(nefc,), dbg_D=(nefc,), dbg_grad0=(nv,),
        )
    return kernel, const_values, out_shapes, hf


_KERNEL_CACHE = {}
_TILE_TABLE_CACHE = {}


def _tile_table(s, hfield_data, hf):
    """Flat table of WIN-aligned PxP world-z height tiles.

    Entry t = tj*nti + ti holds rows [min(WIN*tj, nrow-P) : +P] x cols
    [min(WIN*ti, ncol-P) : +P] of the scaled heightfield, flattened to a
    contiguous (P*P,) row so per-env patch lookup is a fast row-gather.
    """
    key = id(s)
    if key not in _TILE_TABLE_CACHE:
        hd = (
            np.asarray(hfield_data, np.float32) * hf["zscale"] + hf["zw"]
        )
        nrow, ncol = hf["nrow"], hf["ncol"]
        WIN, P = hf["win"], hf["P"]
        ntj = (nrow + WIN - 1) // WIN
        nti = (ncol + WIN - 1) // WIN
        tab = np.zeros((ntj * nti, P * P), np.float32)
        for a in range(ntj):
            sj = min(WIN * a, nrow - P)
            for b in range(nti):
                si = min(WIN * b, ncol - P)
                tab[a * nti + b] = hd[sj : sj + P, si : si + P].reshape(-1)
        # cache numpy, not a device array: a jnp array materialized inside
        # one jit trace must not be reused in another (tracer leak)
        _TILE_TABLE_CACHE[key] = (tab, nti)
    tab, nti = _TILE_TABLE_CACHE[key]
    return jnp.asarray(tab), nti


_HW_TILES = (1024, 128)  # (8,128) sublane x lane vreg tail, or 1-D lane tile


def pick_tile(batch: int) -> int | None:
    """Largest hardware-legal env tile for a batch: 1024 (8 f32 sublanes x
    128 lanes — one full vreg tail per op) or 128 (classic 1-D lane tile).
    Intermediate sublane counts (2,4,..) are rejected by Mosaic: a block's
    second-to-minor dim must be a multiple of the 8-row sublane tile. The
    batch a device sees must be a multiple of the tile; under data-parallel
    sharding that is the PER-DEVICE batch, so the auto-pick is bounded by
    batch / jax.device_count(). ODPT_LANE_TILE forces a specific tile
    (still subject to divisibility); returns None if even 128 won't fit."""
    ov = os.environ.get("ODPT_LANE_TILE")
    if ov:
        t = int(ov)
        return t if (batch % t == 0 and t in _HW_TILES) else None
    per_dev = batch // jax.device_count() if batch % jax.device_count() == 0 else batch
    for t in _HW_TILES:
        if per_dev % t == 0:
            return t
    return None


# concrete models by spec id, so kernels for new tiles can be built lazily
# at trace time (the call-site model may be a batched/DR tracer)
_MODEL_REGISTRY: Dict[int, Model] = {}


def prepare(m: Model, n_substeps: int, tile: int = LANE_TILE) -> None:
    """Build + cache the kernel from a CONCRETE model (host-side), baking
    structural constants. Call before tracing (e.g. at env construction)."""
    if isinstance(m.body_pos, jax.core.Tracer):
        raise ValueError("megakernel.prepare() needs a concrete Model")
    if id(m.spec) not in _MODEL_REGISTRY:
        # all-numpy copy: lazy builds for other tiles may run inside a jit
        # trace, where any op on a jnp-array leaf would stage a tracer
        _MODEL_REGISTRY[id(m.spec)] = jax.tree.map(np.asarray, m)
    key = (id(m.spec), n_substeps, tile)
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = _build_kernel(
            _MODEL_REGISTRY[id(m.spec)], n_substeps, tile
        )


def megakernel_step_batched(m: Model, d: Data, ctrl: jnp.ndarray,
                            n_substeps: int, tile: int = LANE_TILE) -> Data:
    """Batched full step: Data/ctrl leaves carry a leading env axis B
    (multiple of `tile`); the 8 randomized Model fields may carry it too."""
    s = m.spec
    B = d.qpos.shape[0]
    assert B % tile == 0, (B, tile)

    key = (id(s), n_substeps, tile)
    if key not in _KERNEL_CACHE:
        # build from the registered concrete model: the call-site model may
        # be a batched DR tracer, but kernel constants are structural
        cm = _MODEL_REGISTRY.get(id(s))
        if cm is None and not isinstance(m.body_pos, jax.core.Tracer):
            cm = m
        if cm is None:
            raise ValueError(
                "megakernel: no concrete Model registered for this spec; "
                "call megakernel.prepare() at env construction"
            )
        prepare(cm, n_substeps, tile)
    kernel, const_values, out_shapes, hf = _KERNEL_CACHE[key]

    def bcast(x, shape):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == len(shape):
            x = jnp.broadcast_to(x[None], (B,) + shape)
        return x

    # Env tail layout: env axis moves last; for sublane tiles (tile > 128)
    # it splits into (B // 128, 128) so each grid program's block is an
    # (SUB, 128) tail — envs [i*tile, (i+1)*tile) land in program i with
    # env e at sublane (e % tile) // 128, lane e % 128.
    SUB = tile // 128

    def lane(x):
        x = jnp.moveaxis(x, 0, -1)
        if SUB > 1:
            x = x.reshape(x.shape[:-1] + (B // 128, 128))
        return x

    gain0 = bcast(m.actuator_gainprm[..., 0], (s.nu,))
    bias0 = bcast(m.actuator_biasprm[..., 0], (s.nu,))
    bias1 = bcast(m.actuator_biasprm[..., 1], (s.nu,))
    bias2 = bcast(m.actuator_biasprm[..., 2], (s.nu,))
    qpos0 = bcast(m.qpos0, (s.nq,))
    fl = bcast(m.dof_frictionloss, (s.nv,))
    arma = bcast(m.dof_armature, (s.nv,))
    mass = bcast(m.body_mass, (s.nbody,))
    ipos = bcast(m.body_ipos, (s.nbody, 3))
    mu = bcast(m.geom_friction[..., s.floor_geom_id, 0], ())[:, None]  # (B,1)

    lane_inputs = [
        lane(d.qpos), lane(d.qvel), lane(jnp.asarray(ctrl, jnp.float32)),
        lane(d.qacc_warmstart), lane(qpos0), lane(gain0), lane(bias0),
        lane(bias1), lane(bias2), lane(fl), lane(arma), lane(mass),
        lane(ipos), lane(mu),
    ]
    if hf is not None:
        # per-foot PxP world-frame height patch around each foot's
        # previous-step site position (feet move <~2cm per control step —
        # far inside the patch half-width)
        P, nfoot = hf["P"], len(s.collide_geom_ids)
        WIN = hf["win"]
        centers = d.site_xpos[:, list(hf["foot_site"]), :2]  # (B,nfoot,2)
        gx = (centers[..., 0] - hf["x0w"]) / hf["dxh"]
        gy = (centers[..., 1] - hf["y0w"]) / hf["dyh"]
        # patch origin: KOFF cells left/below the foot-center cell (see the
        # margin analysis at HFIELD_P). Tiled path snaps to the WIN grid;
        # non-tiled dynamic_slice clamps to a full in-bounds PxP window.
        hi = (hf["ncol"] - WIN) if hf["tiled"] else (hf["ncol"] - P)
        hj = (hf["nrow"] - WIN) if hf["tiled"] else (hf["nrow"] - P)
        i0 = jnp.clip(jnp.floor(gx).astype(jnp.int32) - hf["koff"], 0, hi)
        j0 = jnp.clip(jnp.floor(gy).astype(jnp.int32) - hf["koff"], 0, hj)
        if hf["tiled"]:
            # row-gather of WIN-aligned PxP tiles from a precomputed flat
            # table — per-env dynamic_slice gathers are ~50x slower on TPU
            tab, nti = _tile_table(s, m.hfield_data, hf)
            tj = j0 // WIN
            ti = i0 // WIN
            ids = (tj * nti + ti).reshape(-1)
            patch = jnp.take(tab, ids, axis=0).reshape(B, nfoot, P, P)
            # tile start (matches _tile_table's clamp), arithmetic not gather
            si = jnp.minimum(WIN * ti, hf["ncol"] - P)
            sj = jnp.minimum(WIN * tj, hf["nrow"] - P)
            ox = hf["x0w"] + si.astype(jnp.float32) * hf["dxh"]
            oy = hf["y0w"] + sj.astype(jnp.float32) * hf["dyh"]
        else:
            hdat = (
                jnp.asarray(m.hfield_data, jnp.float32) * hf["zscale"] + hf["zw"]
            )
            patch = jax.vmap(
                jax.vmap(
                    lambda jj, ii: jax.lax.dynamic_slice(hdat, (jj, ii), (P, P))
                )
            )(j0, i0)  # (B, nfoot, P, P)
            ox = hf["x0w"] + i0.astype(jnp.float32) * hf["dxh"]
            oy = hf["y0w"] + j0.astype(jnp.float32) * hf["dyh"]
        porig = jnp.stack([ox, oy], axis=-1).reshape(B, nfoot * 2)
        lane_inputs += [
            lane(patch.reshape(B, nfoot * P, P)),
            lane(porig.astype(jnp.float32)),
        ]
    const_inputs = [jnp.asarray(c) for c in const_values]

    grid = (B // tile,)
    tail = (tile,) if SUB == 1 else (SUB, 128)

    def lane_spec(x):
        blk = x.shape[: -len(tail)] + tail
        nd = len(blk)
        if SUB == 1:
            idx = lambda i, nd=nd: (0,) * (nd - 1) + (i,)
        else:
            idx = lambda i, nd=nd: (0,) * (nd - 2) + (i, 0)
        return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    def const_spec(x):
        nd = x.ndim
        return pl.BlockSpec(
            x.shape, lambda i, nd=nd: (0,) * nd, memory_space=pltpu.VMEM
        )

    out_names = list(out_shapes.keys())
    host_tail = (B,) if SUB == 1 else (B // 128, 128)
    out_shape = [
        jax.ShapeDtypeStruct(out_shapes[k] + host_tail, jnp.float32)
        for k in out_names
    ]

    def out_spec(k):
        nd = len(out_shapes[k]) + len(tail)
        if SUB == 1:
            idx = lambda i, nd=nd: (0,) * (nd - 1) + (i,)
        else:
            idx = lambda i, nd=nd: (0,) * (nd - 2) + (i, 0)
        return pl.BlockSpec(
            out_shapes[k] + tail, idx, memory_space=pltpu.VMEM
        )

    out_specs = [out_spec(k) for k in out_names]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[lane_spec(x) for x in lane_inputs]
        + [const_spec(x) for x in const_inputs],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(),
        ),
        interpret=INTERPRET,
    )(*lane_inputs, *const_inputs)
    res = dict(zip(out_names, outs))

    def unlane(x):
        if SUB > 1:
            x = x.reshape(x.shape[:-2] + (B,))
        return jnp.moveaxis(x, -1, 0)

    return d.replace(
        qpos=unlane(res["qpos"]),
        qvel=unlane(res["qvel"]),
        ctrl=jnp.asarray(ctrl, jnp.float32),
        qacc=unlane(res["qacc"]),
        qacc_warmstart=unlane(res["qacc_warmstart"]),
        site_xpos=unlane(res["site_xpos"]),
        site_xmat=unlane(res["site_xmat"]),
        actuator_force=unlane(res["actuator_force"]),
        contact_dist=unlane(res["contact_dist"]),
        sensordata=unlane(res["sensordata"]),
    )
