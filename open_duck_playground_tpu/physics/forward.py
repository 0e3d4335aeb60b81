"""The forward-dynamics pipeline, init and step entry points.

`step(model, data, ctrl, n_substeps)` is the API the env layer drives
(replacing `mjx_env.step`, reference joystick.py:420); `init(model, qpos,
qvel, ctrl)` replaces `mjx_env.init` (joystick.py:258). Semantics match
MuJoCo's mj_step: each substep = forward() then semi-implicit Euler
integration, so derived quantities (sensordata, contacts, site poses) in the
returned Data describe the *start* of the last substep — exactly what the
reference envs observe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.physics import collision as C
from open_duck_playground_tpu.physics import constraint as CN
from open_duck_playground_tpu.physics import kinematics as K
from open_duck_playground_tpu.physics import linalg as LA
from open_duck_playground_tpu.physics import maths
from open_duck_playground_tpu.physics import sensors as SN
from open_duck_playground_tpu.physics import smooth as S
from open_duck_playground_tpu.physics import solver as SV
from open_duck_playground_tpu.physics.types import FREE, HINGE, Data, Model


def make_data(m: Model, dtype=None) -> Data:
    s = m.spec
    dtype = dtype or m.qpos0.dtype
    return Data(
        qpos=m.qpos0.astype(dtype),
        qvel=jnp.zeros(s.nv, dtype),
        ctrl=jnp.zeros(s.nu, dtype),
        qacc=jnp.zeros(s.nv, dtype),
        qacc_warmstart=jnp.zeros(s.nv, dtype),
        site_xpos=jnp.zeros((s.nsite, 3), dtype),
        site_xmat=jnp.zeros((s.nsite, 3, 3), dtype),
        actuator_force=jnp.zeros(s.nu, dtype),
        contact_dist=jnp.zeros(s.ncon_max, dtype),
        sensordata=jnp.zeros(s.nsensordata, dtype),
    )


def forward(m: Model, d: Data) -> Data:
    """One full forward pass: position/velocity/actuation stages, constraint
    solve, sensors. Returns Data with all derived fields fresh."""
    qpos, qvel, ctrl = d.qpos, d.qvel, d.ctrl

    # position stage
    (xpos, xquat, xanchor, xaxis, xipos, ximat, site_xpos, site_xmat) = (
        K.kinematics(m, qpos)
    )
    com, cdof = K.com_cdof(m, xquat, xanchor, xaxis, xipos)
    qm = S.mass_matrix(m, cdof, xipos, ximat, com)
    contact = C.collide(m, xpos, xquat)

    # velocity stage
    cvel, cdof_dot = K.com_vel(m, cdof, qvel)
    qfrc_bias = S.rne_bias(m, cdof, cdof_dot, cvel, qvel, xipos, ximat, com)
    qfrc_passive = S.passive_force(m, qvel)

    # actuation
    actuator_force, qfrc_actuator = S.actuation(m, qpos, qvel, ctrl)

    # smooth acceleration
    qfrc_smooth = qfrc_passive - qfrc_bias + qfrc_actuator
    qacc_smooth = LA.cholesky_solve(qm, qfrc_smooth)

    # constraints
    efc = CN.make_constraints(m, qpos, qvel, cdof, com, contact)
    res = SV.solve(m, qm, qacc_smooth, d.qacc_warmstart, efc)

    # acceleration-stage sensors
    cacc = SN.body_cacc(m, cdof, cdof_dot, qvel, res.qacc)
    sensordata = SN.sensor_data(m, xquat, site_xpos, site_xmat, com, cvel, cacc)

    return d.replace(
        qacc=res.qacc,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
        actuator_force=actuator_force,
        contact_dist=contact.dist,
        sensordata=sensordata,
    )


def _integrate(m: Model, d: Data) -> Data:
    """Semi-implicit Euler (eulerdamp disabled in the duck model): update
    qvel with qacc, then integrate qpos with the new qvel."""
    import numpy as np

    from open_duck_playground_tpu.physics import structure

    s = m.spec
    dt = s.timestep
    qvel = d.qvel + dt * d.qacc
    qpos = d.qpos
    hj = structure.hinge_joints(s)
    hq = np.asarray([s.jnt_qposadr[j] for j in hj])
    hd = np.asarray([s.jnt_dofadr[j] for j in hj])
    qpos = qpos.at[hq].add(dt * qvel[hd])
    fj = structure.free_joint(s)
    if fj >= 0:
        qadr, dadr = s.jnt_qposadr[fj], s.jnt_dofadr[fj]
        qpos = qpos.at[qadr : qadr + 3].add(dt * qvel[dadr : dadr + 3])
        quat = maths.quat_integrate(
            qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt
        )
        qpos = qpos.at[qadr + 3 : qadr + 7].set(quat)
    return d.replace(qpos=qpos, qvel=qvel, qacc_warmstart=d.qacc)


def substep(m: Model, d: Data) -> Data:
    return _integrate(m, forward(m, d))


def step(
    m: Model,
    d: Data,
    ctrl: jnp.ndarray,
    n_substeps: int,
    use_megakernel: bool = False,
) -> Data:
    """n_substeps physics substeps under a fixed ctrl (the control-rate ->
    sim-rate decimation, reference joystick.py:51-52: 0.02/0.002 = 10).

    With use_megakernel=True the whole loop runs as one Pallas TPU kernel
    when this call is vmapped over an env batch (physics/megakernel.py;
    plane and heightfield floors); unbatched calls and non-tile-aligned
    batches fall back to this jnp path.
    """
    if use_megakernel:
        return _megakernel_cv(n_substeps)(m, d, ctrl)
    d = d.replace(ctrl=ctrl)
    d = jax.lax.fori_loop(
        0, n_substeps, lambda _, dd: substep(m, dd), d, unroll=False
    )
    return d


@functools.lru_cache(maxsize=8)
def _megakernel_cv(n_substeps: int):
    from jax import custom_batching

    from open_duck_playground_tpu.physics import megakernel as MK

    @custom_batching.custom_vmap
    def f(m, d, ctrl):
        return step(m, d, ctrl, n_substeps, use_megakernel=False)

    @f.def_vmap
    def rule(axis_size, in_batched, m, d, ctrl):
        m_b, d_b, ctrl_b = in_batched
        tile = MK.pick_tile(axis_size)
        if tile is not None:
            out = MK.megakernel_step_batched(m, d, ctrl, n_substeps, tile)
        else:  # non-tile-aligned batch: vmapped jnp fallback
            m_axes = jax.tree.map(lambda b: 0 if b else None, m_b)
            out = jax.vmap(
                lambda mm, dd, cc: step(mm, dd, cc, n_substeps, False),
                in_axes=(m_axes, 0, 0),
            )(m, d, ctrl)
        out_batched = jax.tree.map(lambda _: True, out)
        return out, out_batched

    return f


def init(m: Model, qpos: jnp.ndarray, qvel: jnp.ndarray, ctrl: jnp.ndarray) -> Data:
    """Fresh Data + one forward pass (mjx_env.init equivalent)."""
    d = make_data(m, dtype=qpos.dtype)
    d = d.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
    return forward(m, d)
