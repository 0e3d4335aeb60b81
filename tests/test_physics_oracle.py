"""Stage-by-stage parity of the TPU-native engine vs the C-MuJoCo oracle on
the real duck model (the reference has no tests; oracle strategy per SURVEY §4).

Precision tests run the f64 model *eagerly* (XLA:CPU compiles f64 graphs very
slowly, and eager op-by-op execution with the persistent compilation cache is
both exact and fast). Compiled-path tests use f32 + jit.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from open_duck_playground_tpu.models.loader import load_model
from open_duck_playground_tpu.physics import (
    constraint as CN,
    forward as F,
    kinematics as K,
    smooth as S,
    solver as SV,
)
from tests.oracle import oracle_contacts, randomized_state


@pytest.fixture(scope="module")
def setup(xml_dir):
    model, mj = load_model(
        xml_dir / "scene_flat_terrain_backlash.xml", timestep=0.002, dtype=jnp.float64
    )
    return model, mj, mujoco.MjData(mj)


@pytest.fixture(scope="module")
def setup32(xml_dir):
    model, mj = load_model(
        xml_dir / "scene_flat_terrain_backlash.xml", timestep=0.002, dtype=jnp.float32
    )
    return model, mj, mujoco.MjData(mj)


def _stages(model, d):
    qpos, qvel = jnp.asarray(d.qpos), jnp.asarray(d.qvel)
    xpos, xquat, xanchor, xaxis, xipos, ximat, sxp, sxm = K.kinematics(model, qpos)
    com, cdof = K.com_cdof(model, xquat, xanchor, xaxis, xipos)
    cvel, cdof_dot = K.com_vel(model, cdof, qvel)
    return qpos, qvel, xpos, xquat, xipos, ximat, sxp, sxm, com, cdof, cvel, cdof_dot


def test_kinematics_and_velocities(setup):
    model, mj, d = setup
    rng = np.random.default_rng(0)
    for _ in range(2):
        randomized_state(mj, d, rng, z_offset=0.3)
        mujoco.mj_forward(mj, d)
        (qpos, qvel, xpos, xquat, xipos, ximat, sxp, sxm, com, cdof, cvel,
         cdof_dot) = _stages(model, d)
        np.testing.assert_allclose(np.asarray(xpos), d.xpos, atol=1e-9)
        np.testing.assert_allclose(np.asarray(sxp), d.site_xpos, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(sxm).reshape(-1, 9), d.site_xmat, atol=1e-9
        )
        np.testing.assert_allclose(np.asarray(com), d.subtree_com[1], atol=1e-10)
        np.testing.assert_allclose(np.asarray(cdof), d.cdof, atol=1e-9)
        np.testing.assert_allclose(np.asarray(cvel), d.cvel, atol=1e-9)
        np.testing.assert_allclose(np.asarray(cdof_dot), d.cdof_dot, atol=1e-9)
        np.testing.assert_allclose(np.asarray(xipos), d.xipos, atol=1e-9)


def test_mass_matrix_bias_actuation(setup):
    model, mj, d = setup
    rng = np.random.default_rng(1)
    for _ in range(2):
        randomized_state(mj, d, rng, z_offset=0.3)
        mujoco.mj_forward(mj, d)
        (qpos, qvel, xpos, xquat, xipos, ximat, sxp, sxm, com, cdof, cvel,
         cdof_dot) = _stages(model, d)
        qm = S.mass_matrix(model, cdof, xipos, ximat, com)
        fullM = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, fullM)
        np.testing.assert_allclose(np.asarray(qm), fullM, atol=1e-10)
        bias = S.rne_bias(model, cdof, cdof_dot, cvel, qvel, xipos, ximat, com)
        np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(S.passive_force(model, qvel)), d.qfrc_passive, atol=1e-12
        )
        force, qfrc_act = S.actuation(model, qpos, qvel, jnp.asarray(d.ctrl))
        np.testing.assert_allclose(np.asarray(force), d.actuator_force, atol=1e-12)
        np.testing.assert_allclose(np.asarray(qfrc_act), d.qfrc_actuator, atol=1e-12)


def test_forward_airborne_exact(setup):
    model, mj, d = setup
    rng = np.random.default_rng(2)
    for _ in range(2):
        randomized_state(mj, d, rng, z_offset=0.5)
        mujoco.mj_forward(mj, d)
        assert d.ncon == 0
        dd = F.make_data(model).replace(
            qpos=jnp.asarray(d.qpos),
            qvel=jnp.asarray(d.qvel),
            ctrl=jnp.asarray(d.ctrl),
        )
        out = F.forward(model, dd)
        scale = max(1.0, np.abs(d.qacc).max())
        np.testing.assert_allclose(
            np.asarray(out.qacc) / scale, d.qacc / scale, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(out.sensordata), d.sensordata, atol=1e-10
        )


def test_solver_parity_with_oracle_contacts(setup):
    """Identical contact sets in -> qacc must match C-MuJoCo's Newton solver,
    including pyramidal friction, joint limits and dof frictionloss."""
    model, mj, d = setup
    rng = np.random.default_rng(3)
    ncon_seen = 0
    for zoff in (0.0, -0.004, -0.002, -0.006):
        randomized_state(mj, d, rng, z_offset=zoff)
        mujoco.mj_forward(mj, d)
        ncon_seen += d.ncon
        (qpos, qvel, xpos, xquat, xipos, ximat, sxp, sxm, com, cdof, cvel,
         cdof_dot) = _stages(model, d)
        qm = S.mass_matrix(model, cdof, xipos, ximat, com)
        contact = oracle_contacts(mj, d)
        efc = CN.make_constraints(model, qpos, qvel, cdof, com, contact)
        bias = S.rne_bias(model, cdof, cdof_dot, cvel, qvel, xipos, ximat, com)
        qfrc_smooth = (
            S.passive_force(model, qvel)
            - bias
            + S.actuation(model, qpos, qvel, jnp.asarray(d.ctrl))[1]
        )
        qacc_smooth = jnp.asarray(
            np.linalg.solve(np.asarray(qm), np.asarray(qfrc_smooth))
        )
        res = SV.solve(model, qm, qacc_smooth, jnp.zeros(mj.nv), efc)
        scale = max(1.0, np.abs(d.qacc).max())
        np.testing.assert_allclose(
            np.asarray(res.qacc) / scale, d.qacc / scale, atol=1e-10
        )
    assert ncon_seen > 0  # contact-rich states were exercised


def test_step_airborne_trajectory(setup):
    """25 substeps of free flight with servo control must track C-MuJoCo."""
    model, mj, d = setup
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    d.qpos[2] = 1.0
    d.qvel[:6] = [0.3, -0.2, 0.5, 1.0, -0.5, 0.7]
    ctrl = np.asarray(mj.key_ctrl[0]) * 0.8
    d.ctrl[:] = ctrl
    dd = F.init(model, jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.asarray(ctrl))
    for _ in range(25):
        dd = F.substep(model, dd)
        mujoco.mj_step(mj, d)
    np.testing.assert_allclose(np.asarray(dd.qpos), d.qpos, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dd.qvel), d.qvel, atol=1e-8)


def test_grounded_stable_f32(setup32):
    """1 s of standing on the floor, compiled f32 path: no NaNs, no
    fall-through, base height in a physical band, and close to where
    C-MuJoCo settles (contact-point policy differs, so not bitwise)."""
    model, mj, d = setup32
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    ctrl = jnp.asarray(mj.key_ctrl[0], jnp.float32)
    dd = F.init(model, jnp.asarray(mj.key_qpos[0], jnp.float32),
                jnp.zeros(mj.nv, jnp.float32), ctrl)
    step = jax.jit(F.step, static_argnums=3)
    for _ in range(10):
        dd = step(model, dd, ctrl, 50)
    qpos = np.asarray(dd.qpos)
    assert np.isfinite(qpos).all()
    assert 0.10 < qpos[2] < 0.25
    for _ in range(500):
        mujoco.mj_step(mj, d)
    assert abs(qpos[2] - d.qpos[2]) < 0.02


@pytest.mark.parametrize(
    "scene",
    [
        "scene_flat_terrain.xml",
        "scene_rough_terrain.xml",
        "scene_rough_terrain_backlash.xml",
        "scene_flat_terrain_no_head.xml",
    ],
)
def test_other_scenes_forward(xml_dir, scene):
    model, mj = load_model(xml_dir / scene, timestep=0.002, dtype=jnp.float32)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    dd = jax.jit(F.init)(
        model,
        jnp.asarray(d.qpos, jnp.float32),
        jnp.zeros(mj.nv, jnp.float32),
        jnp.asarray(mj.key_ctrl[0], jnp.float32),
    )
    assert np.isfinite(np.asarray(dd.qacc)).all()
    assert np.isfinite(np.asarray(dd.sensordata)).all()
