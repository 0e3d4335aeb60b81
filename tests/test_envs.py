"""Env-layer tests: obs layout parity, gait oracle ground truth, domain
randomization, wrapper semantics."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_duck_playground_tpu.envs import duck_base
from open_duck_playground_tpu.envs.gait_oracle import GaitOracle
from open_duck_playground_tpu.envs.joystick import Joystick
from open_duck_playground_tpu.envs.randomize import domain_randomize
from open_duck_playground_tpu.envs.standing import Standing
from open_duck_playground_tpu.envs.wrappers import TrainingEnv


@pytest.fixture(scope="module")
def joystick():
    return Joystick(task="flat_terrain_backlash")


def test_joystick_obs_sizes_match_reference(joystick):
    # reference sizes: state=101, privileged_state=212 (SURVEY §3.4)
    st = jax.jit(joystick.reset)(jax.random.PRNGKey(0))
    assert st.obs["state"].shape == (101,)
    assert st.obs["privileged_state"].shape == (212,)


def test_joystick_step_semantics(joystick):
    env = joystick
    step = jax.jit(env.step)
    st = jax.jit(env.reset)(jax.random.PRNGKey(1))
    action = jnp.zeros(env.action_size)
    any_done = False
    for _ in range(5):
        st = step(st, action)
        any_done = any_done or bool(st.done)
    assert np.isfinite(float(st.reward))
    assert float(st.done) in (0.0, 1.0)
    # step counter increments unless a fall terminated the episode (which
    # resets it to 0, reference joystick.py:462-466)
    assert any_done or int(st.info["step"]) == 5
    # imitation phase on the unit circle
    ph = np.asarray(st.info["imitation_phase"])
    np.testing.assert_allclose(np.linalg.norm(ph), 1.0, atol=1e-5)
    # motor target slew limit respected
    lim = env._config.max_motor_velocity * env.dt + 1e-6
    big = jnp.ones(env.action_size)
    st2 = step(st, big)
    delta = np.abs(
        np.asarray(st2.info["motor_targets"]) - np.asarray(st.info["motor_targets"])
    )
    assert (delta <= lim).all()


def test_standing_obs_sizes():
    env = Standing(task="flat_terrain")
    st = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert st.obs["state"].shape == (85,)
    assert st.obs["privileged_state"].shape == (153,)
    # standing never commands locomotion
    cmds = [np.asarray(env.sample_command(jax.random.PRNGKey(i))) for i in range(8)]
    assert all(abs(c[:3]).max() == 0 for c in cmds)


def test_gait_oracle_matches_polyval():
    oracle = GaitOracle(str(duck_base.GAIT_PKL), dtype=jnp.float64)
    with open(duck_base.GAIT_PKL, "rb") as f:
        raw = pickle.load(f)
    key = sorted(raw.keys())[17]
    dx, dy, dth = (float(v) for v in key.split("_"))
    i = 13
    got = np.asarray(oracle.reference_frame(dx, dy, dth, i))
    t = (i % oracle.nb_steps_in_period) / oracle.nb_steps_in_period
    want = np.array(
        [
            np.polyval(np.flip(np.asarray(raw[key]["coefficients"][f"dim_{d}"])), t)
            for d in range(40)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)
    assert oracle.nb_steps_in_period == 27  # 0.54 s @ 50 fps


def test_domain_randomize(joystick):
    model = joystick.model
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    batched, axes = domain_randomize(model, keys)
    assert batched.body_mass.shape == (4, model.spec.nbody)
    assert batched.qpos0.shape == (4, model.spec.nq)
    # randomized fields vary per env; floor friction targets the REAL floor
    fl = np.asarray(batched.geom_friction)[:, model.spec.floor_geom_id, 0]
    assert len(np.unique(fl)) == 4
    assert ((fl >= 0.5) & (fl <= 1.0)).all()
    # backlash dofs excluded from frictionloss scaling (they stay 0)
    flr = np.asarray(batched.dof_frictionloss)
    zero_dofs = [
        d for d in range(model.spec.nv) if d not in model.spec.friction_dofs
    ]
    assert (flr[:, zero_dofs] == 0).all()
    # kp randomization keeps gain/bias consistency: biasprm[:,1] == -gainprm[:,0]
    np.testing.assert_allclose(
        np.asarray(batched.actuator_biasprm)[:, :, 1],
        -np.asarray(batched.actuator_gainprm)[:, :, 0],
        rtol=1e-6,
    )
    # unrandomized fields stay unbatched
    assert batched.jnt_range.ndim == 2


def test_domain_randomize_masses_stay_positive(joystick):
    """Regression: the torso mass offset must hit the body that HAS the
    torso mass (trunk_assembly), never the massless freejoint stub (body 1).
    Upstream adds U(-0.1,0.1) to body 1 whose nominal mass is 0, giving
    negative mass on half the draws — which ill-conditions the mass matrix
    and NaNs the f32 Newton solver (discovered on the no-head robot, where
    the blow-up poisoned training via NaN reset obs)."""
    model = joystick.model
    nominal = np.asarray(model.body_mass)
    keys = jax.random.split(jax.random.PRNGKey(7), 512)
    batched, _ = domain_randomize(model, keys)
    masses = np.asarray(batched.body_mass)
    assert (masses >= 0).all()
    # massless bodies stay massless (multiplicative-only DR)
    assert (masses[:, nominal == 0] == 0).all()
    # the trunk got the additive offset: it varies beyond the 0.9-1.1 scaling
    trunk = int(np.argmax(nominal > 1e-9))
    lo, hi = masses[:, trunk].min(), masses[:, trunk].max()
    assert lo >= 0.05 * nominal[trunk] - 1e-9
    assert hi > nominal[trunk] * 1.1  # multiplicative cap alone can't reach this
    assert lo < nominal[trunk] * 0.9  # nor can it reach this low


def test_training_env_truncation_and_autoreset(joystick):
    wrapped = TrainingEnv(joystick, episode_length=3)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    st = jax.jit(wrapped.reset)(keys)
    step = jax.jit(wrapped.step)
    a = jnp.zeros((2, joystick.action_size))
    for i in range(3):
        st = step(st, a)
    assert (np.asarray(st.done) == 1).all()
    assert (np.asarray(st.info["truncation"]) == 1).all()
    qpos_done = np.asarray(st.data.qpos)
    st = step(st, a)  # autoreset to cached first state, then one step
    assert (np.asarray(st.info["steps"]) == 1).all()
    assert not np.allclose(np.asarray(st.data.qpos), qpos_done)


def test_training_env_quarantines_nonfinite(joystick):
    """A physics blow-up (NaN qpos/obs) in one env must be quarantined by the
    wrapper — replaced with the cached reset state, done=1, reward zeroed —
    so it can never reach the rollout buffer and poison the normalizer."""
    wrapped = TrainingEnv(joystick, episode_length=100)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    st = jax.jit(wrapped.reset)(keys)
    step = jax.jit(wrapped.step)
    a = jnp.zeros((2, joystick.action_size))
    st = step(st, a)

    # inject a blow-up into env 0: NaN qpos + inf obs
    bad_qpos = st.data.qpos.at[0].set(jnp.nan)
    bad_obs = {
        k: v.at[0].set(jnp.inf) if k == "state" else v for k, v in st.obs.items()
    }
    st_bad = st.replace(data=st.data.replace(qpos=bad_qpos), obs=bad_obs)

    # stepping from the corrupted state: the *output* must be fully finite
    out = step(st_bad, a)
    for k, v in out.obs.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert np.isfinite(np.asarray(out.data.qpos)).all()
    assert np.isfinite(np.asarray(out.reward)).all()
    assert float(out.done[0]) == 1.0  # quarantined env is terminated
    assert float(out.reward[0]) == 0.0  # and its reward zeroed
    # env 1 unaffected
    assert float(out.done[1]) in (0.0, 1.0)


def test_rsi_reset_starts_mid_gait():
    """rsi_prob>0 resets pose the legs at a random gait phase with matching
    joint/base velocities and a phase-consistent obs (beyond reference:
    DeepMimic-style reference state initialization)."""
    env = Joystick(
        task="flat_terrain_no_head",
        config_overrides={"rsi_prob": 1.0, "reset_joint_scale_range": [1.0, 1.0]},
    )
    reset = jax.jit(env.reset)
    phases, jpos_errs = [], []
    for seed in range(8):
        st = reset(jax.random.PRNGKey(seed))
        i0 = int(st.info["imitation_i"])
        phases.append(i0)
        # legs must sit exactly on the retargeted reference frame
        ref = st.info["current_reference_motion"]
        ref_legs = jnp.concatenate([ref[0:5], ref[11:16]])
        if env._imitation_ref_offset is not None:
            ref_legs = ref_legs + env._imitation_ref_offset
        jpos = env.get_actuator_joints_qpos(st.data.qpos)
        jpos_errs.append(float(jnp.abs(jpos - ref_legs).max()))
        # phase obs must encode i0, not the zero vector
        ph = i0 / env.gait.nb_steps_in_period * 2 * np.pi
        np.testing.assert_allclose(
            np.asarray(st.info["imitation_phase"]),
            [np.cos(ph), np.sin(ph)],
            atol=1e-5,
        )
    assert len(set(phases)) > 2, f"phases not randomized: {phases}"
    assert max(jpos_errs) < 1e-5, f"legs not posed on the reference: {jpos_errs}"


def test_rsi_off_reset_unchanged():
    """rsi_prob=0 (the default) must reproduce the reference-parity reset:
    phase 0, zero phase obs, home-scaled joints."""
    env = Joystick(task="flat_terrain_no_head")
    st = jax.jit(env.reset)(jax.random.PRNGKey(3))
    assert int(st.info["imitation_i"]) == 0
    np.testing.assert_array_equal(np.asarray(st.info["imitation_phase"]), [0.0, 0.0])
