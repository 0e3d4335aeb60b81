"""Deployment-path tests: closed-loop C-MuJoCo rollout with an exported
policy, native C++ runtime parity, gait viewer, obs plotting, action filter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.envs import duck_base
from open_duck_playground_tpu.export.onnx_export import export_policy
from open_duck_playground_tpu.export.onnx_runtime import OnnxPolicy
from open_duck_playground_tpu.train import networks as N, running_stats as RS


@pytest.fixture(scope="module")
def exported_policy(tmp_path_factory):
    """A randomly initialized (untrained) policy exported to ONNX."""
    obs_size, act = 101, 14
    net = N.PPONetworks(
        {"state": obs_size, "privileged_state": 212}, act, (64, 64), (64,)
    )
    params = net.init(jax.random.PRNGKey(0))
    stats = RS.init({"state": obs_size, "privileged_state": 212})
    path = tmp_path_factory.mktemp("onnx") / "policy.onnx"
    export_policy((stats, params), act, None, obs_size, str(path))
    return str(path)


def test_closed_loop_headless(exported_policy):
    from open_duck_playground_tpu.eval_tools.mujoco_runner import ClosedLoopRunner

    runner = ClosedLoopRunner(
        str(duck_base.XML_DIR / "scene_flat_terrain.xml"), exported_policy
    )
    # must start from the "home" keyframe, standing on the floor — not
    # qpos=0 with the base embedded in the plane (regression: missing
    # keyframe init made every closed-loop eval sink through the floor)
    assert float(runner.data.qpos[2]) > 0.1
    stats = runner.run_headless(1.0, commands=[0.05, 0, 0, 0, 0, 0, 0])
    # untrained policy: robot may fall but the loop must be healthy
    assert len(stats["saved_obs"]) == 50  # 50 Hz control for 1 s
    assert all(np.isfinite(o).all() for o in stats["saved_obs"])
    assert stats["saved_obs"][0].shape == (101,)
    # and it must stay above the floor plane for this 1 s window
    assert stats["mean_height"] > 0.05


def test_native_runtime_matches_numpy(exported_policy):
    from open_duck_playground_tpu.export.native_runtime import NativeOnnxPolicy

    pol_np = OnnxPolicy(exported_policy)
    pol_cc = NativeOnnxPolicy(exported_policy)
    rng = np.random.default_rng(0)
    for _ in range(5):
        obs = rng.uniform(-2, 2, 101).astype(np.float32)
        np.testing.assert_allclose(
            pol_cc.infer(obs), pol_np.infer(obs), atol=1e-5
        )


def test_ref_motion_viewer_headless():
    from open_duck_playground_tpu.eval_tools.ref_motion_viewer import RefMotionViewer

    v = RefMotionViewer()
    qs = v.run_headless(frames=27)
    assert qs.shape == (27, 14)
    assert np.isfinite(qs).all()
    # legs actually move over a gait period
    assert np.ptp(qs[:, 2]) > 0.01


def test_plot_obs(tmp_path, exported_policy):
    import pickle

    from open_duck_playground_tpu.eval_tools import plot_obs

    obs = np.random.default_rng(0).normal(size=(50, 101))
    p = tmp_path / "obs.pkl"
    with open(p, "wb") as f:
        pickle.dump([o for o in obs], f)
    out = tmp_path / "obs.png"
    plot_obs.plot_sections([str(p)], str(out))
    assert out.exists() and out.stat().st_size > 1000

    out2 = tmp_path / "per_joint.png"
    plot_obs.plot_per_joint([str(p)], str(out2))
    assert out2.exists() and out2.stat().st_size > 1000

    out3 = tmp_path / "dims.png"
    plot_obs.plot_dims([str(p)], [0, 13, 41], str(out3))
    assert out3.exists() and out3.stat().st_size > 1000
    assert len(plot_obs.dim_names()) == 101


def test_low_pass_filter():
    from open_duck_playground_tpu.utils.filters import LowPassActionFilter

    f = LowPassActionFilter(50.0, cutoff_frequency=37.5)
    f.push(np.zeros(3))
    for _ in range(100):
        f.push(np.ones(3))
    np.testing.assert_allclose(f.get_filtered_action(), np.ones(3), atol=1e-3)


def test_numpy_reward_mirrors_match_jax():
    """eval_tools.rewards_numpy must agree with envs.rewards / envs.imitation
    term-for-term (reference rewards_numpy.py / custom_rewards_numpy.py are
    literal twins of the jax versions; SURVEY §2.1 #19)."""
    import jax.numpy as jnp

    from open_duck_playground_tpu.envs import imitation, rewards as RJ
    from open_duck_playground_tpu.eval_tools import rewards_numpy as RN

    rng = np.random.default_rng(42)
    f = lambda *shape: rng.normal(size=shape).astype(np.float32)

    for _ in range(3):
        cmd, vel3, pose14, vel14 = f(7), f(3), f(14), f(14)
        cases = [
            ("tracking_lin_vel", (cmd, vel3, 0.2)),
            ("tracking_ang_vel", (cmd, vel3, 0.2)),
            ("torques", (f(14),)),
            ("action_rate", (f(14), f(14))),
            ("alive", ()),
            ("orientation", (f(3),)),
            ("stand_still", (cmd * 0.001, pose14, vel14, f(14), True)),
            ("stand_still", (cmd, pose14, vel14, f(14), False)),
            ("head_pos", (pose14, vel14, cmd)),
            ("head_pos", (pose14, vel14, cmd, True)),
            ("forward_progress", (cmd, vel3)),
            ("yaw_rate_l1", (cmd, vel3)),
            ("lin_vel_l1", (cmd, vel3)),
            ("lin_vel_z", (vel3,)),
            ("ang_vel_xy", (vel3,)),
            ("base_height", (1.3, 1.0)),
            ("base_y_swing", (0.1, 1.5, 0.05, 0.3, 0.2)),
            ("energy", (f(20), f(20))),
            ("joint_pos_limits", (pose14, f(14) - 3, f(14) + 3)),
            ("feet_slip", (f(2) > 0, f(2))),
            ("feet_height", (np.abs(f(2)), f(2) > 0, 0.1)),
            ("feet_air_time", (np.abs(f(2)), f(2) > 0, cmd)),
            ("feet_phase", (f(2, 3), f(2))),
            ("feet_clearance", (f(2, 3), f(2, 3), 0.08)),
            ("joint_deviation", (pose14, np.arange(5), f(14), 1.0)),
            ("pose", (pose14, f(14), np.abs(f(14)))),
            ("termination", (1.0,)),
        ]
        for name, args in cases:
            a = np.asarray(getattr(RJ, name)(*[jnp.asarray(x) if isinstance(x, np.ndarray) else x for x in args]))
            b = np.asarray(getattr(RN, name)(*args))
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6, err_msg=name)

    base_qvel, jq, jv = f(6), f(14), f(14)
    contacts = (f(2) > 0).astype(np.float32)
    ref_frame, cmd = f(40), f(7)
    a = np.asarray(imitation.imitation_reward(
        jnp.asarray(base_qvel), jnp.asarray(jq), jnp.asarray(jv),
        jnp.asarray(contacts), jnp.asarray(ref_frame), jnp.asarray(cmd)))
    b = np.asarray(RN.imitation_reward(base_qvel, jq, jv, contacts, ref_frame, cmd))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    # no-head (10-joint) path with a retargeted reference (gait-library home
    # pose offset, envs/imitation.py:GAIT_HOME_LEGS)
    jq10, jv10, off10 = f(10), f(10), f(10) * 0.05
    a = np.asarray(imitation.imitation_reward(
        jnp.asarray(base_qvel), jnp.asarray(jq10), jnp.asarray(jv10),
        jnp.asarray(contacts), jnp.asarray(ref_frame), jnp.asarray(cmd),
        ref_jpos_offset=jnp.asarray(off10)))
    b = np.asarray(RN.imitation_reward(
        base_qvel, jq10, jv10, contacts, ref_frame, cmd,
        ref_jpos_offset=off10))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_passive_stand_all_scenes():
    """With the home keyframe + position servos and NO policy, the duck must
    stand in C-MuJoCo on every scene for 2 simulated seconds (regression:
    hfield spawns used to start the feet inside the terrain and tip the
    robot over; this also pins the keyframe/scene assets as self-consistent)."""
    import mujoco

    from open_duck_playground_tpu.models.loader import compile_mjcf

    for scene in [
        "scene_flat_terrain.xml",
        "scene_flat_terrain_backlash.xml",
        "scene_rough_terrain.xml",
        "scene_rough_terrain_backlash.xml",
    ]:
        mj = compile_mjcf(str(duck_base.XML_DIR / scene), timestep=0.002)
        d = mujoco.MjData(mj)
        key = mj.keyframe("home")
        d.qpos[:] = key.qpos
        if mj.nhfield > 0:
            d.qpos[2] += float(mj.hfield_size[0][2]) + 0.002
        d.ctrl[:] = key.ctrl
        for _ in range(1000):
            mujoco.mj_step(mj, d)
        assert d.qpos[2] > 0.12, (scene, float(d.qpos[2]))
