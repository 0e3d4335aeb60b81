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
    stats = runner.run_headless(1.0, commands=[0.05, 0, 0, 0, 0, 0, 0])
    # untrained policy: robot may fall but the loop must be healthy
    assert len(stats["saved_obs"]) == 50  # 50 Hz control for 1 s
    assert all(np.isfinite(o).all() for o in stats["saved_obs"])
    assert stats["saved_obs"][0].shape == (101,)


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
    plot_obs.plot([str(p)], str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_low_pass_filter():
    from open_duck_playground_tpu.utils.filters import LowPassActionFilter

    f = LowPassActionFilter(50.0, cutoff_frequency=37.5)
    f.push(np.zeros(3))
    for _ in range(100):
        f.push(np.ones(3))
    np.testing.assert_allclose(f.get_filtered_action(), np.ones(3), atol=1e-3)
