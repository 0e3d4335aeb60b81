"""Multi-host (DCN) tests: two real OS processes, each owning 4 virtual CPU
devices, joined through `parallel.mesh.initialize_multihost`
(jax.distributed) into one 8-device global mesh — then (a) a jitted
computation whose output sharding forces a cross-process reduction, and
(b) the REAL product: `ppo.train`'s jitted training epoch (rollout + GAE +
minibatch SGD + normalizer, domain-randomized models) running with
data-sharded env state across the process boundary, asserted equivalent to
the same config on a single-process 8-device mesh.

This is the closest a single machine can get to the reference's multi-host
story (SURVEY §2.3 "multi-host / DCN"; the reference inherits it from brax's
pmap, runner.py:114-118): process boundaries are real, the coordination
service is real, and the gradient/normalizer all-reduces cross them. Only
the wire (TCP loopback instead of DCN) is simulated.
"""

import os
import socket
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax
import numpy as np

sys.path.insert(0, %(repo)r)
from open_duck_playground_tpu.parallel import mesh as M

M.initialize_multihost(
    coordinator_address="127.0.0.1:" + port,
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

mesh = M.make_mesh()  # all 8 global devices on the "data" axis
sh = M.data_sharding(mesh)

# each process contributes its own half of the global batch
gshape = (16, 4)
full = np.arange(gshape[0] * gshape[1], dtype=np.float32).reshape(gshape)
local = full[pid * 8 : (pid + 1) * 8]
garr = jax.make_array_from_process_local_data(sh, local, gshape)

# replicated output of a global reduction => cross-process all-reduce
out = jax.jit(lambda x: (2.0 * x).sum(), out_shardings=M.replicated(mesh))(garr)
np.testing.assert_allclose(float(out), 2.0 * full.sum())

# and a sharded elementwise map stays process-local (no gather): check the
# addressable shards of the result match this process's slice
y = jax.jit(lambda x: x + 1.0, out_shardings=sh)(garr)
for s in y.addressable_shards:
    np.testing.assert_allclose(np.asarray(s.data), full[s.index] + 1.0)

print("MULTIHOST_OK", pid, flush=True)
"""


def _cpu_env(n_local: int) -> dict:
    """Pure-CPU env with n_local virtual devices, axon/TPU triggers scrubbed
    (same recipe as __graft_entry__.dryrun_multichip)."""
    env = dict(os.environ)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_local}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    for k in list(env):
        if "AXON" in k or k.startswith("TPU_"):
            env.pop(k)
    return env


def test_two_process_multihost_mesh_and_collective():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = _WORKER % {"repo": REPO}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid), "2", port],
            env=_cpu_env(4),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out


# ---------------------------------------------------------------------------
# The real product across the process boundary: ppo.train's jitted epoch.
# Worker runs the full dryrun-sized training (2 training steps: rollout,
# fused normalizer moments, GAE, 2x2 minibatch SGD with cross-process grad
# all-reduce, domain-randomized per-env models) and dumps the final params +
# normalizer to an .npz. nproc==1 gives the single-process 8-device baseline.
_PPO_WORKER = r"""
import sys

pid, nproc, port, outpath = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

import jax
import numpy as np

sys.path.insert(0, %(repo)r)
from open_duck_playground_tpu.parallel import mesh as M

if nproc > 1:
    M.initialize_multihost(
        coordinator_address="127.0.0.1:" + port,
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

from open_duck_playground_tpu.envs.joystick import Joystick
from open_duck_playground_tpu.envs.randomize import domain_randomize
from open_duck_playground_tpu.train import ppo

env = Joystick(task="flat_terrain_backlash", use_megakernel=False)
_, (normalizer, params), metrics = ppo.train(
    env,
    num_timesteps=512,  # 2 training steps of 128 envs x unroll 2
    num_envs=128,
    episode_length=8,
    unroll_length=2,
    num_minibatches=2,
    batch_size=64,
    num_updates_per_batch=1,
    num_evals=1,
    seed=7,
    policy_hidden_layer_sizes=(32, 32),
    value_hidden_layer_sizes=(32, 32),
    randomization_fn=domain_randomize,
    mesh=M.make_mesh(),
)
if pid == 0:
    flat = {}
    for i, leaf in enumerate(jax.tree.leaves(params)):
        flat["p%%d" %% i] = np.asarray(jax.device_get(leaf))
    for k in ("mean", "std"):
        for j, leaf in enumerate(jax.tree.leaves(getattr(normalizer, k))):
            flat["%%s%%d" %% (k, j)] = np.asarray(jax.device_get(leaf))
    flat["total_loss"] = np.asarray(metrics["training/total_loss"])
    np.savez(outpath, **flat)
print("PPO_MULTIHOST_OK", pid, flush=True)
"""


def test_two_process_ppo_epoch_matches_single_process(tmp_path):
    import numpy as np

    script = _PPO_WORKER % {"repo": REPO}

    def run(nproc: int, tag: str):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        outpath = str(tmp_path / f"{tag}.npz")
        env = _cpu_env(8 // nproc)
        # correctness-only: dial CPU codegen down so the physics/train
        # graphs compile in seconds (same recipe as the driver dryrun);
        # applied to BOTH runs so the comparison is apples-to-apples
        env["XLA_FLAGS"] += " --xla_backend_optimization_level=0"
        env["JAX_DISABLE_MOST_OPTIMIZATIONS"] = "1"
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", script, str(pid), str(nproc), port,
                 outpath],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=REPO,
            )
            for pid in range(nproc)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=900)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"{tag} process {pid} failed:\n{out}"
            assert f"PPO_MULTIHOST_OK {pid}" in out, out
        return dict(np.load(outpath))

    single = run(1, "single")
    multi = run(2, "multi")
    assert set(single) == set(multi)
    # Same math, different collective grouping (intra-process reduce then
    # DCN vs one flat 8-way reduce) => float32 reduction-order noise only.
    for k in single:
        np.testing.assert_allclose(
            multi[k], single[k], rtol=2e-4, atol=2e-5, err_msg=k
        )
