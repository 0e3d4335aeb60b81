"""Breakdown: megakernel-only physics step vs full env step vs sub-pieces."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/odp_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp

N = 4096
# long scans: program dispatch through the axon relay costs ~5 ms, which
# dominates short scans (a 50-step scan reads ~100 us/step of pure floor)
STEPS = 500

from open_duck_playground_tpu.envs.joystick import Joystick
from open_duck_playground_tpu.physics import megakernel as MK

env = Joystick(task="flat_terrain_backlash")
m = env._model
rng = jax.random.PRNGKey(0)
keys = jax.random.split(rng, N)
state = jax.jit(jax.vmap(env.reset))(keys)
data0 = state.data
ctrl = jnp.tile(env._default_actuator[None], (N, 1))

def time_scan(fn, init, label):
    @jax.jit
    def run(init):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, init, None, length=STEPS)
        return out
    out = run(init); jax.block_until_ready(jax.tree.leaves(out)[0])
    out = run(init); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(init)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    sps = N * STEPS * reps / dt
    print(f"{label:40s} {sps:12,.0f} env-steps/s  ({1e6*dt/(STEPS*reps):8.1f} us/batch-step)")
    return sps

# 1. megakernel physics only (10 substeps), state->state — at the SAME
# tile the env path picks (the default tile=128 kwarg is the 1-D lane
# layout, ~3x slower; this leg silently measured that until round 5)
def phys(d):
    return MK.megakernel_step_batched(m, d, ctrl, env.n_substeps,
                                      tile=MK.pick_tile(N))
time_scan(phys, data0, "megakernel physics only (10 substeps)")

# 2. full env step with zero actions
act = jnp.zeros((N, env.action_size), jnp.float32)
def full(s):
    return jax.vmap(env.step)(s, act)
time_scan(full, state, "full env.step (vmapped)")

# 3. gait oracle alone
cmdv = state.info["command"]
def oracle(i):
    out = jax.vmap(lambda c, ii: env.gait.reference_frame(c[0], c[1], c[2], ii))(cmdv, i)
    return i + out[:, 0].astype(jnp.int32) * 0
time_scan(oracle, jnp.zeros((N,), jnp.int32), "gait oracle reference_frame")
