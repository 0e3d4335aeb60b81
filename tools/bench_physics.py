"""Physics-only megakernel throughput at a given env count / task / lane tile.

Complements bench.py (which measures the full rollout pipeline): this times
just `megakernel_step_batched` in a scan, the number that kernel-interior
optimizations move directly.

    python tools/bench_physics.py [--task flat_terrain_backlash] \
        [--envs 4096] [--steps 50] [--tile 128]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="flat_terrain_backlash")
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--tile", type=int, default=None)
    args = ap.parse_args()

    import open_duck_playground_tpu.physics.megakernel as MK

    tile = args.tile or MK.LANE_TILE
    from open_duck_playground_tpu.envs.joystick import Joystick

    env = Joystick(task=args.task)
    m = env._model
    # pre-build the kernel for this tile: the lazy build inside jit would
    # see a traced model (scan closes over it) and fail
    MK.prepare(m, env.n_substeps, tile)
    keys = jax.random.split(jax.random.PRNGKey(0), args.envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    ctrl = jnp.tile(env._default_actuator[None], (args.envs, 1))

    @jax.jit
    def run(d):
        def body(c, _):
            return MK.megakernel_step_batched(m, c, ctrl, env.n_substeps, tile), ()

        out, _ = jax.lax.scan(body, d, None, length=args.steps)
        return out

    out = run(state.data)
    jax.block_until_ready(out.qpos)
    out = run(state.data)
    jax.block_until_ready(out.qpos)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(state.data)
    jax.block_until_ready(out.qpos)
    dt = time.perf_counter() - t0
    rate = args.envs * args.steps * reps / dt
    print(f"task={args.task} envs={args.envs} tile={tile}: "
          f"{rate:,.0f} env-steps/s (physics only)")


if __name__ == "__main__":
    main()
