"""Sustained full-PPO training throughput (timed jit chunks, warmup excluded).

    python tools/bench_ppo_sustained.py [--task flat_terrain_backlash] \
        [--timesteps 50000000]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/odp_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="flat_terrain_backlash")
    ap.add_argument("--timesteps", type=int, default=50_000_000)
    ap.add_argument("--json_out", default=None,
                    help="also write the summary JSON record to this path")
    ap.add_argument("--bf16_matmuls", action="store_true",
                    help="bf16 MXU passes for the actor/critic matmuls "
                         "(config-gated extension; default off = parity)")
    args = ap.parse_args()

    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.envs.randomize import domain_randomize
    from open_duck_playground_tpu.train import ppo

    env = Joystick(task=args.task)
    times = []
    steps_seen = [0]
    t_last = [None]

    def progress(num_steps, metrics):
        now = time.perf_counter()
        if t_last[0] is not None and num_steps > steps_seen[0]:
            d_steps = num_steps - steps_seen[0]
            dt = now - t_last[0]
            times.append((d_steps, dt))
            print(f"chunk: {d_steps} steps in {dt:.2f}s -> "
                  f"{d_steps / dt:,.0f} steps/s", flush=True)
        steps_seen[0] = num_steps
        t_last[0] = now

    ppo.train(
        environment=env,
        num_timesteps=args.timesteps,
        num_evals=7,
        randomization_fn=domain_randomize,
        progress_fn=progress,
        max_env_steps_per_jit=8_192_000,
        bf16_matmuls=args.bf16_matmuls,
    )
    import jax

    n_chips = jax.device_count()
    tail = times[1:] if len(times) > 1 else times
    tot_s = sum(s for s, _ in tail)
    tot_t = sum(t for _, t in tail)
    # progress_fn's num_steps counts GLOBAL env steps across the whole device
    # mesh (ppo.train shards num_envs over it), so divide by the chip count to
    # report the same per-chip unit bench.py uses.
    rate = tot_s / tot_t / n_chips
    print(f"SUSTAINED: {rate:,.0f} env steps/s/chip over {n_chips} chip(s) "
          f"(excl. first timed chunk)")
    # machine-checkable artifact next to BENCH_r*.json (one JSON line)
    import json

    record = {
        "metric": "sustained_ppo_env_steps_per_sec_per_chip",
        "value": round(rate),
        "unit": "env_steps/s/chip",
        "n_chips": n_chips,
        "task": args.task,
        "timesteps": args.timesteps,
        "bf16_matmuls": bool(args.bf16_matmuls),
        # chunk steps are global (all-chip) counts; the first timed chunk is
        # warmup and excluded from "value".
        "chunks": [
            {"steps": s, "seconds": round(t, 3), "warmup": i == 0}
            for i, (s, t) in enumerate(times)
        ],
    }
    print(json.dumps(record), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
