"""Benchmark: env-step throughput of the flagship workload on the local
accelerator.

North-star metric (BASELINE.md): env steps/sec/chip at 4096 envs on the
joystick flat_terrain_backlash task (full pipeline: 10 physics substeps +
collision + Newton solve + obs/reward assembly per env step), with per-env
domain-randomized models, and the policy network in the loop (obs
normalization + actor MLP forward + tanh-Normal sampling at the pinned
config sizes) — per-step compute identical to the training rollout; only
GAE/SGD (which run per-epoch, not per-step) are excluded. Baseline target:
2,000,000 env steps/s on a v5p-8 => 250,000 steps/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/odp_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
# 500-step scans: dispatching a jitted call whose args/results carry the
# ~100-leaf env State pytree costs ~5 ms of per-call host/relay overhead
# regardless of scan length (measured round 5; a small-carry scan pays
# ~0). At the old STEPS=50 that floor inflated the per-step reading ~7%;
# 500 steps amortizes it below 1% so the metric reads the device rate.
STEPS = int(os.environ.get("BENCH_STEPS", 500))
BASELINE_PER_CHIP = 250_000.0


def main():
    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.envs.randomize import domain_randomize
    from open_duck_playground_tpu.envs.wrappers import TrainingEnv
    from open_duck_playground_tpu.train import (
        config as TC,
        networks as N,
        running_stats as RS,
    )

    env = Joystick(task="flat_terrain_backlash")
    rng = jax.random.PRNGKey(0)
    wrapped = TrainingEnv(
        env,
        episode_length=1000,
        randomization_fn=domain_randomize,
        rng=rng,
        num_envs=NUM_ENVS,
    )
    keys = jax.random.split(rng, NUM_ENVS)
    state = jax.jit(wrapped.reset)(keys)

    # the training policy at the pinned config sizes (randomly initialized —
    # throughput is weight-independent)
    cfg = TC.ppo_config()
    obs_sizes = {k: v.shape[-1] for k, v in state.obs.items()}
    net = N.PPONetworks(
        obs_sizes,
        env.action_size,
        tuple(cfg.network_factory.policy_hidden_layer_sizes),
        tuple(cfg.network_factory.value_hidden_layer_sizes),
    )
    params = net.init(jax.random.PRNGKey(2))
    normalizer = RS.init(obs_sizes)

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            s, k = carry
            k, ak = jax.random.split(k)
            logits = net.policy_logits(params, RS.normalize(normalizer, s.obs))
            action = N.postprocess(N.sample_raw(ak, logits))
            return (wrapped.step(s, action), k), ()

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=STEPS)
        return state, key

    key = jax.random.PRNGKey(1)
    state, key = rollout(state, key)  # compile + warmup
    state, key = rollout(state, key)  # absorb steady-state retrace
    jax.block_until_ready(state.reward)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        state, key = rollout(state, key)
    jax.block_until_ready(state.reward)
    dt = time.perf_counter() - t0

    env_steps = NUM_ENVS * STEPS * reps
    sps = env_steps / dt
    n_chips = jax.device_count()
    per_chip = sps / n_chips
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip@4096envs",
                "value": round(per_chip, 1),
                "unit": "env_steps/s/chip",
                "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
