"""Ablation profile of the full PPO training step at production shapes.

Times, as separately jitted programs on the current default backend:
  1. rollout only (policy inference + env step scan, unroll=20)
  2. normalizer update alone (on captured rollout data)
  3. one SGD epoch: shuffle + 32 minibatches (on captured data)
  4. shuffle only (permutation + reshape, no grads)
  5. one eval episode (num_eval_envs sequential steps)

    python tools/profile_train_step.py [--num-envs 8192] [--task flat_terrain_backlash]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/odp_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timeit(fn, *args, label="", reps=5, steps=1):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps / steps
    print(f"{label:48s} {1e3 * dt:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="flat_terrain_backlash")
    ap.add_argument("--num-envs", type=int, default=8192)
    args = ap.parse_args()

    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.envs.randomize import domain_randomize
    from open_duck_playground_tpu.envs.wrappers import EvalEnv, TrainingEnv
    from open_duck_playground_tpu.train import gae
    from open_duck_playground_tpu.train import networks as N
    from open_duck_playground_tpu.train import running_stats as RS

    num_envs = args.num_envs
    T = 20
    num_minibatches = 32
    num_updates_per_batch = 4

    env = Joystick(task=args.task)
    rng = jax.random.PRNGKey(0)
    rng, wrap_rng = jax.random.split(rng)
    train_env = TrainingEnv(
        env, episode_length=1000, action_repeat=1,
        randomization_fn=domain_randomize, rng=wrap_rng, num_envs=num_envs,
    )
    obs_sizes = {k: int(np.prod(v)) for k, v in env.observation_size.items()}
    net = N.PPONetworks(
        obs_sizes, env.action_size, (128,) * 4, (256,) * 4,
        "state", "privileged_state",
    )
    rng, init_rng = jax.random.split(rng)
    params = net.init(init_rng)
    normalizer = RS.init(obs_sizes)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    opt_state = tx.init(params)

    env_keys = jax.random.split(rng, num_envs)
    env_state = jax.jit(train_env.reset)(env_keys)
    jax.block_until_ready(env_state.reward)
    print(f"reset done; envs={num_envs} T={T}", flush=True)

    # ----------------------------------------------------------- 1. rollout
    def policy_step(carry, _, params, normalizer):
        env_state, key = carry
        key, akey = jax.random.split(key)
        norm_obs = RS.normalize(normalizer, env_state.obs)
        logits = net.policy_logits(params, norm_obs)
        raw = N.sample_raw(akey, logits)
        action = N.postprocess(raw)
        nstate = train_env.step(env_state, action)
        transition = {
            "obs": env_state.obs,
            "raw_action": raw,
            "log_prob": N.log_prob(logits, raw),
            "reward": nstate.reward,
            "done": nstate.done,
            "truncation": nstate.info["truncation"],
        }
        return (nstate, key), transition

    @jax.jit
    def rollout(env_state, key, params, normalizer):
        (env_state, _), data = jax.lax.scan(
            functools.partial(policy_step, params=params, normalizer=normalizer),
            (env_state, key), None, length=T,
        )
        return env_state, data, env_state.obs

    key = jax.random.PRNGKey(1)
    dt_roll = timeit(rollout, env_state, key, params, normalizer,
                     label=f"rollout (T={T}, policy+env)")
    print(f"  -> rollout-only throughput: {num_envs * T / dt_roll:,.0f} env steps/s")
    _, data, final_obs = jax.block_until_ready(rollout(env_state, key, params, normalizer))

    # --------------------------------------------- 1b. env-only rollout
    act0 = jnp.zeros((num_envs, env.action_size), jnp.float32)

    @jax.jit
    def rollout_env_only(env_state):
        def body(s, _):
            return train_env.step(s, act0), ()
        out, _ = jax.lax.scan(body, env_state, None, length=T)
        return out

    dt_env = timeit(rollout_env_only, env_state, label="rollout env.step only (no policy)")

    # --------------------------------------------------- 2. normalizer update
    @jax.jit
    def norm_update(normalizer, obs):
        return RS.update(normalizer, obs)

    timeit(norm_update, normalizer, data["obs"], label="normalizer update")

    # ------------------------------------------------------- 3/4. SGD epoch
    def loss_fn(params, normalizer, batch, ent_key):
        data, final_obs = batch
        data = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), data)
        norm_obs = RS.normalize(normalizer, data["obs"])
        logits = net.policy_logits(params, norm_obs)
        baseline = net.value(params, norm_obs)
        norm_next = RS.normalize(normalizer, final_obs)
        bootstrap = net.value(params, norm_next)
        rewards = data["reward"]
        truncation = data["truncation"]
        termination = data["done"] * (1 - truncation)
        target_lp = N.log_prob(logits, data["raw_action"])
        vs, advantages = gae.compute_gae(
            truncation=truncation, termination=termination, rewards=rewards,
            values=baseline, bootstrap_value=bootstrap, lambda_=0.95, discount=0.97,
        )
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        rho = jnp.exp(target_lp - data["log_prob"])
        surrogate = rho * advantages
        clipped = jnp.clip(rho, 0.7, 1.3) * advantages
        policy_loss = -jnp.mean(jnp.minimum(surrogate, clipped))
        v_error = vs - baseline
        v_loss = jnp.mean(v_error * v_error) * 0.25
        ent = jnp.mean(N.entropy(ent_key, logits))
        return policy_loss + v_loss - 1e-2 * ent, {}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def minibatch_step(carry, batch):
        params, opt_state, normalizer, key = carry
        key, ent_key = jax.random.split(key)
        (_, m), grads = grad_fn(params, normalizer, batch, ent_key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, normalizer, key), m

    def shuffle_data(perm_key, data, final_obs):
        def shuffle(x):
            x = jnp.swapaxes(x, 0, 1)
            x = jax.random.permutation(perm_key, x, axis=0)
            return x.reshape((num_minibatches, -1) + x.shape[1:])

        def shuffle_final(x):
            x = jax.random.permutation(perm_key, x, axis=0)
            return x.reshape((num_minibatches, -1) + x.shape[1:])

        return jax.tree.map(shuffle, data), jax.tree.map(shuffle_final, final_obs)

    @jax.jit
    def one_epoch(params, opt_state, normalizer, key, data, final_obs):
        key, perm_key = jax.random.split(key)
        shuffled = shuffle_data(perm_key, data, final_obs)
        (params, opt_state, _, key), m = jax.lax.scan(
            minibatch_step, (params, opt_state, normalizer, key), shuffled
        )
        return params, opt_state, key

    dt_epoch = timeit(one_epoch, params, opt_state, normalizer, key, data, final_obs,
                      label="one SGD epoch (shuffle + 32 minibatches)")
    print(f"  -> x{num_updates_per_batch} epochs = "
          f"{1e3 * dt_epoch * num_updates_per_batch:.2f} ms")

    @jax.jit
    def shuffle_only(key, data, final_obs):
        return shuffle_data(key, data, final_obs)

    timeit(shuffle_only, key, data, final_obs, label="shuffle only")

    @jax.jit
    def sgd_only(params, opt_state, normalizer, key, shuffled):
        (params, opt_state, _, key), m = jax.lax.scan(
            minibatch_step, (params, opt_state, normalizer, key), shuffled
        )
        return params, opt_state

    shuffled = jax.block_until_ready(shuffle_only(key, data, final_obs))
    timeit(sgd_only, params, opt_state, normalizer, key, shuffled,
           label="32 minibatches SGD only (pre-shuffled)")

    # ----------------------------------------------------------- 5. eval
    ev_env = EvalEnv(env, episode_length=1000, action_repeat=1)

    @jax.jit
    def run_eval(params, normalizer, key):
        key, rkey = jax.random.split(key)
        state = ev_env.reset(jax.random.split(rkey, 128))

        def step(carry, _):
            s, k = carry
            k, ak = jax.random.split(k)
            norm = RS.normalize(normalizer, s.obs)
            logits = net.policy_logits(params, norm)
            action = N.postprocess(N.sample_raw(ak, logits))
            return (ev_env.step(s, action), k), None

        (state, _), _ = jax.lax.scan(step, (state, key), None, length=1000)
        return state.info["eval_metrics"]["episode_reward"].mean()

    timeit(run_eval, params, normalizer, key, label="one eval (128 envs x 1000 steps)", reps=2)

    total = dt_roll + dt_epoch * num_updates_per_batch
    print(f"\nrollout + {num_updates_per_batch} epochs = {1e3 * total:.2f} ms "
          f"-> {num_envs * T / total:,.0f} env steps/s sustained-ish")


if __name__ == "__main__":
    main()
