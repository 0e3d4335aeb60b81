"""Ablation of the PRODUCTION SGD epoch (transpose-free index-gather path,
train/ppo.py one_epoch) at production shapes: minibatch-scan unroll factors
and matmul precision, to localize the remaining non-rollout overhead.

The sustained gap is launch-latency-shaped: 128 sequential minibatch steps
per training step, each a scan iteration of many small fused kernels.

    python tools/profile_sgd_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/odp_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import functools

import jax
import jax.numpy as jnp
import optax

from open_duck_playground_tpu.train import gae
from open_duck_playground_tpu.train import networks as N
from open_duck_playground_tpu.train import running_stats as RS

B, T = 8192, 20
NMB = 32
MB = B // NMB
ACT = 14
OBS = {"state": 101, "privileged_state": 212}
RTT = 0.0


def measure(make_run, *args, K=8, label=""):
    run = make_run(K)
    _ = jax.device_get(run(*args))
    t0 = time.perf_counter()
    _ = jax.device_get(run(*args))
    dt = time.perf_counter() - t0
    per = (dt - RTT) / K
    print(f"{label:56s} {1e3 * per:8.3f} ms/iter   (total {1e3 * dt:7.1f})",
          flush=True)
    return per


def main():
    global RTT

    @jax.jit
    def tiny(x):
        return jnp.sum(x[:4])

    probe = jnp.zeros(8)
    _ = jax.device_get(tiny(probe))
    t0 = time.perf_counter()
    _ = jax.device_get(tiny(probe))
    RTT = time.perf_counter() - t0
    print(f"tunnel RTT: {1e3 * RTT:.1f} ms", flush=True)

    net = N.PPONetworks(OBS, ACT, (128,) * 4, (256,) * 4,
                        "state", "privileged_state")
    rng = jax.random.PRNGKey(0)
    params = net.init(rng)
    normalizer = RS.init(OBS)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    opt_state = tx.init(params)

    ks = jax.random.split(rng, 8)
    data = {
        "obs": {
            "state": jax.random.normal(ks[0], (T, B, 101)),
            "privileged_state": jax.random.normal(ks[1], (T, B, 212)),
        },
        "raw_action": jax.random.normal(ks[2], (T, B, ACT)) * 0.1,
        "log_prob": jax.random.normal(ks[3], (T, B)),
        "reward": jax.random.normal(ks[4], (T, B)),
        "done": jnp.zeros((T, B)),
        "truncation": jnp.zeros((T, B)),
    }
    final_obs = {
        "state": jax.random.normal(ks[5], (B, 101)),
        "privileged_state": jax.random.normal(ks[6], (B, 212)),
    }
    data = jax.device_put(data)
    final_obs = jax.device_put(final_obs)

    # --- the production loss (time-major minibatch, ppo.py loss_fn) -------
    def loss_fn(params, normalizer, batch, ent_key):
        mb_data, mb_final = batch
        norm_obs = RS.normalize(normalizer, mb_data["obs"])
        logits = net.policy_logits(params, norm_obs)
        baseline = net.value(params, norm_obs)
        bootstrap = net.value(params, RS.normalize(normalizer, mb_final))
        truncation = mb_data["truncation"]
        termination = mb_data["done"] * (1 - truncation)
        target_lp = N.log_prob(logits, mb_data["raw_action"])
        vs, advantages = gae.compute_gae(
            truncation=truncation, termination=termination,
            rewards=mb_data["reward"], values=baseline,
            bootstrap_value=bootstrap, lambda_=0.95, discount=0.97, unroll=T)
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        rho = jnp.exp(target_lp - mb_data["log_prob"])
        policy_loss = -jnp.mean(
            jnp.minimum(rho * advantages, jnp.clip(rho, 0.7, 1.3) * advantages))
        v_error = vs - baseline
        v_loss = jnp.mean(v_error * v_error) * 0.25
        ent = jnp.mean(N.entropy(ent_key, logits))
        return policy_loss + v_loss - 1e-2 * ent, {}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def minibatch_step(carry, batch):
        params, opt_state, key = carry
        key, ent_key = jax.random.split(key)
        (_, m), grads = grad_fn(params, normalizer, batch, ent_key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), m

    def make_epoch(K, *, mb_unroll=1, precision=None):
        def gather_step(carry, mb_envs):
            batch = (
                jax.tree.map(lambda x: jnp.take(x, mb_envs, axis=1), data),
                jax.tree.map(lambda x: jnp.take(x, mb_envs, axis=0), final_obs),
            )
            return minibatch_step(carry, batch)

        def epoch_body(carry, _):
            params, opt_state, key = carry
            key, perm_key = jax.random.split(key)
            perm = jax.random.permutation(perm_key, B).reshape(NMB, MB)
            (params, opt_state, key), _ = jax.lax.scan(
                gather_step, (params, opt_state, key), perm, unroll=mb_unroll)
            return (params, opt_state, key), ()

        @jax.jit
        def run(params, opt_state, key):
            def go():
                (params2, _, _), _ = jax.lax.scan(
                    epoch_body, (params, opt_state, key), None, length=K)
                return jax.tree.leaves(params2)[0].ravel()[0]

            if precision is None:
                return go()
            with jax.default_matmul_precision(precision):
                return go()

        return run

    args = (params, opt_state, jax.random.PRNGKey(1))
    measure(functools.partial(make_epoch), *args, K=8,
            label="production epoch (gather, unroll=1)")
    for u in (2, 4, 8):
        measure(functools.partial(make_epoch, mb_unroll=u), *args, K=8,
                label=f"production epoch, scan unroll={u}")
    for prec in ("bfloat16", "tensorfloat32", "float32"):
        measure(functools.partial(make_epoch, precision=prec), *args, K=8,
                label=f"production epoch, matmul precision={prec}")


if __name__ == "__main__":
    main()
