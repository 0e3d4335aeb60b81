"""Reliable (axon-safe) timing of the PPO SGD epoch + normalizer at
production shapes, with ablation variants.

On the axon tunnel backend `block_until_ready` returns at enqueue, so
every variant here is chained K times *inside* one jitted `lax.scan`
(data-dependent carry) and synced with `jax.device_get` of a scalar; the
~30 ms tunnel RTT is measured and subtracted.

    python tools/profile_epoch.py
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
import numpy as np
import optax

from open_duck_playground_tpu.train import gae
from open_duck_playground_tpu.train import networks as N
from open_duck_playground_tpu.train import running_stats as RS

B, T = 8192, 20
NMB = 32
MB = B // NMB
ACT = 14
OBS = {"state": 101, "privileged_state": 212}


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

    # ------------------------------------------------- normalizer update
    def make_norm(K):
        @jax.jit
        def run(normalizer, obs):
            def body(ns, _):
                return RS.update(ns, obs), ()
            ns, _ = jax.lax.scan(body, normalizer, None, length=K)
            return ns.count + ns.mean["state"][0]
        return run

    measure(make_norm, normalizer, data["obs"], K=16, label="normalizer update")

    # ------------------------------------------------------------- losses
    def loss_fn(params, normalizer, batch, ent_key, unroll_gae=False):
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
            values=baseline, bootstrap_value=bootstrap,
            lambda_=0.95, discount=0.97,
            unroll=T if unroll_gae else 1,
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

    def make_minibatch_step(unroll_gae):
        grad_fn = jax.value_and_grad(
            functools.partial(loss_fn, unroll_gae=unroll_gae), has_aux=True)

        def minibatch_step(carry, batch):
            params, opt_state, normalizer, key = carry
            key, ent_key = jax.random.split(key)
            (_, m), grads = grad_fn(params, normalizer, batch, ent_key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, normalizer, key), m

        return minibatch_step

    def shuffle_data(perm_key, data, final_obs):
        perm = jax.random.permutation(perm_key, B)

        def shuffle(x):
            x = jnp.swapaxes(x, 0, 1)
            x = jnp.take(x, perm, axis=0)
            return x.reshape((NMB, MB) + x.shape[1:])

        def shuffle_final(x):
            x = jnp.take(x, perm, axis=0)
            return x.reshape((NMB, MB) + x.shape[1:])

        return jax.tree.map(shuffle, data), jax.tree.map(shuffle_final, final_obs)

    def make_epoch(K, *, do_shuffle=True, unroll_gae=False, mb_unroll=1):
        mbs = make_minibatch_step(unroll_gae)

        @jax.jit
        def run(params, opt_state, normalizer, key, data, final_obs):
            def one_epoch(carry, _):
                params, opt_state, key = carry
                key, perm_key = jax.random.split(key)
                if do_shuffle:
                    shuffled = shuffle_data(perm_key, data, final_obs)
                else:
                    def contig(x):
                        y = jnp.swapaxes(x, 0, 1)
                        return y.reshape((NMB, MB) + y.shape[1:])

                    shuffled = (
                        jax.tree.map(contig, data),
                        jax.tree.map(
                            lambda x: x.reshape((NMB, MB) + x.shape[1:]),
                            final_obs,
                        ),
                    )
                (params, opt_state, _, key), _ = jax.lax.scan(
                    mbs, (params, opt_state, normalizer, key), shuffled,
                    unroll=mb_unroll,
                )
                return (params, opt_state, key), ()

            (params, _, _), _ = jax.lax.scan(
                one_epoch, (params, opt_state, key), None, length=K)
            return jax.tree.leaves(params)[0].ravel()[0]

        return run

    args = (params, opt_state, normalizer, jax.random.PRNGKey(1), data, final_obs)
    measure(functools.partial(make_epoch), *args, K=8,
            label="epoch: shuffle + 32 minibatches (production)")
    measure(functools.partial(make_epoch, do_shuffle=False), *args, K=8,
            label="epoch: NO shuffle (contiguous minibatches)")
    measure(functools.partial(make_epoch, unroll_gae=True), *args, K=8,
            label="epoch: shuffle + unrolled GAE")
    measure(functools.partial(make_epoch, unroll_gae=True, mb_unroll=4), *args,
            K=8, label="epoch: shuffle + unrolled GAE + mb-unroll 4")

    # shuffle alone, consumed by a cheap full reduce
    def make_shuffle_only(K):
        @jax.jit
        def run(key, data, final_obs):
            def body(c, _):
                k = jax.random.fold_in(key, c.astype(jnp.int32))
                sh, shf = shuffle_data(k, data, final_obs)
                s = sum(jnp.sum(x) for x in jax.tree.leaves((sh, shf)))
                return c + s * 1e-30, ()
            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=K)
            return out
        return run

    measure(make_shuffle_only, jax.random.PRNGKey(2), data, final_obs, K=8,
            label="shuffle + full reduce only")


if __name__ == "__main__":
    main()
