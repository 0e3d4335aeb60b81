"""Second-round epoch variants (axon-safe chained timing): minibatch-scan
unroll depth, and a transpose-free epoch that keeps data time-major —
permute along the env axis, then read each minibatch as a contiguous
dynamic-slice, so neither the shuffle nor the loss ever transposes the
217 MB payload.

    python tools/profile_epoch_timemajor.py
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

    def loss_core(params, normalizer, data_tm, final_obs_mb, ent_key):
        """data_tm leaves are time-major (T, MB, ...)."""
        norm_obs = RS.normalize(normalizer, data_tm["obs"])
        logits = net.policy_logits(params, norm_obs)
        baseline = net.value(params, norm_obs)
        norm_next = RS.normalize(normalizer, final_obs_mb)
        bootstrap = net.value(params, norm_next)
        truncation = data_tm["truncation"]
        termination = data_tm["done"] * (1 - truncation)
        target_lp = N.log_prob(logits, data_tm["raw_action"])
        vs, advantages = gae.compute_gae(
            truncation=truncation, termination=termination,
            rewards=data_tm["reward"], values=baseline,
            bootstrap_value=bootstrap, lambda_=0.95, discount=0.97,
        )
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        rho = jnp.exp(target_lp - data_tm["log_prob"])
        surrogate = rho * advantages
        clipped = jnp.clip(rho, 0.7, 1.3) * advantages
        policy_loss = -jnp.mean(jnp.minimum(surrogate, clipped))
        v_error = vs - baseline
        v_loss = jnp.mean(v_error * v_error) * 0.25
        ent = jnp.mean(N.entropy(ent_key, logits))
        return policy_loss + v_loss - 1e-2 * ent, {}

    def loss_bm(params, normalizer, batch, ent_key):
        """batch-major minibatch (current production): leaves (MB, T, ...)."""
        data_mb, final_obs_mb = batch
        data_tm = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), data_mb)
        return loss_core(params, normalizer, data_tm, final_obs_mb, ent_key)

    grad_bm = jax.value_and_grad(loss_bm, has_aux=True)
    grad_tm = jax.value_and_grad(loss_core, has_aux=True, argnums=0)

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

    # -------- A: production epoch at various minibatch-scan unrolls
    def make_epoch_A(K, mb_unroll):
        def minibatch_step(carry, batch):
            params, opt_state, key = carry
            key, ent_key = jax.random.split(key)
            (_, m), grads = grad_bm(params, normalizer, batch, ent_key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), ()

        @jax.jit
        def run(params, opt_state, key, data, final_obs):
            def one_epoch(carry, _):
                params, opt_state, key = carry
                key, perm_key = jax.random.split(key)
                shuffled = shuffle_data(perm_key, data, final_obs)
                (params, opt_state, key), _ = jax.lax.scan(
                    minibatch_step, (params, opt_state, key), shuffled,
                    unroll=mb_unroll,
                )
                return (params, opt_state, key), ()

            (params, _, _), _ = jax.lax.scan(
                one_epoch, (params, opt_state, key), None, length=K)
            return jax.tree.leaves(params)[0].ravel()[0]

        return run

    # -------- B: transpose-free epoch — permute axis 1, slice minibatches
    def make_epoch_B(K, mb_unroll, materialize=True):
        @jax.jit
        def run(params, opt_state, key, data, final_obs):
            def one_epoch(carry, _):
                params, opt_state, key = carry
                key, perm_key = jax.random.split(key)
                perm = jax.random.permutation(perm_key, B)
                if materialize:
                    pdata = jax.tree.map(
                        lambda x: jnp.take(x, perm, axis=1), data)
                    pfinal = jax.tree.map(
                        lambda x: jnp.take(x, perm, axis=0), final_obs)
                else:
                    pdata, pfinal = data, final_obs

                def minibatch_step(carry, i):
                    params, opt_state, key = carry
                    key, ent_key = jax.random.split(key)
                    if materialize:
                        mb = jax.tree.map(
                            lambda x: jax.lax.dynamic_slice_in_dim(
                                x, i * MB, MB, axis=1), pdata)
                        fo = jax.tree.map(
                            lambda x: jax.lax.dynamic_slice_in_dim(
                                x, i * MB, MB, axis=0), pfinal)
                    else:
                        idx = jax.lax.dynamic_slice_in_dim(perm, i * MB, MB)
                        mb = jax.tree.map(
                            lambda x: jnp.take(x, idx, axis=1), pdata)
                        fo = jax.tree.map(
                            lambda x: jnp.take(x, idx, axis=0), pfinal)
                    (_, m), grads = grad_tm(params, normalizer, mb, fo, ent_key)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state, key), ()

                (params, opt_state, key), _ = jax.lax.scan(
                    minibatch_step, (params, opt_state, key),
                    jnp.arange(NMB), unroll=mb_unroll,
                )
                return (params, opt_state, key), ()

            (params, _, _), _ = jax.lax.scan(
                one_epoch, (params, opt_state, key), None, length=K)
            return jax.tree.leaves(params)[0].ravel()[0]

        return run

    args = (params, opt_state, jax.random.PRNGKey(1), data, final_obs)
    for u in (4, 8, 32):
        measure(functools.partial(make_epoch_A, mb_unroll=u), *args, K=8,
                label=f"A: production epoch, mb_unroll={u}")
    for u in (4, 8):
        measure(functools.partial(make_epoch_B, mb_unroll=u), *args, K=8,
                label=f"B: transpose-free (axis1 perm + slice), unroll={u}")
    measure(functools.partial(make_epoch_B, mb_unroll=4, materialize=False),
            *args, K=8, label="C: deferred per-mb axis1 gather, unroll=4")


if __name__ == "__main__":
    main()
