"""Microbenchmark of PPO epoch-shuffle strategies at production shapes.

The train-step ablation (tools/profile_train_step.py) shows the per-epoch
shuffle costs ~10 ms on a v5e — 4x per training step that is ~24% of all
non-rollout overhead. This isolates where it goes: the (T,B,F)->(B,T,F)
transpose, the 8192-key argsort inside jax.random.permutation, the row
gather itself, and fused/deferred variants.

    python tools/profile_shuffle.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/odp_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

B, T = 8192, 20
NMB = 32
MB = B // NMB
FEATS = {
    "state": 101,
    "priv": 212,
    "raw_action": 14,
    "log_prob": 1,
    "reward": 1,
    "done": 1,
    "truncation": 1,
}


def timeit(fn, *args, label="", reps=20):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:56s} {1e3 * dt:8.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    data = {
        k: jax.random.normal(jax.random.PRNGKey(i), (T, B, f), jnp.float32)
        if f > 1
        else jax.random.normal(jax.random.PRNGKey(i), (T, B), jnp.float32)
        for i, (k, f) in enumerate(FEATS.items())
    }
    nbytes = sum(x.size * 4 for x in jax.tree.leaves(data))
    print(f"payload: {nbytes / 1e6:.0f} MB", flush=True)

    # 0. argsort-based permutation indices alone
    @jax.jit
    def perm_only(key):
        return jax.random.permutation(key, B)

    timeit(perm_only, key, label="permutation indices (8192 argsort)")

    # 1. transpose alone
    @jax.jit
    def transpose_only(data):
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), data)

    timeit(transpose_only, data, label="transpose (T,B,..)->(B,T,..)")

    datab = jax.block_until_ready(transpose_only(data))

    # 2. gather alone on env-major layout (leading-axis rows of ~26KB)
    perm = jax.block_until_ready(perm_only(key))

    @jax.jit
    def gather_leading(datab, perm):
        return jax.tree.map(lambda x: jnp.take(x, perm, axis=0), datab)

    timeit(gather_leading, datab, perm, label="gather axis0 of (B,T,..)")

    # 3. gather along axis=1 of time-major (no transpose at all)
    @jax.jit
    def gather_axis1(data, perm):
        return jax.tree.map(lambda x: jnp.take(x, perm, axis=1), data)

    timeit(gather_axis1, data, perm, label="gather axis1 of (T,B,..)")

    # 4. current production shuffle (transpose + permutation + reshape)
    @jax.jit
    def shuffle_now(key, data):
        perm = jax.random.permutation(key, B)

        def shuf(x):
            x = jnp.swapaxes(x, 0, 1)
            x = jnp.take(x, perm, axis=0)
            return x.reshape((NMB, MB) + x.shape[1:])

        return jax.tree.map(shuf, data)

    timeit(shuffle_now, key, data, label="production shuffle (tr+gather+reshape)")

    # 5. deferred: permute indices only; gather per minibatch inside scan
    @jax.jit
    def deferred_scan(key, datab):
        perm = jax.random.permutation(key, B).reshape(NMB, MB)

        def body(c, idx):
            mb = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), datab)
            # touch every element so the gather can't be DCE'd
            s = sum(jnp.sum(x) for x in jax.tree.leaves(mb))
            return c + s, ()

        out, _ = jax.lax.scan(body, 0.0, perm)
        return out

    timeit(deferred_scan, key, datab, label="deferred per-minibatch gather+reduce")

    # 6. read-only reduce of the full payload (speed-of-light-ish floor)
    @jax.jit
    def reduce_all(datab):
        return sum(jnp.sum(x) for x in jax.tree.leaves(datab))

    timeit(reduce_all, datab, label="plain full-payload reduce (floor)")

    # 7. one-hot matmul permutation of the fat leaves (bf16 MXU path)
    @jax.jit
    def onehot_matmul(key, datab):
        perm = jax.random.permutation(key, B)
        oh = (
            (perm[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, B), 1))
            .astype(jnp.bfloat16)
        )

        def shuf(x):
            flat = x.reshape(B, -1)
            return jax.lax.dot(
                oh, flat.astype(jnp.bfloat16),
                precision=jax.lax.Precision.DEFAULT,
            ).astype(jnp.float32).reshape(x.shape)

        return jax.tree.map(shuf, datab)

    timeit(onehot_matmul, key, datab, label="one-hot bf16 matmul permute")

    # 8. epoch-shaped: shuffle + scan-consume (checks gather->consumer fusion)
    @jax.jit
    def shuffle_then_scan(key, data):
        sh = shuffle_now(key, data)

        def body(c, mb):
            s = sum(jnp.sum(x) for x in jax.tree.leaves(mb))
            return c + s, ()

        out, _ = jax.lax.scan(body, 0.0, sh)
        return out

    timeit(shuffle_then_scan, key, data, label="production shuffle + scan reduce")


if __name__ == "__main__":
    main()
