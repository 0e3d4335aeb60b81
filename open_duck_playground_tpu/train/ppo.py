"""PPO trainer: rollout scan, truncation-aware GAE, clipped surrogate loss,
minibatched SGD, running obs normalization, asymmetric actor-critic, periodic
eval, checkpoint/ONNX hooks.

Replaces `brax.training.agents.ppo.train` (reference runner.py:104-118) with
a TPU-native design: one `jax.jit`-compiled training epoch over a
`jax.sharding.Mesh` with a single "data" axis — env state and rollouts are
sharded across chips over ICI, parameters/normalizer are replicated, and the
gradient/normalizer reductions become XLA collectives automatically (no pmap,
no NCCL; SURVEY §2.3). Env-batch vectorization comes from `TrainingEnv`'s
vmap; scaling out = growing the mesh.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from open_duck_playground_tpu.envs.wrappers import EvalEnv, TrainingEnv
from open_duck_playground_tpu.train import gae, networks as N, running_stats as RS


@struct.dataclass
class TrainingState:
    params: dict
    opt_state: optax.OptState
    normalizer: RS.RunningStats
    env_steps: jnp.ndarray


def _obs_sizes(env) -> dict:
    shapes = env.observation_size
    return {k: int(np.prod(v)) for k, v in shapes.items()}


def make_policy_factory(net: N.PPONetworks):
    def make_policy(variables, deterministic: bool = False):
        normalizer, params = variables

        def policy(obs, rng):
            norm = RS.normalize(normalizer, obs)
            logits = net.policy_logits(params, norm)
            if deterministic:
                return N.deterministic_action(logits), {}
            raw = N.sample_raw(rng, logits)
            return N.postprocess(raw), {
                "raw_action": raw,
                "log_prob": N.log_prob(logits, raw),
            }

        return policy

    return make_policy


def train(
    environment,
    num_timesteps: int,
    eval_env=None,
    num_envs: int = 8192,
    episode_length: int = 1000,
    action_repeat: int = 1,
    unroll_length: int = 20,
    num_minibatches: int = 32,
    num_updates_per_batch: int = 4,
    batch_size: int = 256,
    learning_rate: float = 3e-4,
    entropy_cost: float = 1e-2,
    discounting: float = 0.97,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.3,
    normalize_advantage: bool = True,
    reward_scaling: float = 1.0,
    max_grad_norm: Optional[float] = 1.0,
    normalize_observations: bool = True,
    num_evals: int = 1,
    num_eval_envs: int = 128,
    deterministic_eval: bool = False,
    seed: int = 0,
    policy_hidden_layer_sizes: Tuple[int, ...] = (128,) * 4,
    value_hidden_layer_sizes: Tuple[int, ...] = (256,) * 4,
    policy_obs_key: str = "state",
    value_obs_key: str = "privileged_state",
    randomization_fn: Optional[Callable] = None,
    progress_fn: Callable[[int, dict], None] = lambda *a: None,
    policy_params_fn: Callable = lambda *a, **k: None,
    restore_checkpoint_path: Optional[str] = None,
    mesh: Optional[Mesh] = None,
    max_env_steps_per_jit: Optional[int] = 8_192_000,
    debug_loss_metrics: bool = False,
    bf16_matmuls: bool = False,
):
    """Returns (make_policy, (normalizer, params), metrics)."""
    # Brax's rollout contract: batch_size * num_minibatches must be a
    # positive multiple of num_envs; when it exceeds num_envs the rollout
    # collects k consecutive unroll segments per env per training step and
    # minibatches over the k*num_envs trajectory segments (brax
    # ppo/train.py semantics). k == 1 (the pinned duck config) keeps the
    # segment-free fast path.
    assert batch_size * num_minibatches % num_envs == 0, (
        "PPO rollout contract: batch_size * num_minibatches must be a "
        "multiple of num_envs",
        batch_size, num_minibatches, num_envs)
    k_unrolls = (batch_size * num_minibatches) // num_envs
    assert k_unrolls >= 1
    rng = jax.random.PRNGKey(seed)

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("data",))
    ndev = mesh.devices.size
    assert num_envs % ndev == 0, (num_envs, ndev)
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    env = environment
    rng, wrap_rng = jax.random.split(rng)
    train_env = TrainingEnv(
        env,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=randomization_fn,
        rng=wrap_rng,
        num_envs=num_envs,
    )

    obs_sizes = _obs_sizes(env)
    net = N.PPONetworks(
        obs_sizes,
        env.action_size,
        tuple(policy_hidden_layer_sizes),
        tuple(value_hidden_layer_sizes),
        policy_obs_key,
        value_obs_key,
        # bf16 MXU passes with f32 accumulation for the actor/critic
        # matmuls (rollout inference + the 128 grad steps); params, grads
        # and Adam state stay f32. Default off = brax-parity numerics.
        matmul_dtype=jnp.bfloat16 if bf16_matmuls else None,
    )
    make_policy = make_policy_factory(net)

    tx_parts = []
    if max_grad_norm is not None:
        tx_parts.append(optax.clip_by_global_norm(max_grad_norm))
    tx_parts.append(optax.adam(learning_rate))
    tx = optax.chain(*tx_parts)

    rng, init_rng = jax.random.split(rng)
    params = net.init(init_rng)
    normalizer = RS.init(obs_sizes)
    if not normalize_observations:
        # identity normalizer: keep std=1, mean=0 forever
        pass
    training_state = TrainingState(
        params=params,
        opt_state=tx.init(params),
        normalizer=normalizer,
        env_steps=jnp.zeros((), jnp.int64 if jax.config.x64_enabled else jnp.int32),
    )

    restored_epoch_key = None
    if restore_checkpoint_path is not None:
        from open_duck_playground_tpu.train import checkpoint as CKPT

        training_state, restored_epoch_key = CKPT.restore_training_state(
            restore_checkpoint_path, training_state, tx
        )

    # ------------------------------------------------------------- rollout
    def policy_step(carry, _, params, normalizer):
        env_state, key, moments = carry
        key, akey = jax.random.split(key)
        norm_obs = RS.normalize(normalizer, env_state.obs)
        logits = net.policy_logits(params, norm_obs)
        raw = N.sample_raw(akey, logits)
        action = N.postprocess(raw)
        nstate = train_env.step(env_state, action)
        if normalize_observations:
            # fuse the normalizer's moment accumulation into the rollout pass
            # (the obs are in registers here; a separate RS.update would
            # re-read the whole (T, B, obs) block from HBM after the rollout)
            moments = RS.accumulate_moments(normalizer, moments, env_state.obs)
        transition = {
            "obs": env_state.obs,
            "raw_action": raw,
            "log_prob": N.log_prob(logits, raw),
            "reward": nstate.reward,
            "done": nstate.done,
            "truncation": nstate.info["truncation"],
        }
        return (nstate, key, moments), transition

    def generate_unroll(env_state, key, params, normalizer):
        (env_state, _, moments), data = jax.lax.scan(
            functools.partial(policy_step, params=params, normalizer=normalizer),
            (env_state, key, RS.zero_moments(normalizer)),
            None,
            length=k_unrolls * unroll_length,
        )
        # Only the final frame's obs is needed for the GAE bootstrap value —
        # carrying per-step next_obs would double the rollout's HBM writes
        # and the per-epoch shuffle traffic for data the loss never reads.
        # With k_unrolls > 1 each unroll_length-long segment's bootstrap obs
        # comes from the frame after the segment boundary; if an episode ends
        # exactly at a boundary that obs is post-reset, which is inert because
        # GAE masks the bootstrap with termination/truncation at the boundary.
        return env_state, data, env_state.obs, moments  # data: (k*T, num_envs, ...)

    # ---------------------------------------------------------------- loss
    def loss_fn(params, normalizer, batch, ent_key):
        """batch = (data, final_obs): data leaves time-major (T, MB, ...)
        straight from the rollout layout, final_obs leaves (MB, ...) — the
        post-unroll obs for the bootstrap value. Keeping the minibatch
        time-major means neither the shuffle nor the loss ever transposes
        the rollout payload (see one_epoch)."""
        data, final_obs = batch
        norm_obs = RS.normalize(normalizer, data["obs"])
        logits = net.policy_logits(params, norm_obs)
        baseline = net.value(params, norm_obs)
        norm_next = RS.normalize(normalizer, final_obs)
        bootstrap = net.value(params, norm_next)

        rewards = data["reward"] * reward_scaling
        truncation = data["truncation"]
        termination = data["done"] * (1 - truncation)

        target_lp = N.log_prob(logits, data["raw_action"])
        behaviour_lp = data["log_prob"]

        vs, advantages = gae.compute_gae(
            truncation=truncation,
            termination=termination,
            rewards=rewards,
            values=baseline,
            bootstrap_value=bootstrap,
            lambda_=gae_lambda,
            discount=discounting,
            # T is short (unroll_length); full unroll removes the scan's
            # per-step dispatch from the 128 loss calls per training step
            unroll=unroll_length,
        )
        if normalize_advantage:
            advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        rho = jnp.exp(target_lp - behaviour_lp)
        surrogate = rho * advantages
        clipped = (
            jnp.clip(rho, 1 - clipping_epsilon, 1 + clipping_epsilon) * advantages
        )
        policy_loss = -jnp.mean(jnp.minimum(surrogate, clipped))

        v_error = vs - baseline
        v_loss = jnp.mean(v_error * v_error) * 0.5 * 0.5

        ent = jnp.mean(N.entropy(ent_key, logits))
        entropy_loss = -entropy_cost * ent

        total = policy_loss + v_loss + entropy_loss
        out_metrics = {
            "total_loss": total,
            "policy_loss": policy_loss,
            "v_loss": v_loss,
            "entropy_loss": entropy_loss,
        }
        if debug_loss_metrics:
            am = lambda x: jnp.abs(x).max()
            out_metrics.update(
                obs_absmax=am(data["obs"]["state"]),
                pobs_absmax=am(data["obs"]["privileged_state"]),
                normobs_absmax=am(norm_obs["state"]),
                pnormobs_absmax=am(norm_obs["privileged_state"]),
                baseline_absmax=am(baseline),
                bootstrap_absmax=am(bootstrap),
                vs_absmax=am(vs),
                adv_absmax=am(advantages),
                rho_max=rho.max(),
                lp_absmax=am(target_lp),
                blp_absmax=am(behaviour_lp),
                ent=ent,
            )
        return total, out_metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def minibatch_step(carry, batch):
        params, opt_state, normalizer, key = carry
        key, ent_key = jax.random.split(key)
        (_, metrics), grads = grad_fn(params, normalizer, batch, ent_key)
        # observability: a NaN/inf gradient poisons Adam state permanently;
        # grad_norm in the metrics stream localizes *when* it happened
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["params_norm"] = optax.global_norm(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, normalizer, key), metrics

    def training_step(training_state: TrainingState, env_state, key):
        key, unroll_key, sgd_key = jax.random.split(key, 3)
        env_state, data, final_obs, moments = generate_unroll(
            env_state, unroll_key, training_state.params, training_state.normalizer
        )
        # data leaves: (k*T, num_envs, ...); final_obs leaves: (num_envs, ...)

        if normalize_observations:
            batch = jnp.asarray(
                k_unrolls * num_envs * unroll_length, jnp.float32
            )
            normalizer = RS.merge_moments(
                training_state.normalizer, batch, *moments
            )
        else:
            normalizer = training_state.normalizer

        if k_unrolls > 1:
            # brax-general contract: split the long rollout into k unroll
            # segments per env and treat them as k*num_envs independent
            # trajectory segments. Segment j's GAE bootstrap obs is the obs
            # observed at the first step of segment j+1 (the state the
            # segment's last action produced); the final segment uses the
            # post-rollout env obs.
            T, E = unroll_length, num_envs

            def to_segments(x):  # (k*T, E, ...) -> (T, k*E, ...)
                x = x.reshape((k_unrolls, T) + x.shape[1:])
                x = jnp.swapaxes(x, 0, 1)
                return x.reshape((T, k_unrolls * E) + x.shape[3:])

            final_obs = jax.tree.map(
                lambda d_obs, fin: jnp.concatenate(
                    [d_obs[T::T][: k_unrolls - 1], fin[None]], axis=0
                ).reshape((k_unrolls * E,) + fin.shape[1:]),
                data["obs"],
                final_obs,
            )
            data = jax.tree.map(to_segments, data)

        mb_size = batch_size
        ntraj = k_unrolls * num_envs

        def one_epoch(carry, _):
            params, opt_state, key = carry
            key, perm_key = jax.random.split(key)
            # Transpose-free shuffle: permute *indices* only, then gather
            # each minibatch's envs straight out of the time-major rollout
            # data inside the minibatch scan. The rollout payload is read
            # exactly once per epoch and never transposed or materialized
            # in permuted form (the old swapaxes→permutation→reshape path
            # moved the full (T, B, obs) block through HBM three times).
            # Minibatch contents are bitwise-identical to that path:
            # jax.random.permutation(k, x) == x[jax.random.permutation(k, n)].
            perm = jax.random.permutation(perm_key, ntraj)

            def gather_step(carry, idx):
                mb_envs = jax.lax.dynamic_slice_in_dim(
                    perm, idx * mb_size, mb_size
                )
                batch = (
                    jax.tree.map(lambda x: jnp.take(x, mb_envs, axis=1), data),
                    jax.tree.map(
                        lambda x: jnp.take(x, mb_envs, axis=0), final_obs
                    ),
                )
                return minibatch_step(carry, batch)

            (params, opt_state, _, key), metrics = jax.lax.scan(
                gather_step,
                (params, opt_state, normalizer, key),
                jnp.arange(num_minibatches),
                # unroll 4 minibatches per scan iteration: amortizes the
                # scan's per-iteration dispatch + lets XLA overlap each
                # minibatch's gather with the previous one's backward pass
                # (measured on-chip by tools/profile_epoch.py at 8192 envs:
                # 8.36 -> 6.11 ms per update epoch, -27%)
                unroll=4,
            )
            return (params, opt_state, key), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            one_epoch,
            (training_state.params, training_state.opt_state, sgd_key),
            None,
            length=num_updates_per_batch,
        )
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["reward_mean"] = data["reward"].mean()
        new_ts = TrainingState(
            params=params,
            opt_state=opt_state,
            normalizer=normalizer,
            env_steps=training_state.env_steps
            + k_unrolls * num_envs * unroll_length * action_repeat,
        )
        return new_ts, env_state, key, metrics

    steps_per_training_step = k_unrolls * num_envs * unroll_length * action_repeat

    def training_epoch(training_state, env_state, key, num_steps: int):
        def body(carry, _):
            ts, es, k = carry
            ts, es, k, metrics = training_step(ts, es, k)
            return (ts, es, k), metrics

        (training_state, env_state, key), metrics = jax.lax.scan(
            body, (training_state, env_state, key), None, length=num_steps
        )
        return training_state, env_state, key, jax.tree.map(jnp.mean, metrics)

    # ------------------------------------------------------------------ eval
    evaluator = None
    if num_evals > 1 or eval_env is not None:
        ev_env = EvalEnv(
            eval_env or env,
            episode_length=episode_length,
            action_repeat=action_repeat,
        )

        def run_eval(variables, key):
            policy = make_policy(variables, deterministic=deterministic_eval)
            key, rkey = jax.random.split(key)
            state = ev_env.reset(jax.random.split(rkey, num_eval_envs))

            def step(carry, _):
                s, k = carry
                k, ak = jax.random.split(k)
                action, _ = policy(s.obs, ak)
                return (ev_env.step(s, action), k), None

            (state, _), _ = jax.lax.scan(
                step, (state, key), None, length=episode_length // action_repeat
            )
            em = state.info["eval_metrics"]
            out = {
                "eval/episode_reward": em["episode_reward"].mean(),
                "eval/episode_reward_std": em["episode_reward"].std(),
                "eval/avg_episode_length": em["episode_length"].mean(),
            }
            # Competence scalars (beyond the reference, which streams reward
            # only): per-step episode means of the env's tracking errors —
            # eval reward saturates/anti-correlates with closed-loop command
            # tracking (RESULTS.md), so the errors are streamed directly.
            # Reward/cost terms stay episode SUMS (brax episode_metrics
            # semantics).
            ep_len = jnp.maximum(em["episode_length"], 1.0)
            for k, v in em["episode_metrics"].items():
                if k.startswith("tracking_err/"):
                    out["eval/" + k] = (v / ep_len).mean()
                else:
                    out["eval/episode_" + k] = v.mean()
            return out

        evaluator = jax.jit(run_eval)

    # ------------------------------------------------------------- schedule
    num_evals_after_init = max(num_evals - 1, 1)
    steps_per_epoch = int(
        np.ceil(num_timesteps / (num_evals_after_init * steps_per_training_step))
    )
    # Bound the on-device duration of a single jitted call: split the
    # per-eval epoch into equal chunks of <= max_env_steps_per_jit env steps.
    # Long single executions (minutes) risk device-runtime watchdogs/RPC
    # deadlines and starve the host of progress heartbeats; chunking costs
    # one dispatch per ~max_env_steps_per_jit steps (negligible).
    if max_env_steps_per_jit is None:
        n_chunks = 1
    else:
        max_ts = max(1, int(max_env_steps_per_jit) // steps_per_training_step)
        n_chunks = max(1, int(np.ceil(steps_per_epoch / max_ts)))
    chunk_steps = int(np.ceil(steps_per_epoch / n_chunks))

    epoch_fn = jax.jit(
        functools.partial(training_epoch, num_steps=chunk_steps),
        in_shardings=(replicated, data_sharding, replicated),
        out_shardings=(replicated, data_sharding, replicated, replicated),
        # state flows epoch->epoch and the caller rebinds all three args to
        # the outputs, so XLA may reuse the buffers in place — env_state at
        # production scale is hundreds of MB of HBM that would otherwise be
        # double-allocated across the call boundary
        donate_argnums=(0, 1, 2),
    )

    rng, reset_rng, epoch_key = jax.random.split(rng, 3)
    if restored_epoch_key is not None:
        epoch_key = restored_epoch_key
    env_keys = jax.device_put(jax.random.split(reset_rng, num_envs), data_sharding)
    env_state = jax.jit(train_env.reset, out_shardings=data_sharding)(env_keys)

    all_metrics = {}
    current_step = int(jax.device_get(training_state.env_steps))
    # Fresh eval key chain: each eval gets an independent split (brax
    # re-splits per eval); a fixed key would make all evals of a run share
    # identical reset states and noise streams.
    eval_rng = jax.random.PRNGKey(seed + 1000)

    # Eval/hook pipelining: per eval period the HOST work (TensorBoard
    # writes, orbax checkpoint, ONNX export in policy_params_fn) runs while
    # the DEVICE computes the *next* epoch's chunks. stage_eval_and_hooks
    # enqueues the eval computation (device, FIFO ahead of the next chunks)
    # and snapshots the training state to host BEFORE the next epoch_fn call
    # donates those buffers; flush_pending then does the host-side work
    # after the next chunks have been dispatched. Serialized host time per
    # eval drops to two small transfers (params + eval scalars).
    pending = None  # (step, metrics, eval_future, variables_host, state_host)

    def stage_eval_and_hooks(ts):
        nonlocal pending, eval_rng
        variables = (ts.normalizer, ts.params)
        eval_future = None
        if evaluator is not None:
            eval_rng, rng_eval = jax.random.split(eval_rng)
            eval_future = evaluator(variables, rng_eval)
        pending = (
            current_step,
            dict(all_metrics),
            eval_future,
            jax.device_get(variables),
            jax.device_get((ts, epoch_key)),
        )

    def flush_pending():
        nonlocal pending
        if pending is None:
            return
        step, metrics, eval_future, variables_host, state_host = pending
        pending = None
        if eval_future is not None:
            metrics.update(jax.device_get(eval_future))
        progress_fn(step, metrics)
        policy_params_fn(
            step, make_policy, variables_host, full_state=state_host
        )

    # eval before any training (brax does an initial eval when num_evals > 1)
    if num_evals > 1:
        stage_eval_and_hooks(training_state)

    while current_step < num_timesteps:
        t0 = time.monotonic()
        chunk_metrics = []
        for _ in range(n_chunks):
            training_state, env_state, epoch_key, metrics = epoch_fn(
                training_state, env_state, epoch_key
            )
            chunk_metrics.append(metrics)
        flush_pending()  # previous period's host work, overlapped
        # mean over chunks so the logged epoch metrics cover the whole
        # per-eval period, not just the last jitted chunk
        metrics = jax.device_get(
            jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs)), *chunk_metrics)
        )
        current_step = int(jax.device_get(training_state.env_steps))
        dt = time.monotonic() - t0
        sps = chunk_steps * n_chunks * steps_per_training_step / dt
        all_metrics = {f"training/{k}": float(v) for k, v in metrics.items()}
        all_metrics["training/sps"] = sps
        stage_eval_and_hooks(training_state)

    flush_pending()
    variables = jax.device_get((training_state.normalizer, training_state.params))
    return make_policy, variables, all_metrics
