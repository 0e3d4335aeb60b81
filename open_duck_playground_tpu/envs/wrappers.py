"""Training wrappers: episode bookkeeping, env-batch vmap (with optional
domain-randomized batched model), cached-state autoreset, and episodic eval
metrics.

Replaces mujoco_playground's `wrapper.wrap_for_brax_training` stack
(reference runner.py:117): Episode -> Vmap/DomainRandomization -> AutoReset,
plus brax's EvalWrapper for the evaluator. All state lives in `State.info`;
everything is pure and pjit/vmap friendly.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.envs.env_types import State


def _where_done(done, x, y):
    """Select x where done (per-env leading axis) else y."""
    def sel(a, b):
        d = done.reshape(done.shape + (1,) * (a.ndim - done.ndim))
        return jnp.where(d, a, b)

    return jax.tree.map(sel, x, y)


def _env_finite(state: State) -> jnp.ndarray:
    """(num_envs,) bool: True where obs and physics state are all finite.

    The env's own NaN-guard termination flags the episode done, but the
    non-finite obs of that step would still flow into the next transition
    (and from there permanently poison the running normalizer and the loss)
    unless the wrapper quarantines it here."""
    leaves = jax.tree.leaves((state.obs, state.data.qpos, state.data.qvel))
    flags = [
        jnp.isfinite(leaf).reshape(leaf.shape[0], -1).all(axis=1)
        for leaf in leaves
    ]
    return jnp.stack(flags, axis=0).all(axis=0)


class TrainingEnv:
    """Batched training env: episode truncation at `episode_length`,
    autoreset to the cached initial state, optional per-env randomized model.

    reset(rng: (num_envs,) keys) -> batched State
    step(state, action: (num_envs, act)) -> batched State
    """

    def __init__(
        self,
        env,
        episode_length: int,
        action_repeat: int = 1,
        randomization_fn: Optional[Callable] = None,
        rng: Optional[jax.Array] = None,
        num_envs: Optional[int] = None,
    ):
        self._env = env
        self._episode_length = episode_length
        self._action_repeat = action_repeat
        if randomization_fn is not None:
            keys = jax.random.split(rng, num_envs)
            self._batched_model, model_axes = randomization_fn(env.model, keys)
            self._model_axes = model_axes
        else:
            self._batched_model = env.model
            self._model_axes = None

    @property
    def env(self):
        return self._env

    @property
    def action_size(self):
        return self._env.action_size

    def reset(self, rng: jax.Array) -> State:
        reset_one = lambda model, key: self._env.reset(key, model=model)
        state = jax.vmap(reset_one, in_axes=(self._model_axes, 0))(
            self._batched_model, rng
        )
        # finite floor: if a pathological randomized model makes reset's
        # forward pass blow up, nan_to_num the state rather than caching NaN
        # as the autoreset target (which would poison every later step of
        # that env — the step-time quarantine recycles first_obs/first_data)
        bad = ~_env_finite(state)

        def fix(a):
            if not jnp.issubdtype(a.dtype, jnp.floating):
                return a
            d = bad.reshape(bad.shape + (1,) * (a.ndim - bad.ndim))
            return jnp.where(d, jnp.nan_to_num(a), a)

        state = state.replace(
            data=jax.tree.map(fix, state.data), obs=jax.tree.map(fix, state.obs)
        )

        info = dict(state.info)
        info["steps"] = jnp.zeros(rng.shape[0], jnp.float32)
        info["truncation"] = jnp.zeros(rng.shape[0], jnp.float32)
        # cache the post-reset state for autoreset
        info["first_data"] = state.data
        info["first_obs"] = state.obs
        return state.replace(info=info)

    def step(self, state: State, action: jnp.ndarray) -> State:
        info = dict(state.info)
        first_data = info.pop("first_data")
        first_obs = info.pop("first_obs")
        steps_prev = info.pop("steps")
        info.pop("truncation")

        # autoreset happens on the step *after* done was reported
        done_prev = state.done
        data = _where_done(done_prev, first_data, state.data)
        obs = _where_done(done_prev, first_obs, state.obs)
        steps_prev = jnp.where(done_prev, 0.0, steps_prev)
        state = state.replace(data=data, obs=obs, info=info)

        step_one = lambda model, s, a: self._env.step(s, a, model=model)
        nstate = state
        for _ in range(self._action_repeat):
            nstate = jax.vmap(step_one, in_axes=(self._model_axes, 0, 0))(
                self._batched_model, nstate, action
            )

        # quarantine non-finite envs: replace their post-step obs/physics
        # state with the cached reset state and terminate, so no NaN/inf ever
        # reaches the rollout buffer (normalizer + loss stay finite even if
        # the solver blows up in a pathological contact state)
        bad = ~_env_finite(nstate)

        def _sanitize(tree):  # nan_to_num float leaves of bad envs only
            def fix(a):
                if not jnp.issubdtype(a.dtype, jnp.floating):
                    return a
                d = bad.reshape(bad.shape + (1,) * (a.ndim - bad.ndim))
                return jnp.where(d, jnp.nan_to_num(a), a)

            return jax.tree.map(fix, tree)

        nstate = nstate.replace(
            data=_where_done(bad, first_data, nstate.data),
            obs=_where_done(bad, first_obs, nstate.obs),
            reward=jnp.where(bad, jnp.zeros_like(nstate.reward), nstate.reward),
            done=jnp.where(bad, jnp.ones_like(nstate.done), nstate.done),
            info=_sanitize(nstate.info),
            metrics=_sanitize(nstate.metrics),
        )

        steps = steps_prev + self._action_repeat
        at_limit = steps >= self._episode_length
        done = jnp.where(at_limit, jnp.ones_like(nstate.done), nstate.done)
        truncation = at_limit * (1 - nstate.done)

        info = dict(nstate.info)
        info["steps"] = steps
        info["truncation"] = truncation
        info["first_data"] = first_data
        info["first_obs"] = first_obs
        return nstate.replace(done=done, info=info)


class EvalEnv(TrainingEnv):
    """Adds per-episode metric accumulation (brax EvalWrapper semantics):
    rewards/lengths accumulate until the first done, then freeze."""

    def reset(self, rng: jax.Array) -> State:
        state = super().reset(rng)
        info = dict(state.info)
        info["eval_metrics"] = {
            "episode_reward": jnp.zeros(rng.shape[0], jnp.float32),
            "episode_length": jnp.zeros(rng.shape[0], jnp.float32),
            "episode_done": jnp.zeros(rng.shape[0], jnp.float32),
            # per-episode SUMS of every env metric (brax EvalWrapper
            # semantics); the evaluator divides by episode_length where a
            # per-step mean is the meaningful reading (tracking errors)
            "episode_metrics": jax.tree.map(
                lambda x: jnp.zeros(rng.shape[0], jnp.float32), state.metrics
            ),
        }
        return state.replace(info=info)

    def step(self, state: State, action: jnp.ndarray) -> State:
        info = dict(state.info)
        em = info.pop("eval_metrics")
        state = state.replace(info=info)
        nstate = super().step(state, action)
        alive = 1.0 - em["episode_done"]
        em = {
            "episode_reward": em["episode_reward"] + alive * nstate.reward,
            "episode_length": em["episode_length"] + alive,
            "episode_done": jnp.maximum(em["episode_done"], nstate.done),
            "episode_metrics": jax.tree.map(
                lambda acc, v: acc + alive * v,
                em["episode_metrics"],
                nstate.metrics,
            ),
        }
        ninfo = dict(nstate.info)
        ninfo["eval_metrics"] = em
        return nstate.replace(info=ninfo)
