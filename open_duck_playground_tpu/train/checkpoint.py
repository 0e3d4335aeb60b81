"""Orbax checkpointing of (normalizer, params), path layout matching the
reference (`<outdir>/<YYYY_MM_DD_HHMMSS>_<step>`, runner.py:68-76) so resume
flags behave identically."""

from __future__ import annotations

import pathlib

import jax
import orbax.checkpoint as ocp


def save(path: str | pathlib.Path, variables) -> None:
    path = pathlib.Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, variables, force=True)


def restore(path: str | pathlib.Path, target=None):
    path = pathlib.Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, args=ocp.args.PyTreeRestore(item=target))
    return ckptr.restore(path)


def save_training_state(path: str | pathlib.Path, training_state, epoch_key) -> None:
    """Full-fidelity checkpoint: params + normalizer + Adam moments +
    env-step counter + the epoch RNG key, so a resumed run continues
    training exactly (not just inference). Layout is a dict so
    `restore_training_state` can distinguish it from the legacy
    (normalizer, params) tuple."""
    save(
        path,
        {
            "normalizer": training_state.normalizer,
            "params": training_state.params,
            "opt_state": training_state.opt_state,
            "env_steps": training_state.env_steps,
            "epoch_key": epoch_key,
        },
    )


def restore_training_state(path: str | pathlib.Path, training_state, tx):
    """Returns (training_state, epoch_key_or_None). Accepts both the full
    dict layout written by `save_training_state` (Adam moments and step
    counter continue) and the legacy / reference-parity (normalizer, params)
    tuple (optimizer state re-initialized, steps zeroed)."""
    raw = restore(path)
    if isinstance(raw, dict) and "opt_state" in raw:
        target = {
            "normalizer": training_state.normalizer,
            "params": training_state.params,
            "opt_state": training_state.opt_state,
            "env_steps": training_state.env_steps,
            "epoch_key": jax.random.PRNGKey(0),
        }
        full = restore(path, target)
        ts = training_state.replace(
            normalizer=full["normalizer"],
            params=full["params"],
            opt_state=full["opt_state"],
            env_steps=full["env_steps"],
        )
        return ts, full["epoch_key"]
    normalizer, params = restore(
        path, (training_state.normalizer, training_state.params)
    )
    ts = training_state.replace(
        normalizer=normalizer, params=params, opt_state=tx.init(params)
    )
    return ts, None
