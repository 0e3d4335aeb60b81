"""Training CLI.

Reference parity: `playground/common/runner.py` +
`playground/open_duck_mini_v2/runner.py` — same flags
(--env --task --num_timesteps --output_dir --restore_checkpoint_path), same
side effects (TensorBoard scalars, orbax checkpoint + ONNX export per eval).

    python -m open_duck_playground_tpu.cli.runner \
        --env joystick --task flat_terrain_backlash --num_timesteps 300000000
"""

from __future__ import annotations

import argparse
import functools
import os
from datetime import datetime
from pathlib import Path

from open_duck_playground_tpu.train.config import ppo_config

ENVS = {"joystick": None, "standing": None}  # resolved lazily (heavy imports)


def build_env(name: str, task: str, config_overrides=None):
    if name == "joystick":
        from open_duck_playground_tpu.envs.joystick import Joystick

        return Joystick(task=task, config_overrides=config_overrides)
    if name == "standing":
        from open_duck_playground_tpu.envs.standing import Standing

        return Standing(task=task, config_overrides=config_overrides)
    raise ValueError(f"unknown env {name!r}; choose from {sorted(ENVS)}")


def parse_overrides(pairs):
    """--config_override dotted.key=value pairs -> flattened-dict overrides
    for ConfigDict.update_from_flattened_dict (the same plumbing the task
    constructors expose, reference joystick.py:112-118)."""
    import ast

    out = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        if not _:
            raise ValueError(f"--config_override needs key=value, got {pair!r}")
        try:
            out[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            out[key] = val  # plain string
    return out or None


class Runner:
    def __init__(self, args: argparse.Namespace):
        self.args = args
        self.output_dir = Path.cwd() / Path(args.output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)

        os.makedirs(".tmp", exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", ".tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(log_dir=str(self.output_dir))
        except ImportError:  # pragma: no cover
            self.writer = None

        overrides = parse_overrides(getattr(args, "config_override", None))
        # --config_override keys that name PPO config fields (num_evals,
        # batch_size, bf16_matmuls, ...) route to the PPO config; everything
        # else (dotted env keys like reward_config.scales.*) to the env
        ppo_overrides = {}
        if overrides:
            # num_timesteps/seed have dedicated CLI flags, which win
            ppo_fields = set(ppo_config()) - {"num_timesteps", "seed"}
            for k in [k for k in overrides if k in ppo_fields]:
                ppo_overrides[k] = overrides.pop(k)
            overrides = overrides or None
        self.env = build_env(args.env, args.task, overrides)
        self.eval_env = build_env(args.env, args.task, overrides)
        from open_duck_playground_tpu.envs.randomize import domain_randomize

        self.randomizer = domain_randomize
        self.num_timesteps = args.num_timesteps
        self.restore_checkpoint_path = args.restore_checkpoint_path
        # Bound single-device-execution time (train/ppo.py chunking) to a
        # ~30s budget at the measured per-path step rates: flat megakernel
        # ~285k steps/s, hfield megakernel ~160k, jnp fallback ~25k.
        self.max_env_steps_per_jit = args.max_env_steps_per_jit
        if self.max_env_steps_per_jit is None:
            if not getattr(self.env, "use_megakernel", False):
                self.max_env_steps_per_jit = 1_000_000
            elif args.task.startswith("rough"):
                self.max_env_steps_per_jit = 4_000_000
            else:
                self.max_env_steps_per_jit = 8_192_000
        self.ppo_params = ppo_config(
            num_timesteps=args.num_timesteps,
            seed=getattr(args, "seed", 0),
            **ppo_overrides,
        )
        self.action_size = self.env.action_size
        self.obs_size = None  # filled in train()

    def progress_callback(self, num_steps: int, metrics: dict) -> None:
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(k, float(v), num_steps)
        if "eval/episode_reward" in metrics:
            print("-----------")
            print(
                f"STEP: {num_steps} reward: {metrics['eval/episode_reward']}"
                f" reward_std: {metrics['eval/episode_reward_std']}"
            )
            print("-----------")

    def policy_params_fn(
        self, current_step, make_policy, variables, full_state=None
    ) -> None:
        del make_policy
        from open_duck_playground_tpu.train import checkpoint as CKPT

        d = datetime.now().strftime("%Y_%m_%d_%H%M%S")
        path = self.output_dir / f"{d}_{current_step}"
        print(f"Saving checkpoint (step: {current_step}): {path}")
        if full_state is not None:
            # full training state (params + Adam moments + step counter +
            # epoch key) so --restore_checkpoint_path resumes training
            # exactly, not just the policy weights
            training_state, epoch_key = full_state
            CKPT.save_training_state(path, training_state, epoch_key)
        else:
            CKPT.save(path, variables)
        try:
            from open_duck_playground_tpu.export.onnx_export import export_policy

            export_policy(
                variables,
                self.action_size,
                self.ppo_params,
                self.obs_size,
                output_path=str(self.output_dir / f"{d}_{current_step}.onnx"),
            )
        except Exception as e:  # pragma: no cover
            print(f"ONNX export skipped: {e}")

    def train(self) -> None:
        from open_duck_playground_tpu.train import ppo

        cfg = dict(self.ppo_params)
        net = cfg.pop("network_factory")
        cfg.pop("num_timesteps")
        self.obs_size = self.env.observation_size["state"][0]

        train_fn = functools.partial(
            ppo.train,
            num_timesteps=self.num_timesteps,
            **cfg,
            policy_hidden_layer_sizes=tuple(net["policy_hidden_layer_sizes"]),
            value_hidden_layer_sizes=tuple(net["value_hidden_layer_sizes"]),
            policy_obs_key=net["policy_obs_key"],
            value_obs_key=net["value_obs_key"],
            randomization_fn=self.randomizer,
            progress_fn=self.progress_callback,
            policy_params_fn=self.policy_params_fn,
            restore_checkpoint_path=self.restore_checkpoint_path,
            max_env_steps_per_jit=self.max_env_steps_per_jit,
        )
        _, params, _ = train_fn(environment=self.env, eval_env=self.eval_env)
        return params


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Open Duck Mini V2 TPU trainer")
    parser.add_argument("-o", "--output_dir", type=str, default="checkpoints")
    parser.add_argument("--num_timesteps", type=int, default=150_000_000)
    parser.add_argument("--env", type=str, default="joystick", choices=sorted(ENVS))
    parser.add_argument(
        "--task",
        type=str,
        default="flat_terrain",
        choices=[
            "flat_terrain",
            "rough_terrain",
            "flat_terrain_backlash",
            "rough_terrain_backlash",
            "flat_terrain_no_head",
        ],
    )
    parser.add_argument("--restore_checkpoint_path", type=str, default=None)
    parser.add_argument(
        "--seed",
        type=int,
        default=0,
        help="PPO RNG seed (brax ppo.train default 0); drives env resets, "
        "domain randomization, minibatch shuffling and network init",
    )
    parser.add_argument(
        "--config_override",
        action="append",
        default=None,
        metavar="KEY=VALUE",
        help="env-config override as a flattened dotted key, repeatable "
        "(e.g. --config_override push_config.magnitude_range=[0.1,0.5] "
        "--config_override reward_config.scales.tracking_lin_vel=4.0)",
    )
    parser.add_argument(
        "--max_env_steps_per_jit",
        type=int,
        default=None,
        help="env steps per jitted training chunk (default: 8.19M on flat "
        "megakernel tasks, 4M on rough/hfield megakernel tasks, 1M on the "
        "slower non-megakernel fallback path)",
    )
    args = parser.parse_args(argv)
    Runner(args).train()


if __name__ == "__main__":
    main()
