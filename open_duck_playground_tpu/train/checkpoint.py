"""Orbax checkpointing of (normalizer, params), path layout matching the
reference (`<outdir>/<YYYY_MM_DD_HHMMSS>_<step>`, runner.py:68-76) so resume
flags behave identically."""

from __future__ import annotations

import pathlib

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
