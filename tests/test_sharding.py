"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY §4:
DCN/ICI tests stubbed with xla_force_host_platform_device_count)."""

import pathlib
import sys

import jax
import numpy as np
import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

needs_virtual_mesh = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs the 8-device virtual CPU mesh (run via tests/conftest.py)",
)


def test_graft_entry_multichip_dryrun():
    # hermetic: dryrun_multichip re-execs in a JAX_PLATFORMS=cpu subprocess,
    # so it needs no particular device count in THIS process
    sys.path.insert(0, REPO)
    import __graft_entry__ as G

    G.dryrun_multichip(8)


def test_graft_entry_single():
    sys.path.insert(0, REPO)
    import __graft_entry__ as G

    from open_duck_playground_tpu.physics.megakernel import LANE_TILE

    fn, args = G.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.reward)
    # batch = LANE_TILE so the driver's compile artifact exercises the
    # production Pallas kernel path, not the jnp fallback
    assert out.reward.shape == (LANE_TILE,)
    assert np.isfinite(np.asarray(out.reward)).all()
