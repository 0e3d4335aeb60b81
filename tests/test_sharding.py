"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY §4:
DCN/ICI tests stubbed with xla_force_host_platform_device_count)."""

import sys

import jax
import numpy as np


def test_graft_entry_multichip_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as G

    assert jax.device_count() == 8
    G.dryrun_multichip(8)


def test_graft_entry_single():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as G

    fn, args = G.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.reward)
    assert out.reward.shape == (64,)
    assert np.isfinite(np.asarray(out.reward)).all()
