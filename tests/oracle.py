"""Shared helpers for C-MuJoCo-oracle physics tests."""

import jax.numpy as jnp
import mujoco
import numpy as np

from open_duck_playground_tpu.physics.types import Contact


def randomized_state(mj, d, rng, z_offset=0.0, vel_scale=0.5):
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    d.qpos[:] += rng.uniform(-0.05, 0.05, mj.nq)
    d.qpos[2] += z_offset
    d.qpos[3:7] /= np.linalg.norm(d.qpos[3:7])
    d.qvel[:] = rng.uniform(-vel_scale, vel_scale, mj.nv)
    d.ctrl[:] = rng.uniform(-0.3, 0.3, mj.nu)
    d.qacc_warmstart[:] = 0


def oracle_contacts(mj, d, feet_geoms=(18, 43), k=4, dtype=jnp.float64):
    """Pack C-MuJoCo's contacts into our fixed-slot Contact layout so solver
    parity can be tested independently of contact-point selection policy."""
    nfoot = len(feet_geoms)
    n = nfoot * k
    dist = np.ones(n)
    pos = np.zeros((n, 3))
    frame = np.tile(np.eye(3), (n, 1, 1))
    fric = np.tile(np.array([0.6, 0.6, 0.005]), (n, 1))
    sref = np.tile(np.array([0.02, 1.0]), (n, 1))
    simp = np.tile(np.array([0.9, 0.95, 0.001, 0.5, 2.0]), (n, 1))
    base = {g: i * k for i, g in enumerate(feet_geoms)}
    used = {g: 0 for g in feet_geoms}
    for c in range(d.ncon):
        con = d.contact[c]
        i = base[con.geom2] + used[con.geom2]
        used[con.geom2] += 1
        dist[i] = con.dist
        pos[i] = con.pos
        frame[i] = con.frame.reshape(3, 3)
        fric[i, :2] = con.friction[:2]
        sref[i] = con.solref
        simp[i] = con.solimp
    foot_ix = np.repeat(np.arange(nfoot), k)
    return Contact(
        dist=jnp.asarray(dist, dtype),
        pos=jnp.asarray(pos, dtype),
        frame=jnp.asarray(frame, dtype),
        friction=jnp.asarray(fric, dtype),
        solref=jnp.asarray(sref, dtype),
        solimp=jnp.asarray(simp, dtype),
        foot_index=jnp.asarray(foot_ix),
    )
