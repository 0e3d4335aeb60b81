"""Domain randomization: per-env physical-parameter perturbations producing a
batched Model (leading env axis on the randomized leaves) plus a vmap in_axes
pytree.

Behavioral spec: reference `randomize.py:26-146` — floor friction U(0.5,1.0),
frictionloss x U(0.9,1.1), armature x U(1.0,1.05), torso CoM jitter
U(-0.05,0.05), all masses x U(0.9,1.1), torso mass +U(-0.1,0.1), qpos0 jitter
U(-0.03,0.03), actuator kp x U(0.9,1.1) applied to gainprm[:,0] and
biasprm[:,1]=-kp. Backlash dofs excluded via the frictionloss>0 structural
filter (randomize.py:31-37).

Deliberate deviations: the reference hardcodes FLOOR_GEOM_ID=0 /
TORSO_BODY_ID=1 (randomize.py:22-23). Geom 0 is actually a *visual* geom in
the compiled duck (the real floor is the last geom), so upstream
floor-friction DR is a silent no-op — we target the real floor geom. Body 1
("base") is the massless freejoint stub (no inertial, no geoms): upstream's
torso CoM jitter is a no-op there, and its additive mass offset
U(-0.1, 0.1) gives the body *negative* mass on half of all draws — which
ill-conditions the mass matrix (measured qacc_smooth ~3e4 rad/s^2) and NaNs
the f32 Newton solver on the lighter no-head robot. We apply both to the
first body with positive nominal mass (trunk_assembly, the intended torso)
and clamp the randomized mass to stay positive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.physics.types import Model, RANDOMIZED_FIELDS


def domain_randomize(model: Model, rng: jax.Array):
    """rng: (num_envs, 2) key batch -> (batched model, in_axes pytree)."""
    s = model.spec
    fd = np.asarray(s.friction_dofs, dtype=np.int32)
    jnt_of_dof = [s.dof_jntid[d] for d in fd]
    qadr = np.asarray([s.jnt_qposadr[j] for j in jnt_of_dof], dtype=np.int32)
    # the torso = first body with actual mass (trunk_assembly); body 1 is the
    # massless freejoint stub (see module docstring)
    nominal_mass = np.asarray(model.body_mass)
    torso_body = int(np.argmax(nominal_mass > 1e-9))
    floor_geom = s.floor_geom_id

    ftype = model.body_mass.dtype

    @jax.vmap
    def rand(rng):
        rng, key = jax.random.split(rng)
        geom_friction = model.geom_friction.at[floor_geom, 0].set(
            jax.random.uniform(key, minval=0.5, maxval=1.0, dtype=ftype)
        )

        rng, key = jax.random.split(rng)
        fl = model.dof_frictionloss[fd] * jax.random.uniform(
            key, (len(fd),), minval=0.9, maxval=1.1, dtype=ftype
        )
        dof_frictionloss = model.dof_frictionloss.at[fd].set(fl)

        rng, key = jax.random.split(rng)
        arm = model.dof_armature[fd] * jax.random.uniform(
            key, (len(fd),), minval=1.0, maxval=1.05, dtype=ftype
        )
        dof_armature = model.dof_armature.at[fd].set(arm)

        rng, key = jax.random.split(rng)
        dpos = jax.random.uniform(key, (3,), minval=-0.05, maxval=0.05, dtype=ftype)
        body_ipos = model.body_ipos.at[torso_body].set(
            model.body_ipos[torso_body] + dpos
        )

        rng, key = jax.random.split(rng)
        dmass = jax.random.uniform(key, (s.nbody,), minval=0.9, maxval=1.1, dtype=ftype)
        body_mass = model.body_mass * dmass
        rng, key = jax.random.split(rng)
        new_torso_mass = body_mass[torso_body] + jax.random.uniform(
            key, minval=-0.1, maxval=0.1, dtype=ftype
        )
        # clamp: a non-positive body mass makes the mass matrix indefinite
        body_mass = body_mass.at[torso_body].set(
            jnp.maximum(new_torso_mass, 0.05 * model.body_mass[torso_body])
        )

        rng, key = jax.random.split(rng)
        qpos0 = model.qpos0.at[qadr].add(
            jax.random.uniform(key, (len(qadr),), minval=-0.03, maxval=0.03, dtype=ftype)
        )

        rng, key = jax.random.split(rng)
        factor = jax.random.uniform(key, (s.nu,), minval=0.9, maxval=1.1, dtype=ftype)
        kp = model.actuator_gainprm[:, 0] * factor
        actuator_gainprm = model.actuator_gainprm.at[:, 0].set(kp)
        actuator_biasprm = model.actuator_biasprm.at[:, 1].set(-kp)

        return (
            geom_friction,
            body_ipos,
            dof_frictionloss,
            dof_armature,
            body_mass,
            qpos0,
            actuator_gainprm,
            actuator_biasprm,
        )

    out = rand(rng)
    model = model.tree_replace(dict(zip(RANDOMIZED_FIELDS, out)))
    in_axes = jax.tree_util.tree_map(lambda _: None, model)
    in_axes = in_axes.tree_replace({k: 0 for k in RANDOMIZED_FIELDS})
    return model, in_axes
