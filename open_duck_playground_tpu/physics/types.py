"""Frozen device model + simulation state pytrees.

`Model` is the TPU-resident analogue of `mjx.put_model` output (reference
`base.py:61`): numeric fields are JAX arrays (the 8 domain-randomized fields of
reference `randomize.py:119-131` can carry a leading env axis and be vmapped),
while the immutable topology lives in `ModelSpec` as static Python data so XLA
sees fixed shapes and unrolled trees.

`Data` is the per-env simulation state (analogue of `mjx.Data`), kept minimal:
only fields the pipeline or the env layer actually consumes
(reference call sites: `joystick.py:392-607`).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import struct

# MuJoCo joint types we support (duck scenes use only these).
FREE = 0
HINGE = 3


@struct.dataclass
class ModelSpec:
    """Static topology — hashable, not traced."""

    nq: int = struct.field(pytree_node=False, default=0)
    nv: int = struct.field(pytree_node=False, default=0)
    nu: int = struct.field(pytree_node=False, default=0)
    nbody: int = struct.field(pytree_node=False, default=0)
    njnt: int = struct.field(pytree_node=False, default=0)
    ngeom: int = struct.field(pytree_node=False, default=0)
    nsite: int = struct.field(pytree_node=False, default=0)
    nsensordata: int = struct.field(pytree_node=False, default=0)

    jnt_type: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    jnt_bodyid: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    jnt_qposadr: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    jnt_dofadr: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    jnt_limited: Tuple[bool, ...] = struct.field(pytree_node=False, default=())

    body_parentid: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    body_jntadr: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    body_jntnum: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    dof_bodyid: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    dof_jntid: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # dofs with frictionloss > 0 at compile time (structurally static even
    # though the magnitude is domain-randomized, reference randomize.py:31-37)
    friction_dofs: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    # actuators: joint transmission only (trntype 0), one joint per actuator
    actuator_trnid: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    site_bodyid: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    geom_bodyid: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    # sensors: tuple of (kind:str, objid:int, adr:int, dim:int); kind is the
    # mujoco sensor name, objid indexes sites (all duck sensors are site-based)
    sensors: Tuple[Tuple[str, int, int, int], ...] = struct.field(
        pytree_node=False, default=()
    )

    # collision world: foot convex-hull geoms vs one floor geom
    collide_geom_ids: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    floor_geom_id: int = struct.field(pytree_node=False, default=-1)
    floor_is_hfield: bool = struct.field(pytree_node=False, default=False)
    points_per_foot: int = struct.field(pytree_node=False, default=4)
    hull_nvert: int = struct.field(pytree_node=False, default=0)
    hfield_nrow: int = struct.field(pytree_node=False, default=0)
    hfield_ncol: int = struct.field(pytree_node=False, default=0)

    # options (mirrors mjOption relevant subset)
    timestep: float = struct.field(pytree_node=False, default=0.002)
    iterations: int = struct.field(pytree_node=False, default=1)
    ls_iterations: int = struct.field(pytree_node=False, default=5)
    impratio: float = struct.field(pytree_node=False, default=1.0)
    tolerance: float = struct.field(pytree_node=False, default=1e-8)
    ls_tolerance: float = struct.field(pytree_node=False, default=0.01)

    @property
    def ncon_max(self) -> int:
        return len(self.collide_geom_ids) * self.points_per_foot


@struct.dataclass
class Model:
    """Device-resident model. Fields listed in RANDOMIZED_FIELDS may carry a
    leading env batch axis (use `parallel.vmap_model_axes`)."""

    spec: ModelSpec = struct.field(pytree_node=False, default=None)

    body_pos: jnp.ndarray = None  # (nbody, 3) frame offset in parent
    body_quat: jnp.ndarray = None  # (nbody, 4)
    body_ipos: jnp.ndarray = None  # (nbody, 3) CoM in body frame
    body_iquat: jnp.ndarray = None  # (nbody, 4) inertia frame in body frame
    body_mass: jnp.ndarray = None  # (nbody,)
    body_inertia: jnp.ndarray = None  # (nbody, 3) principal moments
    body_invweight0: jnp.ndarray = None  # (nbody, 2)

    jnt_pos: jnp.ndarray = None  # (njnt, 3) anchor in body frame
    jnt_axis: jnp.ndarray = None  # (njnt, 3)
    jnt_range: jnp.ndarray = None  # (njnt, 2)
    jnt_solref: jnp.ndarray = None  # (njnt, 2)
    jnt_solimp: jnp.ndarray = None  # (njnt, 5)
    jnt_margin: jnp.ndarray = None  # (njnt,)

    dof_armature: jnp.ndarray = None  # (nv,)
    dof_damping: jnp.ndarray = None  # (nv,)
    dof_frictionloss: jnp.ndarray = None  # (nv,)
    dof_invweight0: jnp.ndarray = None  # (nv,)
    dof_solref: jnp.ndarray = None  # (nv, 2)
    dof_solimp: jnp.ndarray = None  # (nv, 5)

    qpos0: jnp.ndarray = None  # (nq,)

    actuator_gainprm: jnp.ndarray = None  # (nu, 10)
    actuator_biasprm: jnp.ndarray = None  # (nu, 10)
    actuator_ctrlrange: jnp.ndarray = None  # (nu, 2)
    actuator_forcerange: jnp.ndarray = None  # (nu, 2)

    geom_pos: jnp.ndarray = None  # (ngeom, 3)
    geom_quat: jnp.ndarray = None  # (ngeom, 4)
    geom_friction: jnp.ndarray = None  # (ngeom, 3)
    geom_solref: jnp.ndarray = None  # (ngeom, 2)
    geom_solimp: jnp.ndarray = None  # (ngeom, 5)
    geom_priority: jnp.ndarray = None  # (ngeom,) int
    geom_margin: jnp.ndarray = None  # (ngeom,)

    site_pos: jnp.ndarray = None  # (nsite, 3)
    site_quat: jnp.ndarray = None  # (nsite, 4)

    # convex hull vertices of each colliding foot geom, in geom frame
    foot_hull: jnp.ndarray = None  # (nfoot, hull_nvert, 3)
    hfield_data: jnp.ndarray = None  # (nrow, ncol) normalized heights, or (1,1)
    hfield_size: jnp.ndarray = None  # (4,) x-half, y-half, ztop, zbottom

    # ancestry mask: dof j moves body b  ->  (nbody, nv) {0,1}
    ancestor_mask: jnp.ndarray = None

    gravity: jnp.ndarray = None  # (3,)

    key_qpos: jnp.ndarray = None  # (nq,) "home" keyframe
    key_ctrl: jnp.ndarray = None  # (nu,)

    @property
    def nq(self) -> int:
        return self.spec.nq

    @property
    def nv(self) -> int:
        return self.spec.nv

    @property
    def nu(self) -> int:
        return self.spec.nu

    @property
    def nbody(self) -> int:
        return self.spec.nbody

    def tree_replace(self, updates: dict) -> "Model":
        out = self
        for k, v in updates.items():
            out = out.replace(**{k: v})
        return out


# Fields domain randomization is allowed to batch over envs
# (reference randomize.py:119-131, plus qpos0 / gainprm / biasprm semantics).
RANDOMIZED_FIELDS = (
    "geom_friction",
    "body_ipos",
    "dof_frictionloss",
    "dof_armature",
    "body_mass",
    "qpos0",
    "actuator_gainprm",
    "actuator_biasprm",
)


@struct.dataclass
class Contact:
    """Fixed-slot contact set: points_per_foot slots per foot geom."""

    dist: jnp.ndarray  # (ncon,) signed distance (<0 means penetrating)
    pos: jnp.ndarray  # (ncon, 3)
    frame: jnp.ndarray  # (ncon, 3, 3) rows: normal, tangent1, tangent2
    friction: jnp.ndarray  # (ncon, 3) sliding/torsional/rolling (cols 0..2)
    solref: jnp.ndarray  # (ncon, 2)
    solimp: jnp.ndarray  # (ncon, 5)
    foot_index: jnp.ndarray = None  # (ncon,) static map slot->foot


@struct.dataclass
class Data:
    """Per-env simulation state + the forward-pass products the env layer
    reads (reference call sites joystick.py:392-607). Internal pipeline
    quantities (xpos, cdof, efc arrays, ...) are intentionally NOT stored:
    they are recomputed each substep and keeping them out of the state slims
    the rollout carry and defines the megakernel's output contract."""

    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nv,)
    ctrl: jnp.ndarray  # (nu,)
    qacc: jnp.ndarray  # (nv,)
    qacc_warmstart: jnp.ndarray  # (nv,)

    site_xpos: jnp.ndarray = None  # (nsite, 3)
    site_xmat: jnp.ndarray = None  # (nsite, 3, 3)
    actuator_force: jnp.ndarray = None  # (nu,) scalar transmission forces
    contact_dist: jnp.ndarray = None  # (ncon,) fixed-slot contact distances
    sensordata: jnp.ndarray = None  # (nsensordata,)
