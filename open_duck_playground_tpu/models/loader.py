"""Host-side MJCF ingestion: compile with C-MuJoCo, freeze to a device Model.

This is the host->device boundary of the framework (the analogue of
`mujoco.MjModel.from_xml_string` + `mjx.put_model` in the reference,
`base.py:53-61`). C-MuJoCo only ever runs on the host at construction time;
everything downstream is our own JAX/XLA code.
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional, Tuple

import mujoco
import numpy as np
import jax.numpy as jnp

from open_duck_playground_tpu.physics.types import FREE, HINGE, Model, ModelSpec

_SENSOR_KINDS = {
    mujoco.mjtSensor.mjSENS_GYRO: "gyro",
    mujoco.mjtSensor.mjSENS_VELOCIMETER: "velocimeter",
    mujoco.mjtSensor.mjSENS_ACCELEROMETER: "accelerometer",
    mujoco.mjtSensor.mjSENS_FRAMEZAXIS: "framezaxis",
    mujoco.mjtSensor.mjSENS_FRAMEXAXIS: "framexaxis",
    mujoco.mjtSensor.mjSENS_FRAMELINVEL: "framelinvel",
    mujoco.mjtSensor.mjSENS_FRAMEANGVEL: "frameangvel",
    mujoco.mjtSensor.mjSENS_FRAMEPOS: "framepos",
    mujoco.mjtSensor.mjSENS_FRAMEQUAT: "framequat",
}


def load_assets(xml_dir: pathlib.Path) -> Dict[str, bytes]:
    """Collect all files the scene may reference, keyed by basename (MuJoCo
    resolves VFS entries by stripped filename)."""
    assets: Dict[str, bytes] = {}
    for p in sorted(xml_dir.glob("*.xml")):
        assets[p.name] = p.read_bytes()
    adir = xml_dir / "assets"
    if adir.is_dir():
        for p in sorted(adir.iterdir()):
            if p.is_file():
                assets[p.name] = p.read_bytes()
    return assets


def compile_mjcf(xml_path: str | pathlib.Path, timestep: Optional[float] = None) -> mujoco.MjModel:
    xml_path = pathlib.Path(xml_path)
    mj_model = mujoco.MjModel.from_xml_string(
        xml_path.read_text(), load_assets(xml_path.parent)
    )
    if timestep is not None:
        mj_model.opt.timestep = timestep
    return mj_model


def _hull_vertices(mj: mujoco.MjModel, geom_id: int) -> np.ndarray:
    """Convex-hull vertices of a mesh geom, in the geom frame (compiler already
    folds the mesh centering transform into geom_pos/quat)."""
    mesh_id = mj.geom_dataid[geom_id]
    vadr = mj.mesh_vertadr[mesh_id]
    vnum = mj.mesh_vertnum[mesh_id]
    verts = mj.mesh_vert[vadr : vadr + vnum].copy()
    gadr = mj.mesh_graphadr[mesh_id]
    if gadr >= 0:
        # mesh_graph layout: numvert, numface, vert_edgeadr(nv), vert_globalid(nv), ...
        graph = mj.mesh_graph[gadr:]
        numvert = int(graph[0])
        globalid = graph[2 + numvert : 2 + 2 * numvert]
        verts = verts[np.asarray(globalid)]
    return verts


def put_model(
    mj: mujoco.MjModel,
    dtype=jnp.float32,
    points_per_foot: int = 4,
) -> Model:
    """Freeze a compiled MjModel into the immutable device Model pytree."""
    for jt in mj.jnt_type:
        if jt not in (FREE, HINGE):
            raise NotImplementedError(f"joint type {jt} unsupported")
    if mj.neq or mj.ntendon:
        raise NotImplementedError("equality/tendon constraints unsupported")
    for i in range(mj.nu):
        if mj.actuator_trntype[i] != mujoco.mjtTrn.mjTRN_JOINT:
            raise NotImplementedError("only joint-transmission actuators")
        if mj.actuator_dyntype[i] != mujoco.mjtDyn.mjDYN_NONE:
            raise NotImplementedError("only stateless actuators")

    # --- collision world: convex foot hulls vs a single floor (plane|hfield)
    collide = [
        g
        for g in range(mj.ngeom)
        if (mj.geom_contype[g] or mj.geom_conaffinity[g])
    ]
    feet, floor, floor_is_hfield = [], -1, False
    for g in collide:
        t = mj.geom_type[g]
        if t == mujoco.mjtGeom.mjGEOM_MESH:
            feet.append(g)
        elif t == mujoco.mjtGeom.mjGEOM_PLANE:
            floor = g
        elif t == mujoco.mjtGeom.mjGEOM_HFIELD:
            floor, floor_is_hfield = g, True
        else:
            raise NotImplementedError(f"colliding geom type {t} unsupported")
    if floor < 0 or not feet:
        raise NotImplementedError("expected foot meshes + one floor geom")

    hulls = [_hull_vertices(mj, g) for g in feet]
    nvert = max(h.shape[0] for h in hulls)
    foot_hull = np.stack(
        [np.pad(h, ((0, nvert - h.shape[0]), (0, 0)), mode="edge") for h in hulls]
    )

    if floor_is_hfield:
        hid = mj.geom_dataid[floor]
        nrow, ncol = int(mj.hfield_nrow[hid]), int(mj.hfield_ncol[hid])
        hfield_data = mj.hfield_data[
            mj.hfield_adr[hid] : mj.hfield_adr[hid] + nrow * ncol
        ].reshape(nrow, ncol)
        hfield_size = mj.hfield_size[hid].copy()
    else:
        nrow = ncol = 1
        hfield_data = np.zeros((1, 1))
        hfield_size = np.zeros(4)

    # --- ancestry mask: dof d moves body b
    parent = mj.body_parentid
    mask = np.zeros((mj.nbody, mj.nv), dtype=bool)
    for b in range(mj.nbody):
        anc = b
        chain = []
        while anc != 0:
            chain.append(anc)
            anc = parent[anc]
        for d in range(mj.nv):
            if mj.dof_bodyid[d] in chain:
                mask[b, d] = True

    sensors = tuple(
        (
            _SENSOR_KINDS[mujoco.mjtSensor(mj.sensor_type[i])],
            int(mj.sensor_objid[i]),
            int(mj.sensor_adr[i]),
            int(mj.sensor_dim[i]),
        )
        for i in range(mj.nsensor)
    )

    spec = ModelSpec(
        nq=int(mj.nq),
        nv=int(mj.nv),
        nu=int(mj.nu),
        nbody=int(mj.nbody),
        njnt=int(mj.njnt),
        ngeom=int(mj.ngeom),
        nsite=int(mj.nsite),
        nsensordata=int(mj.nsensordata),
        jnt_type=tuple(int(x) for x in mj.jnt_type),
        jnt_bodyid=tuple(int(x) for x in mj.jnt_bodyid),
        jnt_qposadr=tuple(int(x) for x in mj.jnt_qposadr),
        jnt_dofadr=tuple(int(x) for x in mj.jnt_dofadr),
        jnt_limited=tuple(bool(x) for x in mj.jnt_limited),
        body_parentid=tuple(int(x) for x in mj.body_parentid),
        body_jntadr=tuple(int(x) for x in mj.body_jntadr),
        body_jntnum=tuple(int(x) for x in mj.body_jntnum),
        dof_bodyid=tuple(int(x) for x in mj.dof_bodyid),
        dof_jntid=tuple(int(x) for x in mj.dof_jntid),
        friction_dofs=tuple(
            int(i) for i in range(mj.nv) if mj.dof_frictionloss[i] > 0
        ),
        actuator_trnid=tuple(int(x) for x in mj.actuator_trnid[:, 0]),
        site_bodyid=tuple(int(x) for x in mj.site_bodyid),
        geom_bodyid=tuple(int(x) for x in mj.geom_bodyid),
        sensors=sensors,
        collide_geom_ids=tuple(feet),
        floor_geom_id=int(floor),
        floor_is_hfield=floor_is_hfield,
        points_per_foot=points_per_foot,
        hull_nvert=int(nvert),
        hfield_nrow=nrow,
        hfield_ncol=ncol,
        timestep=float(mj.opt.timestep),
        iterations=int(mj.opt.iterations),
        ls_iterations=int(mj.opt.ls_iterations),
        impratio=float(mj.opt.impratio),
        tolerance=float(mj.opt.tolerance),
        ls_tolerance=float(mj.opt.ls_tolerance),
    )

    def arr(x):
        return jnp.asarray(np.asarray(x), dtype=dtype)

    nkey = mj.nkey
    key_qpos = mj.key_qpos[0] if nkey else mj.qpos0
    key_ctrl = mj.key_ctrl[0] if nkey else np.zeros(mj.nu)

    return Model(
        spec=spec,
        body_pos=arr(mj.body_pos),
        body_quat=arr(mj.body_quat),
        body_ipos=arr(mj.body_ipos),
        body_iquat=arr(mj.body_iquat),
        body_mass=arr(mj.body_mass),
        body_inertia=arr(mj.body_inertia),
        body_invweight0=arr(mj.body_invweight0),
        jnt_pos=arr(mj.jnt_pos),
        jnt_axis=arr(mj.jnt_axis),
        jnt_range=arr(mj.jnt_range),
        jnt_solref=arr(mj.jnt_solref),
        jnt_solimp=arr(mj.jnt_solimp),
        jnt_margin=arr(mj.jnt_margin),
        dof_armature=arr(mj.dof_armature),
        dof_damping=arr(mj.dof_damping),
        dof_frictionloss=arr(mj.dof_frictionloss),
        dof_invweight0=arr(mj.dof_invweight0),
        dof_solref=arr(mj.dof_solref),
        dof_solimp=arr(mj.dof_solimp),
        qpos0=arr(mj.qpos0),
        actuator_gainprm=arr(mj.actuator_gainprm),
        actuator_biasprm=arr(mj.actuator_biasprm),
        actuator_ctrlrange=arr(mj.actuator_ctrlrange),
        actuator_forcerange=arr(mj.actuator_forcerange),
        geom_pos=arr(mj.geom_pos),
        geom_quat=arr(mj.geom_quat),
        geom_friction=arr(mj.geom_friction),
        geom_solref=arr(mj.geom_solref),
        geom_solimp=arr(mj.geom_solimp),
        geom_priority=jnp.asarray(np.asarray(mj.geom_priority), dtype=jnp.int32),
        geom_margin=arr(mj.geom_margin),
        site_pos=arr(mj.site_pos),
        site_quat=arr(mj.site_quat),
        foot_hull=arr(foot_hull),
        hfield_data=arr(hfield_data),
        hfield_size=arr(hfield_size),
        ancestor_mask=jnp.asarray(mask),
        gravity=arr(mj.opt.gravity),
        key_qpos=arr(key_qpos),
        key_ctrl=arr(key_ctrl),
    )


def load_model(
    xml_path: str | pathlib.Path,
    timestep: Optional[float] = None,
    dtype=jnp.float32,
) -> Tuple[Model, mujoco.MjModel]:
    mj = compile_mjcf(xml_path, timestep=timestep)
    return put_model(mj, dtype=dtype), mj
