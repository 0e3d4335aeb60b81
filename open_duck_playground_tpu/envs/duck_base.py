"""Open Duck Mini V2 env base: model loading, name->index resolution,
qpos/qvel slicing, sensor accessors.

Behavioral spec: reference `base.py:41-291` + `constants.py`. Construction is
host-side (C-MuJoCo name lookups); everything returned to callers is static
numpy indices or pure jax functions.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, Optional, Union

import jax.numpy as jnp
import mujoco
import numpy as np
from ml_collections import config_dict

from open_duck_playground_tpu.models.loader import load_model
from open_duck_playground_tpu.physics.types import Data, Model

ROOT_PATH = pathlib.Path(__file__).resolve().parents[1] / "models" / "open_duck_mini_v2"
XML_DIR = ROOT_PATH / "xmls"
GAIT_PKL = ROOT_PATH / "data" / "polynomial_coefficients.pkl"

TASKS = {
    "flat_terrain": XML_DIR / "scene_flat_terrain.xml",
    "rough_terrain": XML_DIR / "scene_rough_terrain.xml",
    "flat_terrain_backlash": XML_DIR / "scene_flat_terrain_backlash.xml",
    "rough_terrain_backlash": XML_DIR / "scene_rough_terrain_backlash.xml",
    # no-head robot build (reference README.md:63 lists the variant; upstream
    # never shipped the XML — generated here by tools/gen_no_head_xml.py)
    "flat_terrain_no_head": XML_DIR / "scene_flat_terrain_no_head.xml",
}

FEET_SITES = ["left_foot", "right_foot"]
FEET_GEOMS = ["left_foot_bottom_tpu", "right_foot_bottom_tpu"]
ROOT_BODY = "trunk_assembly"
JOINTS_ORDER_NO_HEAD = [
    "left_hip_yaw", "left_hip_roll", "left_hip_pitch", "left_knee", "left_ankle",
    "right_hip_yaw", "right_hip_roll", "right_hip_pitch", "right_knee", "right_ankle",
]

GRAVITY_SENSOR = "upvector"
GLOBAL_LINVEL_SENSOR = "global_linvel"
GLOBAL_ANGVEL_SENSOR = "global_angvel"
LOCAL_LINVEL_SENSOR = "local_linvel"
ACCELEROMETER_SENSOR = "accelerometer"
GYRO_SENSOR = "gyro"


def task_to_xml(task_name: str) -> pathlib.Path:
    return TASKS[task_name]


class DuckEnv:
    """Host-side env object; reset/step (defined by subclasses) are pure."""

    def __init__(
        self,
        xml_path: str | pathlib.Path,
        config: config_dict.ConfigDict,
        config_overrides: Optional[Dict[str, Union[str, int, list]]] = None,
        dtype=jnp.float32,
        use_megakernel: Optional[bool] = None,
    ):
        self._config = config.lock()
        if config_overrides:
            self._config.update_from_flattened_dict(config_overrides)

        self._model, self._mj_model = load_model(
            xml_path, timestep=self._config.sim_dt, dtype=dtype
        )

        # physics backend: the Pallas megakernel on TPU (plane and
        # heightfield floors), the jnp reference engine elsewhere
        import jax

        if use_megakernel is None:
            use_megakernel = jax.default_backend() == "tpu"
        self.use_megakernel = use_megakernel
        if use_megakernel:
            from open_duck_playground_tpu.physics import megakernel as MK

            MK.prepare(self._model, self.n_substeps)
        self._xml_path = str(xml_path)
        mj = self._mj_model

        def jid(name):
            return mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT, name)

        self.actuator_names = [mj.actuator(i).name for i in range(mj.nu)]
        self.joint_names = [mj.jnt(i).name for i in range(mj.njnt)]
        self.floating_base_name = [
            mj.jnt(i).name for i in range(mj.njnt) if mj.jnt_type[i] == 0
        ][0]
        self.backlash_joint_names = [
            n
            for n in self.joint_names
            if n not in self.actuator_names and n != self.floating_base_name
        ]

        self.actuator_joint_ids = [jid(n) for n in self.actuator_names]
        self.backlash_joint_ids = [jid(n) for n in self.backlash_joint_names]
        self._actuator_qposadr = np.asarray(
            [mj.jnt_qposadr[j] for j in self.actuator_joint_ids]
        )
        self._actuator_dofadr = np.asarray(
            [mj.jnt_dofadr[j] for j in self.actuator_joint_ids]
        )
        self._backlash_qposadr = np.asarray(
            [mj.jnt_qposadr[j] for j in self.backlash_joint_ids], dtype=np.int32
        )
        fb = jid(self.floating_base_name)
        self._floating_base_qpos_addr = int(mj.jnt_qposadr[fb])
        self._floating_base_qvel_addr = int(mj.jnt_dofadr[fb])

        # actuators that have no paired backlash joint (head servos): positions
        # where zeros get spliced into the backlash vector (reference
        # base.py:121-125, joystick.py:538-541)
        self.backlash_idx_to_add = [
            i
            for i, n in enumerate(self.actuator_names)
            if n + "_backlash" not in self.backlash_joint_names
        ]
        # actuator slot of each backlash joint, in backlash-joint order
        self._backlash_actuator_slot = np.asarray(
            [
                self.actuator_names.index(n.removesuffix("_backlash"))
                for n in self.backlash_joint_names
            ],
            dtype=np.int32,
        )

        self._torso_body_id = mj.body(ROOT_BODY).id
        self._site_id = mj.site("imu").id
        self._feet_site_id = np.asarray([mj.site(n).id for n in FEET_SITES])
        self._floor_geom_id = mj.geom("floor").id
        self._feet_geom_id = np.asarray([mj.geom(n).id for n in FEET_GEOMS])

        adr = []
        for site in FEET_SITES:
            sid = mj.sensor(f"{site}_global_linvel").id
            a = mj.sensor_adr[sid]
            adr.append(list(range(a, a + mj.sensor_dim[sid])))
        self._foot_linvel_sensor_adr = np.asarray(adr)

        self._sensor_slices = {}
        for i in range(mj.nsensor):
            name = mj.sensor(i).name
            self._sensor_slices[name] = (
                int(mj.sensor_adr[i]),
                int(mj.sensor_adr[i] + mj.sensor_dim[i]),
            )

    # --- config-derived timing
    @property
    def sim_dt(self) -> float:
        return self._config.sim_dt

    @property
    def dt(self) -> float:
        return self._config.ctrl_dt

    @property
    def n_substeps(self) -> int:
        return int(round(self._config.ctrl_dt / self._config.sim_dt))

    @property
    def model(self) -> Model:
        return self._model

    @property
    def mj_model(self) -> mujoco.MjModel:
        return self._mj_model

    @property
    def xml_path(self) -> str:
        return self._xml_path

    @property
    def action_size(self) -> int:
        return self._model.spec.nu

    @property
    def observation_size(self):
        import jax

        st = jax.eval_shape(self.reset, jax.random.PRNGKey(0))
        return {k: v.shape for k, v in st.obs.items()}

    # --- qpos/qvel slicing
    def get_floating_base_qpos(self, qpos):
        a = self._floating_base_qpos_addr
        return qpos[a : a + 7]

    def get_floating_base_qvel(self, qvel):
        a = self._floating_base_qvel_addr
        return qvel[a : a + 6]

    def set_floating_base_qpos(self, new, qpos):
        a = self._floating_base_qpos_addr
        return qpos.at[a : a + 7].set(new)

    def set_floating_base_qvel(self, new, qvel):
        a = self._floating_base_qvel_addr
        return qvel.at[a : a + 6].set(new)

    def get_actuator_joints_qpos(self, qpos):
        return qpos[self._actuator_qposadr]

    def set_actuator_joints_qpos(self, new, qpos):
        return qpos.at[self._actuator_qposadr].set(new)

    def get_actuator_joints_qvel(self, qvel):
        return qvel[self._actuator_dofadr]

    def get_backlash_qpos(self, qpos):
        if len(self._backlash_qposadr) == 0:
            return jnp.zeros(0, qpos.dtype)
        return qpos[self._backlash_qposadr]

    def get_actuator_angles_with_backlash(self, qpos):
        """Actuated joint angles with the paired backlash deflection folded in
        (reference joystick.py:534-541); actuators without a backlash joint
        contribute zero."""
        angles = self.get_actuator_joints_qpos(qpos)
        if len(self._backlash_qposadr) == 0:
            return angles
        return angles.at[self._backlash_actuator_slot].add(
            qpos[self._backlash_qposadr]
        )

    # --- sensor readings
    def _sensor(self, data: Data, name: str):
        a, b = self._sensor_slices[name]
        return data.sensordata[..., a:b]

    def get_gravity(self, data):
        return self._sensor(data, GRAVITY_SENSOR)

    def get_global_linvel(self, data):
        return self._sensor(data, GLOBAL_LINVEL_SENSOR)

    def get_global_angvel(self, data):
        return self._sensor(data, GLOBAL_ANGVEL_SENSOR)

    def get_local_linvel(self, data):
        return self._sensor(data, LOCAL_LINVEL_SENSOR)

    def get_accelerometer(self, data):
        return self._sensor(data, ACCELEROMETER_SENSOR)

    def get_gyro(self, data):
        return self._sensor(data, GYRO_SENSOR)

    def get_feet_pos(self, data):
        return jnp.stack(
            [self._sensor(data, f"{s}_pos") for s in FEET_SITES], axis=-2
        )
