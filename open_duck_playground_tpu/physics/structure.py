"""Static structural index sets derived from ModelSpec (numpy, trace-time).

These keep the traced graphs small: instead of unrolling python loops over
bodies/joints/dofs (which explodes XLA compile time), the pipeline gathers
with these precomputed index arrays and runs batched ops.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

from open_duck_playground_tpu.physics.types import FREE, HINGE, ModelSpec


@functools.lru_cache(maxsize=16)
def tree_levels(spec: ModelSpec) -> Tuple[Tuple[int, ...], ...]:
    """Bodies grouped by tree depth (world excluded), parents always in an
    earlier level."""
    depth = [0] * spec.nbody
    for b in range(1, spec.nbody):
        depth[b] = depth[spec.body_parentid[b]] + 1
    levels: List[List[int]] = [[] for _ in range(max(depth) + 1)]
    for b in range(1, spec.nbody):
        levels[depth[b]].append(b)
    return tuple(tuple(l) for l in levels if l)


@functools.lru_cache(maxsize=16)
def dof_pred_mask(spec: ModelSpec) -> np.ndarray:
    """pred[d, e] = 1 iff dof e contributes to the carrier velocity seen when
    processing dof d in mj_comVel order: e on a strict ancestor body, or on
    the same body with e < d. Free-joint translational dofs additionally get
    cdof_dot forced to zero (see free_trans_mask)."""
    nv = spec.nv
    # ancestor bodies per body
    anc = [set() for _ in range(spec.nbody)]
    for b in range(1, spec.nbody):
        p = spec.body_parentid[b]
        anc[b] = anc[p] | {p}
    pred = np.zeros((nv, nv), dtype=np.float64)
    for d in range(nv):
        bd = spec.dof_bodyid[d]
        for e in range(nv):
            be = spec.dof_bodyid[e]
            if be in anc[bd] or (be == bd and e < d):
                pred[d, e] = 1.0
    # free joints: all 3 rotational dofs share one carrier (parent velocity +
    # own translational dofs); earlier rotational dofs are NOT included
    # (mj_comVel computes the three cdof_dots before accumulating rotation)
    for j in range(spec.njnt):
        if spec.jnt_type[j] == FREE:
            a = spec.jnt_dofadr[j]
            pred[a + 3 : a + 6, a + 3 : a + 6] = 0.0
    return pred


@functools.lru_cache(maxsize=16)
def free_trans_mask(spec: ModelSpec) -> np.ndarray:
    """0 for free-joint translational dofs (their cdof_dot is defined as 0 in
    mj_comVel), 1 elsewhere."""
    m = np.ones(spec.nv)
    for j in range(spec.njnt):
        if spec.jnt_type[j] == FREE:
            d = spec.jnt_dofadr[j]
            m[d : d + 3] = 0.0
    return m


@functools.lru_cache(maxsize=16)
def hinge_joints(spec: ModelSpec) -> np.ndarray:
    return np.array(
        [j for j in range(spec.njnt) if spec.jnt_type[j] == HINGE], dtype=np.int32
    )


@functools.lru_cache(maxsize=16)
def free_joint(spec: ModelSpec) -> int:
    for j in range(spec.njnt):
        if spec.jnt_type[j] == FREE:
            return j
    return -1


@functools.lru_cache(maxsize=16)
def limited_hinges(spec: ModelSpec) -> np.ndarray:
    return np.array(
        [
            j
            for j in range(spec.njnt)
            if spec.jnt_type[j] == HINGE and spec.jnt_limited[j]
        ],
        dtype=np.int32,
    )


@functools.lru_cache(maxsize=16)
def one_hot_dofs(spec: ModelSpec, dofs: Tuple[int, ...]) -> np.ndarray:
    e = np.zeros((len(dofs), spec.nv))
    for i, d in enumerate(dofs):
        e[i, d] = 1.0
    return e
