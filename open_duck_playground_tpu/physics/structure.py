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


@functools.lru_cache(maxsize=16)
def dof_chain_blocks(spec: ModelSpec):
    """Block-arrow partition of the dof index space, if the model has one.

    Returns ``(root_block, chain_blocks)`` where ``root_block`` is the
    half-open dof range of the root free joint (``(0, 0)`` if none) and
    ``chain_blocks`` is a tuple of half-open dof ranges, one per serial
    kinematic chain hanging off the root. Guarantees, verified structurally:

    - every block is a contiguous dof range; together with the root block
      they tile ``[0, nv)``;
    - within a chain, every dof pair is ancestor-related (the chain's bodies
      form a path), so a dense in-block triangle has no structural zeros;
    - dofs in different chains never couple in the CRBA mass matrix — their
      only shared ancestors are root-block dofs.

    Returns ``None`` when the model doesn't fit this shape (no root free
    joint at dof 0, branching chains, non-contiguous dof numbering); callers
    fall back to dense factorization.
    """
    nv, nbody = spec.nv, spec.nbody
    fj = free_joint(spec)
    if fj < 0 or spec.jnt_dofadr[fj] != 0:
        return None
    root = (0, 6)
    root_body = int(spec.jnt_bodyid[fj])

    # ancestor body chain (excluding world) per body
    parent = [int(p) for p in spec.body_parentid]
    anc_bodies = []
    for b in range(nbody):
        chain = []
        w = b
        while w != 0:
            chain.append(w)
            w = parent[w]
        anc_bodies.append(set(chain))

    # group non-root dofs into maximal chains: walk bodies depth-first from
    # the root body's jointed children; a chain = path of bodies each with
    # exactly one child in the jointed subtree
    dof_body = [int(b) for b in spec.dof_bodyid]
    hinge_dofs = [d for d in range(nv) if dof_body[d] != root_body or d >= 6]
    if sorted(hinge_dofs) != list(range(6, nv)):
        return None

    children = [[] for _ in range(nbody)]
    for b in range(1, nbody):
        children[parent[b]].append(b)

    def subtree_bodies(b):
        out = [b]
        for c in children[b]:
            out.extend(subtree_bodies(c))
        return out

    chains = []
    # chain roots: jointed descendants of root_body whose parent path back to
    # root_body has no joints
    stack = list(children[root_body])
    chain_roots = []
    while stack:
        b = stack.pop()
        if spec.body_jntnum[b] > 0:
            chain_roots.append(b)
        else:
            stack.extend(children[b])
    for cb in sorted(chain_roots):
        bodies = subtree_bodies(cb)
        dofs = sorted(d for d in range(6, nv) if dof_body[d] in bodies)
        if not dofs:
            continue
        if dofs != list(range(dofs[0], dofs[-1] + 1)):
            return None  # non-contiguous chain
        # path check: all pairs in the chain must be ancestor-related
        for d in dofs:
            for e in dofs:
                bd, be = dof_body[d], dof_body[e]
                if bd != be and bd not in anc_bodies[be] and be not in anc_bodies[bd]:
                    return None  # branching chain
        chains.append((dofs[0], dofs[-1] + 1))
    covered = sorted(chains)
    pos = 6
    for a, b in covered:
        if a != pos:
            return None
        pos = b
    if pos != nv:
        return None
    return root, tuple(covered)
