"""Quaternion / rotation / spatial-algebra primitives.

All functions are shape-polymorphic over leading batch dims where noted, pure
jax.numpy, and dtype-preserving (run in f32 on TPU; f64 under x64 for oracle
tests). Quaternions use MuJoCo's (w, x, y, z) convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, (…,4)x(…,4)->(…,4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v (…,3) by quaternion q (…,4): R(q) @ v."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q: R(q)^T @ v."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(…,4) -> (…,3,3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis (…,3) + angle (…,) -> quaternion (…,4)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_integrate(q: jnp.ndarray, omega_local: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate quaternion by local-frame angular velocity over dt (MuJoCo
    mju_quatIntegrate semantics: exact exponential map), then normalize."""
    angle = jnp.linalg.norm(omega_local, axis=-1)
    # guard against zero angle
    safe = jnp.where(angle < 1e-12, 1.0, angle)
    axis = omega_local / safe[..., None]
    dq = axis_angle_to_quat(axis, angle * dt)
    dq = jnp.where((angle < 1e-12)[..., None], jnp.array([1.0, 0, 0, 0], dtype=q.dtype), dq)
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Spatial algebra. Motion vectors are 6-vectors (angular[3], linear[3]) at a
# common world-frame origin, matching MuJoCo's cdof/cvel layout.
# ---------------------------------------------------------------------------


def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product of motion vectors: v x m (both (…,6))."""
    vang, vlin = v[..., :3], v[..., 3:]
    mang, mlin = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(vang, mang), jnp.cross(vang, mlin) + jnp.cross(vlin, mang)],
        axis=-1,
    )


def motion_cross_force(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product v x* f: motion (…,6) with force (…,6) ->
    force (…,6). Force vectors are (torque[3], force[3])."""
    vang, vlin = v[..., :3], v[..., 3:]
    ftor, flin = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(vang, ftor) + jnp.cross(vlin, flin), jnp.cross(vang, flin)],
        axis=-1,
    )


def inertia_matrix(mass, inertia_diag, ipos, imat) -> jnp.ndarray:
    """Spatial inertia (6,6) of a body about a world-frame origin.

    mass: (), inertia_diag: (3,) principal moments, ipos: (3,) CoM position
    relative to the spatial origin (world frame), imat: (3,3) rotation from
    principal-inertia frame to world. Layout matches motion vectors
    (angular first): I = [[Ic + m c^ c^T, m c^], [m c^T, m 1]],
    where c^ is the skew matrix of ipos.
    """
    dtype = ipos.dtype
    ic = imat @ (inertia_diag[:, None] * imat.T)
    cx = skew(ipos)
    eye = jnp.eye(3, dtype=dtype)
    top_left = ic + mass * (cx @ cx.T)
    top_right = mass * cx
    bot_left = mass * cx.T
    bot_right = mass * eye
    return jnp.concatenate(
        [
            jnp.concatenate([top_left, top_right], axis=1),
            jnp.concatenate([bot_left, bot_right], axis=1),
        ],
        axis=0,
    )


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(…,3) -> (…,3,3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))
