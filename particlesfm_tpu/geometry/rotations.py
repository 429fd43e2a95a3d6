"""Batched rotation parameterizations: quaternion (w,x,y,z), angle-axis, matrices.

Conventions follow COLMAP (reference io format: qvec = (w,x,y,z), world->cam), see
/root/reference/sfm/colmap_utils/read_write_model.py (qvec2rotmat). All functions are
pure jnp, shape-polymorphic over leading batch dims, and safe under jit/vmap/grad.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b (both (...,4), wxyz)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (...,3) by quaternions q (...,4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Robust matrix->quaternion (Shepperd's method, branch-free via where)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Four candidate constructions; pick the numerically best one.
    q0 = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q1 = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    q2 = jnp.stack([m02 - m20, m01 + m10, 1 + m11 - m00 - m22, m12 + m21], axis=-1)
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 + m22 - m00 - m11], axis=-1)

    scores = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 + m11 - m00 - m22, 1 + m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (...,4cands,4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q * (0.5 / safe_sqrt(jnp.take_along_axis(scores, best[..., None].astype(jnp.int32), axis=-1)))
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def angle_axis_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * theta
    # sinc-safe small-angle expansion
    k = jnp.where(theta > 1e-6, jnp.sin(half) / jnp.clip(theta, _EPS), 0.5 - theta * theta / 48.0)
    return jnp.concatenate([jnp.cos(half), aa * k], axis=-1)


def quat_to_angle_axis(q: jnp.ndarray) -> jnp.ndarray:
    q = quat_normalize(q)
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    sin_half = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(sin_half, w)
    k = jnp.where(sin_half > 1e-6, theta / jnp.clip(sin_half, _EPS), 2.0 + theta * theta / 12.0)
    return v * k


def angle_axis_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    return quat_to_rotmat(angle_axis_to_quat(aa))


def rotmat_to_angle_axis(R: jnp.ndarray) -> jnp.ndarray:
    return quat_to_angle_axis(rotmat_to_quat(R))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix: skew(v) @ u == v x u. v: (...,3) -> (...,3,3)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def rotation_geodesic_angle(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians) between rotation matrices, batched."""
    Rab = jnp.einsum("...ij,...kj->...ik", Ra, Rb)  # Ra @ Rb^T
    tr = Rab[..., 0, 0] + Rab[..., 1, 1] + Rab[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


def quat_geodesic_angle(qa: jnp.ndarray, qb: jnp.ndarray) -> jnp.ndarray:
    d = jnp.abs(jnp.sum(quat_normalize(qa) * quat_normalize(qb), axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))


def project_to_rotmat(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix (Frobenius) via SVD, batched, det=+1 enforced."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.concatenate(
        [jnp.ones(M.shape[:-2] + (2,), M.dtype), det[..., None]], axis=-1
    )
    return jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)
