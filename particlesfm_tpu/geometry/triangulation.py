"""Batched DLT triangulation over padded track tensors.

TPU-native counterpart of the reference's point triangulation
(/root/reference/sfm/gmapper/src/sfm/incremental_triangulator.cc): instead of
per-track incremental estimation, we triangulate all tracks at once from padded
observation tensors [N, K, ...] with validity masks, then apply the same gates
(cheirality, reprojection error, triangulation angle).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rotations as rot
from . import se3


def triangulate_dlt(proj: jnp.ndarray, xy: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Multiview DLT. proj: (...,K,3,4) world->image-normalized projection matrices
    ([R|t] for normalized cam coords), xy: (...,K,2) normalized coords, mask (...,K).

    Returns world points (...,3). Invalid observations must be masked out.

    Uses the inhomogeneous formulation (finite points): the algebraic rows
    x*P[2] - P[0] are linear in X, so the exact minimizer is a 3x3 normal-equation
    solve — much better f32 conditioning than eigh of the 4x4 homogeneous system.
    """
    # rows: x * P[2] - P[0], y * P[2] - P[1]
    r0 = xy[..., 0:1] * proj[..., 2, :] - proj[..., 0, :]
    r1 = xy[..., 1:2] * proj[..., 2, :] - proj[..., 1, :]
    A4 = jnp.concatenate([r0[..., None, :], r1[..., None, :]], axis=-2)  # (...,K,2,4)
    A4 = A4 * mask[..., None, None]
    A4 = A4.reshape(A4.shape[:-3] + (-1, 4))
    A = A4[..., :3]
    b = -A4[..., 3]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    Atb = jnp.einsum("...ni,...n->...i", A, b)
    AtA = AtA + 1e-10 * jnp.eye(3, dtype=AtA.dtype)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]


def triangulate_two_view(q1, t1, q2, t2, x1, x2):
    """Two-view DLT for normalized coords x1,x2 (...,2). Returns world points (...,3)."""
    P1 = se3.pose_to_matrix(q1, t1)
    P2 = se3.pose_to_matrix(q2, t2)
    proj = jnp.stack([P1, P2], axis=-3)
    xy = jnp.stack([x1, x2], axis=-2)
    mask = jnp.ones(xy.shape[:-1], xy.dtype)
    return triangulate_dlt(proj, xy, mask)


def point_depths(q, t, X):
    """Depth of world points X (...,3) in cameras (q,t) (broadcasting)."""
    return se3.pose_apply(q, t, X)[..., 2]


def reprojection_errors(q, t, params, X, uv):
    """Pixel reprojection error of world points against observations."""
    from . import cameras

    x_cam = se3.pose_apply(q, t, X)
    proj = cameras.project(params, x_cam)
    return jnp.linalg.norm(proj - uv, axis=-1)


def triangulation_angles(centers: jnp.ndarray, X: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Max pairwise ray angle (radians) per point. centers: (...,K,3), X: (...,3)."""
    rays = centers - X[..., None, :]
    rays = rays / jnp.clip(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.einsum("...ik,...jk->...ij", rays, rays)
    pair_mask = mask[..., :, None] * mask[..., None, :]
    # exclude self-pairs and invalid pairs by forcing cos=1 (angle 0)
    eye = jnp.eye(mask.shape[-1], dtype=bool)
    cosang = jnp.where(pair_mask > 0, cosang, 1.0)
    cosang = jnp.where(eye, 1.0, cosang)
    return jnp.arccos(jnp.clip(jnp.min(cosang, axis=(-2, -1)), -1.0, 1.0))
