"""Batched PnP: absolute pose from 2D-3D correspondences (DLT RANSAC + GN).

Used by the incremental mapper for image registration — the counterpart of
COLMAP's RegisterNextImage absolute-pose RANSAC inside the reference's
`incremental_colmap` mode (dispatched at /root/reference/sfm/main_sfm.py:95-125).
Fixed-trial hypothesis evaluation (vmap over hypotheses), then a vmapped 6-dof
Gauss-Newton polish on the consensus set. All static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import rotations as rot
from ..geometry import se3


class PnPResult(NamedTuple):
    q: jnp.ndarray            # [4] world->cam
    t: jnp.ndarray            # [3]
    inliers: jnp.ndarray      # [M] bool
    num_inliers: jnp.ndarray  # int32


def _dlt_pose(X, x, w):
    """DLT camera matrix from weighted 2D-3D pairs. X [M,3], x [M,2] normalized,
    w [M]. Returns (R [3,3], t [3])."""
    ones = jnp.ones(X.shape[:-1] + (1,), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=-1)               # [M, 4]
    zero = jnp.zeros_like(Xh)
    # rows: [X 0 -u X ; 0 X -v X] for P [3,4] row-major flattened [12]
    r1 = jnp.concatenate([Xh, zero, -x[..., 0:1] * Xh], axis=-1)
    r2 = jnp.concatenate([zero, Xh, -x[..., 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0) * jnp.concatenate([w, w])[:, None]
    AtA = jnp.einsum("ni,nj->ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    P = V[:, 0].reshape(3, 4)

    def decompose(Pm):
        H = Pm[:, :3]
        U, S, Vt = jnp.linalg.svd(H)
        detUV = jnp.linalg.det(U @ Vt)
        R = U @ jnp.diag(jnp.array([1.0, 1.0, jnp.sign(detUV)], X.dtype).astype(X.dtype)) @ Vt
        scale = jnp.mean(S) * jnp.sign(detUV)
        t = Pm[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
        return rot.rotmat_to_quat(R), t

    # DLT's null vector has a sign ambiguity: P and -P both satisfy the system;
    # pick the one putting the (weighted) majority of points in front
    q_pos, t_pos = decompose(P)
    q_neg, t_neg = decompose(-P)
    front_pos = jnp.sum((se3.pose_apply(q_pos, t_pos, X)[..., 2] > 0) * w)
    front_neg = jnp.sum((se3.pose_apply(q_neg, t_neg, X)[..., 2] > 0) * w)
    use_neg = front_neg > front_pos
    q = jnp.where(use_neg, q_neg, q_pos)
    t = jnp.where(use_neg, t_neg, t_pos)
    return q, t, use_neg


def _reproj_err2(q, t, X, x):
    x_cam = se3.pose_apply(q, t, X)
    z = x_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = x_cam[..., :2] / z_safe[..., None]
    err2 = jnp.sum((proj - x) ** 2, axis=-1)
    return jnp.where(z > 0, err2, jnp.inf)


def refine_pose_gn(q, t, X, x, w, num_iters: int = 10):
    """Pose-only Gauss-Newton on normalized reprojection. w [M] weights."""

    def body(carry, _):
        q, t = carry
        x_cam = se3.pose_apply(q, t, X)
        z = x_cam[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        proj = x_cam[..., :2] / z_safe[..., None]
        r = (proj - x) * w[..., None]                      # [M, 2]
        iz = 1.0 / z_safe
        zero = jnp.zeros_like(z)
        A = jnp.stack(
            [jnp.stack([iz, zero, -x_cam[..., 0] * iz * iz], -1),
             jnp.stack([zero, iz, -x_cam[..., 1] * iz * iz], -1)],
            axis=-2,
        )                                                  # [M, 2, 3]
        RX = x_cam - t
        Jr = jnp.einsum("mij,mjl->mil", A, -rot.skew(RX))
        J = jnp.concatenate([Jr, A], axis=-1) * w[..., None, None]   # [M, 2, 6]
        g = jnp.einsum("mri,mr->i", J, r)
        H = jnp.einsum("mri,mrj->ij", J, J) + 1e-8 * jnp.eye(6, dtype=X.dtype)
        d = jnp.linalg.solve(H, -g[:, None])[:, 0]
        q_new = rot.quat_normalize(rot.quat_multiply(rot.angle_axis_to_quat(d[:3]), q))
        t_new = t + d[3:]
        return (q_new, t_new), None

    (q, t), _ = jax.lax.scan(body, (q, t), None, length=num_iters)
    return q, t


@partial(jax.jit, static_argnames=("num_hypotheses",))
def estimate_pose_pnp(
    key: jax.Array,
    X: jnp.ndarray,          # [M, 3] world points
    x: jnp.ndarray,          # [M, 2] normalized camera coords
    mask: jnp.ndarray,       # [M] bool
    thres_sq: jnp.ndarray,   # squared inlier threshold (normalized coords)
    num_hypotheses: int = 64,
) -> PnPResult:
    M = X.shape[0]
    order = jnp.argsort(~mask)
    count = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    u = jax.random.uniform(key, (num_hypotheses, 6))
    idx = order[(u * count.astype(u.dtype)).astype(jnp.int32)]   # [S, 6]

    def hyp(sample_idx):
        w = jnp.zeros((M,), X.dtype).at[sample_idx].set(1.0) * mask
        q, t, _ = _dlt_pose(X, x, w)
        err2 = _reproj_err2(q, t, X, x)
        inl = (err2 < thres_sq) & mask
        return q, t, jnp.sum(inl.astype(jnp.int32))

    qs, ts, scores = jax.vmap(hyp)(idx)
    best = jnp.argmax(scores)
    q, t = qs[best], ts[best]
    inl = (_reproj_err2(q, t, X, x) < thres_sq) & mask
    q, t = refine_pose_gn(q, t, X, x, inl.astype(X.dtype))
    inl = (_reproj_err2(q, t, X, x) < thres_sq) & mask
    q, t = refine_pose_gn(q, t, X, x, inl.astype(X.dtype))
    inl = (_reproj_err2(q, t, X, x) < thres_sq) & mask
    return PnPResult(q=q, t=t, inliers=inl, num_inliers=jnp.sum(inl.astype(jnp.int32)))
