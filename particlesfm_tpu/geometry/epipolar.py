"""Two-view epipolar geometry: E/F construction, 8-point solves, decomposition.

Counterpart of the reference's COLMAP-style two-view estimator
(/root/reference/sfm/gmapper/src/estimators/two_view_geometry.cc) but built for
batched evaluation: solvers work on fixed-size point blocks and vmap over
RANSAC hypotheses instead of adaptive sampling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rotations as rot
from .linalg3 import smallest_eigvec_psd, svd3x3


def essential_from_pose(q12: jnp.ndarray, t12: jnp.ndarray) -> jnp.ndarray:
    """E for relative pose x2 = R12 x1 + t12:  x2^T E x1 = 0, E = [t]x R."""
    R = rot.quat_to_rotmat(q12)
    return jnp.einsum("...ij,...jk->...ik", rot.skew(t12), R)


def fundamental_from_essential(E, params1, params2):
    """F = K2^-T E K1^-1 with canonical packed params rows (fx,fy,cx,cy,k)."""
    K1i = _kinv(params1)
    K2i = _kinv(params2)
    return jnp.einsum("...ji,...jk,...kl->...il", K2i, E, K1i)


def _kinv(params):
    fx, fy, cx, cy, _ = jnp.moveaxis(params, -1, 0)
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    Ki = jnp.stack(
        [1.0 / fx, z, -cx / fx, z, 1.0 / fy, -cy / fy, z, z, o], axis=-1
    )
    return Ki.reshape(params.shape[:-1] + (3, 3))


def _hartley_normalize(pts, mask):
    """Similarity normalization for conditioning; returns (pts_n, T) with T (3,3)."""
    w = mask[..., None]
    n = jnp.clip(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(pts * w, axis=-2) / n
    d = jnp.linalg.norm((pts - mean[..., None, :]) * w, axis=-1)
    mean_d = jnp.sum(d, axis=-1, keepdims=True) / jnp.squeeze(n, -1)[..., None]
    s = jnp.sqrt(2.0) / jnp.clip(mean_d, 1e-12)
    s0 = s[..., 0]
    T = jnp.zeros(pts.shape[:-2] + (3, 3), pts.dtype)
    T = T.at[..., 0, 0].set(s0).at[..., 1, 1].set(s0).at[..., 2, 2].set(1.0)
    T = T.at[..., 0, 2].set(-s0 * mean[..., 0]).at[..., 1, 2].set(-s0 * mean[..., 1])
    return (pts - mean[..., None, :]) * s[..., None], T


def eight_point(x1: jnp.ndarray, x2: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Normalized 8-point algorithm. x1,x2: (...,N,2) with N>=8; mask: (...,N).

    Returns F (or E if inputs are normalized camera coords), rank-2 enforced.
    """
    if mask is None:
        mask = jnp.ones(x1.shape[:-1], x1.dtype)
    x1n, T1 = _hartley_normalize(x1, mask)
    x2n, T2 = _hartley_normalize(x2, mask)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    ones = jnp.ones_like(u1)
    # x2^T F x1 = 0 rows
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1)
    A = A * mask[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    # null vector via Cholesky inverse iteration: XLA's eigh/svd are iterative
    # and hit their worst case on exactly these (near-singular) matrices
    f = smallest_eigvec_psd(AtA.reshape((-1, 9, 9))).reshape(AtA.shape[:-2] + (9,))
    F = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 enforcement (closed-form 3x3 svd)
    U, S, Vt = svd3x3(F)
    S = S.at[..., 2].set(0.0)
    F = jnp.einsum("...ij,...j,...jk->...ik", U, S, Vt)
    F = jnp.einsum("...ji,...jk,...kl->...il", T2, F, T1)
    nrm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
    return F / jnp.clip(nrm[..., None, None], 1e-12)


def essential_closest(E: jnp.ndarray) -> jnp.ndarray:
    """Project to the essential manifold: singular values -> (1,1,0)."""
    U, _, Vt = svd3x3(E)
    S = jnp.asarray([1.0, 1.0, 0.0], E.dtype)
    return jnp.einsum("...ij,j,...jk->...ik", U, S, Vt)


def sampson_error(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) squared error. x1,x2: (...,N,2)."""
    ones = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Fp1 = jnp.einsum("...ij,...nj->...ni", F, p1)
    Ftp2 = jnp.einsum("...ji,...nj->...ni", F, p2)
    num = jnp.sum(p2 * Fp1, axis=-1) ** 2
    den = Fp1[..., 0] ** 2 + Fp1[..., 1] ** 2 + Ftp2[..., 0] ** 2 + Ftp2[..., 1] ** 2
    return num / jnp.clip(den, 1e-12)


def decompose_essential(E: jnp.ndarray):
    """E -> four (R, t) candidates, each stacked along a new leading axis of size 4.

    Follows Hartley-Zisserman: R in {U W V^T, U W^T V^T}, t = +-u3.
    """
    U, _, Vt = svd3x3(E)
    # force proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = jnp.einsum("...ij,jk,...kl->...il", U, W, Vt)
    Rb = jnp.einsum("...ij,kj,...kl->...il", U, W, Vt)  # W^T
    t = U[..., :, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb], axis=0)
    ts = jnp.stack([t, -t, t, -t], axis=0)
    return Rs, ts


def triangulate_midpoint_depths(R, t, x1, x2):
    """Cheap depths for cheirality voting: solve per-point 2x2 LS for (d1, d2) with
    d2*x2h = R (d1*x1h) + t, x?h = homogeneous normalized coords. Returns (d1, d2)."""
    x1h = jnp.concatenate([x1, jnp.ones(x1.shape[:-1] + (1,), x1.dtype)], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones(x2.shape[:-1] + (1,), x2.dtype)], axis=-1)
    a = jnp.einsum("...ij,...nj->...ni", R, x1h)  # (...,N,3)
    b = -x2h
    # minimize ||d1*a + d2*b + t||^2 over d1,d2
    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(b * b, axis=-1)
    ab = jnp.sum(a * b, axis=-1)
    at = jnp.sum(a * t[..., None, :], axis=-1)
    bt = jnp.sum(b * t[..., None, :], axis=-1)
    det = aa * bb - ab * ab
    d1 = (-at * bb + bt * ab) / jnp.clip(det, 1e-12)
    d2 = (-bt * aa + at * ab) / jnp.clip(det, 1e-12)
    return d1, d2


def pose_from_essential(E, x1, x2, mask=None):
    """Pick the (R,t) of decompose_essential with max cheirality votes.

    x1, x2 are normalized camera coords (...,N,2). Returns (q12, t12, num_votes).
    """
    if mask is None:
        mask = jnp.ones(x1.shape[:-1], x1.dtype)
    Rs, ts = decompose_essential(E)  # (4,...,3,3), (4,...,3)

    def votes(R, t):
        d1, d2 = triangulate_midpoint_depths(R, t, x1, x2)
        return jnp.sum(((d1 > 0) & (d2 > 0)) * mask, axis=-1)

    v = jax.vmap(votes)(Rs, ts)  # (4, ...)
    best = jnp.argmax(v, axis=0)
    R = jnp.take_along_axis(Rs, best[None, ..., None, None].astype(jnp.int32), axis=0)[0]
    t = jnp.take_along_axis(ts, best[None, ..., None].astype(jnp.int32), axis=0)[0]
    nv = jnp.take_along_axis(v, best[None, ...].astype(jnp.int32), axis=0)[0]
    return rot.rotmat_to_quat(R), t, nv
