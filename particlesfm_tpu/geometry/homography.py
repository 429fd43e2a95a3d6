"""Batched homography estimation + decomposition (degenerate two-view configs).

Counterpart of the reference's COLMAP-style H estimation and the planar /
panoramic / watermark configuration classification
(/root/reference/sfm/gmapper/src/estimators/two_view_geometry.h:48-67,
two_view_geometry.cc:172-253 + 285-375): planar scenes and pure rotations break
essential-matrix RANSAC (the 8-point system becomes rank-deficient and feeds
bogus relative poses into rotation/translation averaging), so pairs whose
homography explains nearly all epipolar inliers must be detected and handled
specially.

TPU-first: all solvers are closed-form batched array code over a flat leading
pair axis (4-point DLT via 9x9 smallest-eigenvector, Faugeras SVD-based
decomposition with 3x3 closed-form SVD) — no per-pair host loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg3 import smallest_eigvec_psd, svd3x3


def dlt_homography(x1: jnp.ndarray, x2: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Masked DLT: H with x2 ~ H x1. x1, x2: (..., N, 2), N >= 4.

    Uses the same Hartley conditioning + 9x9 smallest-eigenvector path as the
    eight-point solver (XLA-friendly closed forms, no iterative svd on the
    near-singular DLT systems).
    """
    from .epipolar import _hartley_normalize

    if mask is None:
        mask = jnp.ones(x1.shape[:-1], x1.dtype)
    x1n, T1 = _hartley_normalize(x1, mask)
    x2n, T2 = _hartley_normalize(x2, mask)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    # two rows per correspondence of A h = 0 (h = vec(H), row-major)
    r1 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    r2 = jnp.stack([z, z, z, u1, v1, o, -v2 * u1, -v2 * v1, -v2], axis=-1)
    A = jnp.concatenate([r1 * mask[..., None], r2 * mask[..., None]], axis=-2)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    h = smallest_eigvec_psd(AtA.reshape((-1, 9, 9))).reshape(AtA.shape[:-2] + (9,))
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # denormalize: x2 = T2^-1 Hn T1 x1
    T2inv = _inv3x3(T2)
    H = jnp.einsum("...ij,...jk,...kl->...il", T2inv, Hn, T1)
    # scale-normalize by the largest-magnitude entry proxy (Frobenius)
    nrm = jnp.linalg.norm(H.reshape(H.shape[:-2] + (9,)), axis=-1)
    return H / jnp.clip(nrm[..., None, None], 1e-12)


def _inv3x3(M):
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def symmetric_transfer_error(H, x1, x2):
    """Squared symmetric transfer error per correspondence, (..., N)."""
    Hinv = _inv3x3(H)

    def transfer(Hm, a, b):
        ah = jnp.concatenate([a, jnp.ones(a.shape[:-1] + (1,), a.dtype)], axis=-1)
        p = jnp.einsum("...ij,...nj->...ni", Hm, ah)
        z = jnp.where(jnp.abs(p[..., 2:3]) < 1e-12, 1e-12, p[..., 2:3])
        return jnp.sum((p[..., :2] / z - b) ** 2, axis=-1)

    return transfer(H, x1, x2) + transfer(Hinv, x2, x1)


def homography_ransac(key, x1, x2, mask, thres_sq, num_hypotheses: int = 32):
    """Batched fixed-budget H-RANSAC over all pairs: returns (H [P,3,3],
    inliers [P,M], num_inliers [P]).

    x1, x2: [P, M, 2] (any consistent coordinate frame), thres_sq: [P] squared
    symmetric transfer threshold in that frame.
    """
    from .epipolar import eight_point  # noqa: F401 (convention reference)
    from ..globalsfm.twoview import _sample_indices

    P, M, _ = x1.shape
    S = num_hypotheses
    keys = jax.random.split(key, P)
    idx = jax.vmap(lambda k, m: _sample_indices(k, m, S, 4))(keys, mask)  # [P,S,4]
    rows = jnp.arange(P)[:, None, None]
    s1 = x1[rows, idx]
    s2 = x2[rows, idx]
    smask = mask[rows, idx].astype(x1.dtype)
    H0 = dlt_homography(
        s1.reshape(P * S, 4, 2), s2.reshape(P * S, 4, 2), smask.reshape(P * S, 4)
    ).reshape(P, S, 3, 3)
    err = symmetric_transfer_error(H0, x1[:, None], x2[:, None])  # [P, S, M]
    inl = (err < thres_sq[:, None, None]) & mask[:, None]
    scores = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(scores, axis=-1)
    best_inl = jnp.take_along_axis(inl, best[:, None, None], axis=1)[:, 0]
    H_best = jnp.take_along_axis(H0, best[:, None, None, None], axis=1)[:, 0]
    # one masked LS refit on the winning consensus set
    H_refit = dlt_homography(x1, x2, best_inl.astype(x1.dtype))
    err_r = symmetric_transfer_error(H_refit, x1, x2)
    inl_r = (err_r < thres_sq[:, None]) & mask
    better = jnp.sum(inl_r.astype(jnp.int32), -1) >= jnp.sum(
        best_inl.astype(jnp.int32), -1
    )
    H_final = jnp.where(better[:, None, None], H_refit, H_best)
    inl_final = jnp.where(better[:, None], inl_r, best_inl)
    return H_final, inl_final, jnp.sum(inl_final.astype(jnp.int32), -1)


def decompose_homography(H, x1, x2, mask=None):
    """Faugeras SVD decomposition of a calibrated homography (normalized camera
    coords): H ~ R + t n^T / d. Returns the cheirality-best (R [...,3,3],
    t [...,3] unit-or-zero, n [...,3]) plus `t_mag` — the relative baseline
    magnitude (d1-d3)/d2, ~0 for pure rotation (the PANORAMIC test,
    two_view_geometry.cc:236-243).

    4 closed-form candidates (the d' > 0 sign choices; d' < 0 places the plane
    behind camera 1 and never wins cheirality here), scored by cheirality votes
    of the masked correspondences — batched, no per-pair control flow.
    """
    if mask is None:
        mask = jnp.ones(x1.shape[:-1], x1.dtype)
    U, S, Vt = svd3x3(H)
    # force proper rotations
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2))
    s_uv = detU * detV
    d1, d2, d3 = S[..., 0], S[..., 1], S[..., 2]
    d2s = jnp.where(jnp.abs(d2) < 1e-12, 1e-12, d2)
    # x1/x3 magnitudes (Faugeras); clamp radicands against noise
    den = jnp.maximum(d1**2 - d3**2, 1e-12)
    a1 = jnp.sqrt(jnp.clip((d1**2 - d2**2) / den, 0.0, None))
    a3 = jnp.sqrt(jnp.clip((d2**2 - d3**2) / den, 0.0, None))
    t_mag = (d1 - d3) / d2s

    V = jnp.swapaxes(Vt, -1, -2)

    def candidate(e1, e3):
        # d' > 0 branch of Faugeras: R' is a y-rotation
        sin_t = (d1 - d3) * e1 * e3 * a1 * a3 / d2s
        cos_t = (d1 * (a3 * e3) ** 2 + d3 * (a1 * e1) ** 2) / d2s
        # normalize numerically to a rotation
        nrm = jnp.sqrt(jnp.clip(sin_t**2 + cos_t**2, 1e-12, None))
        sin_t = sin_t / nrm
        cos_t = cos_t / nrm
        z = jnp.zeros_like(sin_t)
        o = jnp.ones_like(sin_t)
        Rp = jnp.stack(
            [
                jnp.stack([cos_t, z, -sin_t], -1),
                jnp.stack([z, o, z], -1),
                jnp.stack([sin_t, z, cos_t], -1),
            ],
            axis=-2,
        )
        tp = jnp.stack([(d1 - d3) * a1 * e1, z, -(d1 - d3) * a3 * e3], axis=-1)
        npr = jnp.stack([a1 * e1, z, a3 * e3], axis=-1)
        R = s_uv[..., None, None] * jnp.einsum("...ij,...jk,...lk->...il", U, Rp, V)
        t = jnp.einsum("...ij,...j->...i", U, tp)
        n = jnp.einsum("...ij,...j->...i", V, npr)
        # orient the plane normal toward camera 1 (n^T x > 0 for visible points)
        flip = jnp.sign(n[..., 2:3] + 1e-12)
        return R, t * flip[..., 0:1], n * flip

    cands = [candidate(e1, e3) for e1 in (1.0, -1.0) for e3 in (1.0, -1.0)]
    Rs = jnp.stack([c[0] for c in cands], axis=0)     # [4, ..., 3, 3]
    ts = jnp.stack([c[1] for c in cands], axis=0)
    ns = jnp.stack([c[2] for c in cands], axis=0)

    from .epipolar import triangulate_midpoint_depths

    def votes(R, t):
        tn = t / jnp.clip(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
        dd1, dd2 = triangulate_midpoint_depths(R, tn, x1, x2)
        return jnp.sum(((dd1 > 0) & (dd2 > 0)) * mask, axis=-1)

    v = jax.vmap(votes)(Rs, ts)                       # [4, ...]
    best = jnp.argmax(v, axis=0)
    take = lambda arr, extra: jnp.take_along_axis(
        arr, best[(None,) + (...,) + (None,) * extra].astype(jnp.int32), axis=0
    )[0]
    R = take(Rs, 2)
    t = take(ts, 1)
    n = take(ns, 1)
    tn = t / jnp.clip(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return R, tn, n, t_mag
