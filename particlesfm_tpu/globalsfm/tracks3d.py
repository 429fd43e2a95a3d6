"""Track triangulation + observation gating over padded track tensors.

TPU-native counterpart of the reference's incremental triangulator
(/root/reference/sfm/gmapper/src/sfm/incremental_triangulator.cc) and point filters
(base/reconstruction.cc:671-754,1321-1434). Because our trajectory engine produces
tracks natively, there is no transitive correspondence search or track merging —
each track row IS a track. "Create/Continue/Complete/Retriangulate" all collapse to:

    retriangulate all tracks by masked multiview DLT (one batched kernel),
    then recompute the observation mask from the gates:
      cheirality (depth > 0), pixel reprojection error, triangulation angle.

Re-running with the full observation mask implements COLMAP's CompleteTracks
(observations previously filtered are re-admitted when their error drops below
the completion threshold, incremental_triangulator.cc:233-287).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import cameras, se3, triangulation
from ..geometry import rotations as rot


class TrackObs(NamedTuple):
    """Padded per-track observations: K observation slots per track."""
    frame_idx: jnp.ndarray   # [N, K] int32 (0 for padded slots)
    uv: jnp.ndarray          # [N, K, 2] pixel coords
    mask: jnp.ndarray        # [N, K] bool


@partial(jax.jit, static_argnames=())
def triangulate_tracks(
    q: jnp.ndarray,          # [V, 4] world->cam quaternions
    t: jnp.ndarray,          # [V, 3]
    params: jnp.ndarray,     # [5] shared canonical intrinsics row (fx,fy,cx,cy,k)
    obs: TrackObs,
) -> jnp.ndarray:
    """Masked multiview DLT for every track at once. Returns X [N, 3].

    Degenerate tracks (parallel rays, all-masked) can yield non-finite DLT
    solutions; they are snapped to the origin sentinel so downstream reduction
    sums stay finite (NaN x zero-weight is still NaN) — the reprojection-error
    gates then discard them the ordinary way."""
    P = se3.pose_to_matrix(q, t)                  # [V, 3, 4]
    proj = P[obs.frame_idx]                       # [N, K, 3, 4]
    xy = cameras.img_to_cam(params, obs.uv)       # normalized coords
    X = triangulation.triangulate_dlt(proj, xy, obs.mask.astype(xy.dtype))
    return jnp.where(jnp.all(jnp.isfinite(X), axis=-1, keepdims=True), X, 0.0)


@partial(jax.jit, static_argnames=())
def observation_errors(q, t, params, X, obs: TrackObs):
    """(reproj error px [N,K], depth [N,K]) for every observation slot."""
    qo = q[obs.frame_idx]
    to = t[obs.frame_idx]
    x_cam = se3.pose_apply(qo, to, X[:, None, :])
    depth = x_cam[..., 2]
    uv_hat = cameras.project(params, x_cam)
    err = jnp.linalg.norm(uv_hat - obs.uv, axis=-1)
    return err, depth


@partial(jax.jit, static_argnames=())
def filter_observations(
    q: jnp.ndarray,
    t: jnp.ndarray,
    params: jnp.ndarray,
    X: jnp.ndarray,           # [N, 3]
    obs: TrackObs,            # mask = FULL candidate mask (all linked observations)
    max_reproj_error_px: float | jnp.ndarray = 4.0,
    min_tri_angle_deg: float | jnp.ndarray = 1.5,
):
    """Gate observations and tracks against the current geometry.

    Returns (obs_mask [N,K] bool, track_valid [N] bool, err [N,K]).
    Mirrors the filter cascade of reconstruction.cc:671-754: reprojection error,
    negative depth, minimum triangulation angle, >= 2 surviving observations.
    """
    err, depth = observation_errors(q, t, params, X, obs)
    good = obs.mask & (depth > 1e-8) & (err <= max_reproj_error_px)

    centers = se3.camera_center(q, t)[obs.frame_idx]      # [N, K, 3]
    ang = triangulation.triangulation_angles(centers, X, good.astype(err.dtype))
    track_valid = (jnp.sum(good.astype(jnp.int32), axis=-1) >= 2) & (
        ang >= jnp.deg2rad(min_tri_angle_deg)
    )
    return good, track_valid, err
