"""Host-side correspondence preparation: track tensors -> solver-ready batches.

Replaces the reference's SQLite + subprocess hop (traj_to_matches at
/root/reference/sfm/matches_from_flow.py:51-118 -> COLMAP database ->
colmap matches_importer -> gmapper DatabaseCache reload): our tracks go straight
into padded device tensors. Dynamic-label filtering (matches_from_flow.py:76-79)
and the per-track observation cap (sample_k, line 53) are applied here.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..tracks.store import TrackArrays


@dataclass
class ObsTensors:
    """Per-track padded observations (device layout for triangulation/BA)."""
    frame_idx: np.ndarray    # [N, K] int32
    uv: np.ndarray           # [N, K, 2] float32
    mask: np.ndarray         # [N, K] bool
    track_row: np.ndarray    # [N] int64 — row in the source TrackArrays


@dataclass
class PairTensors:
    """Per-pair padded correspondences (device layout for two-view/translation)."""
    pairs: np.ndarray        # [E, 2] int32 image indices (i < j)
    counts: np.ndarray       # [E] int32 full covisibility counts
    uv1: np.ndarray          # [E, M, 2] float32 pixel coords in image i
    uv2: np.ndarray          # [E, M, 2] float32 pixel coords in image j
    mask: np.ndarray         # [E, M] bool
    track_idx: np.ndarray = None   # [E, M] int64 source track row (-1 padded)


def static_observation_mask(tracks: TrackArrays, remove_dynamic: bool = True,
                            max_dynamic_fraction: float = 0.6) -> np.ndarray:
    """Observation mask with dynamic-labeled points dropped
    (matches_from_flow.py:76-79: labels==1 points are skipped).

    Safety guard beyond the reference: if the labels flag an implausible
    fraction of observations (over-triggering segmentation would starve SfM of
    static structure), the labels are ignored — the mapper's geometric
    epipolar-voting filter still protects against real dynamic objects."""
    mask = tracks.mask.copy()
    if remove_dynamic and tracks.labels is not None:
        dyn = (tracks.labels != 0) & mask
        frac = dyn.sum() / max(mask.sum(), 1)
        if frac <= max_dynamic_fraction:
            mask &= tracks.labels == 0
    return mask


def build_observations(
    tracks: TrackArrays,
    mask: Optional[np.ndarray] = None,
    max_obs_per_track: int = 20,
    min_track_len: int = 2,
) -> ObsTensors:
    """Padded per-track observation tensors, uniformly strided to the cap.

    The cap mirrors the reference's sample_k=20 matches per track
    (matches_from_flow.py:53,87-102): long tracks keep a uniform temporal stride.
    """
    if mask is None:
        mask = static_observation_mask(tracks)
    from .. import native

    fast = native.build_observations(mask, tracks.xy, min_track_len, max_obs_per_track)
    if fast is not None:
        fi, uv, om, rows = fast
        return ObsTensors(frame_idx=fi, uv=uv, mask=om, track_row=rows)
    lengths = mask.sum(axis=1)
    rows = np.nonzero(lengths >= min_track_len)[0]
    N = len(rows)
    K = max_obs_per_track
    frame_idx = np.zeros((N, K), np.int32)
    uv = np.zeros((N, K, 2), np.float32)
    out_mask = np.zeros((N, K), bool)
    for a, n in enumerate(rows):
        t = np.nonzero(mask[n])[0]
        if len(t) > K:
            t = t[np.round(np.linspace(0, len(t) - 1, K)).astype(int)]
        frame_idx[a, : len(t)] = t
        uv[a, : len(t)] = tracks.xy[n, t]
        out_mask[a, : len(t)] = True
    return ObsTensors(frame_idx=frame_idx, uv=uv, mask=out_mask, track_row=rows)


def build_pair_tensors(
    tracks: TrackArrays,
    mask: Optional[np.ndarray] = None,
    min_num_matches: int = 15,
    max_matches_per_pair: int = 256,
    seed: int = 100,
) -> PairTensors:
    """Covisibility pairs + padded per-pair correspondence tensors."""
    if mask is None:
        mask = static_observation_mask(tracks)
    m = mask.astype(np.int32)
    covis = m.T @ m
    iu = np.triu_indices(covis.shape[0], k=1)
    counts = covis[iu]
    keep = counts >= min_num_matches
    pairs = np.stack([iu[0][keep], iu[1][keep]], axis=1).astype(np.int32)
    counts = counts[keep].astype(np.int32)

    rng = np.random.default_rng(seed)
    E, M = len(pairs), max_matches_per_pair
    uv1 = np.zeros((E, M, 2), np.float32)
    uv2 = np.zeros((E, M, 2), np.float32)
    pmask = np.zeros((E, M), bool)
    tidx = np.full((E, M), -1, np.int64)
    for k, (i, j) in enumerate(pairs):
        common = np.nonzero(mask[:, i] & mask[:, j])[0]
        if len(common) > M:
            common = rng.choice(common, M, replace=False)
        uv1[k, : len(common)] = tracks.xy[common, i]
        uv2[k, : len(common)] = tracks.xy[common, j]
        pmask[k, : len(common)] = True
        tidx[k, : len(common)] = common
    return PairTensors(pairs=pairs, counts=counts, uv1=uv1, uv2=uv2, mask=pmask,
                       track_idx=tidx)


def gather_triplet_points(
    tracks: TrackArrays,
    mask: np.ndarray,
    triplets: np.ndarray,       # [T, 3] image indices (i < j < k)
    max_points: int = 100,
    seed: int = 100,
):
    """Per-triplet common-track observations for baseline-ratio estimation.

    Returns (uv_i, uv_j, uv_k each [T, Q, 2] float32, mask [T, Q] bool).
    max_points mirrors theia's LUD option max_num_points used for the constraint
    weight (least_unsquared_deviation_position_estimator.cc:255).
    """
    rng = np.random.default_rng(seed)
    T, Q = len(triplets), max_points
    uv_i = np.zeros((T, Q, 2), np.float32)
    uv_j = np.zeros((T, Q, 2), np.float32)
    uv_k = np.zeros((T, Q, 2), np.float32)
    out = np.zeros((T, Q), bool)
    for a, (i, j, k) in enumerate(triplets):
        common = np.nonzero(mask[:, i] & mask[:, j] & mask[:, k])[0]
        if len(common) > Q:
            common = rng.choice(common, Q, replace=False)
        uv_i[a, : len(common)] = tracks.xy[common, i]
        uv_j[a, : len(common)] = tracks.xy[common, j]
        uv_k[a, : len(common)] = tracks.xy[common, k]
        out[a, : len(common)] = True
    return uv_i, uv_j, uv_k, out


def geometric_dynamic_track_filter(
    num_tracks: int,
    pair_t: PairTensors,
    verified: np.ndarray,        # [E] bool — pairs that passed verification
    inliers: np.ndarray,         # [E, M] bool — two-view RANSAC inlier masks
    max_inlier_rate: float = 0.3,
    min_samples: int = 4,
) -> np.ndarray:
    """Learning-free dynamic-track detection by epipolar-consistency voting.

    A static-scene track is an epipolar inlier in (nearly) every verified pair
    it participates in; a track on an independently-moving object is rejected by
    most pairwise RANSACs. Tracks with enough samples and a low inlier rate are
    flagged dynamic. Returns [num_tracks] bool. This is a fallback complement to
    the learned motion segmentation (the reference has no geometric filter — it
    relies entirely on its trained network).
    """
    ti = pair_t.track_idx[verified]
    pm = pair_t.mask[verified] & (ti >= 0)
    inl = np.asarray(inliers)[verified] & pm
    total = np.zeros(num_tracks, np.int64)
    good = np.zeros(num_tracks, np.int64)
    np.add.at(total, ti[pm], 1)
    np.add.at(good, ti[inl], 1)
    rate = good / np.maximum(total, 1)
    return (total >= min_samples) & (rate < max_inlier_rate)
