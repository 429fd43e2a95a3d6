"""Incremental SfM mapper — the reference's `incremental_colmap` mode, natively.

The reference shells out to `colmap mapper` (/root/reference/sfm/main_sfm.py:95-125);
this is the same algorithm shape built on our batched solvers:

  seed pair (max inliers x triangulation angle) -> next-best-view by 2D-3D
  correspondence count -> batched PnP RANSAC registration -> retriangulation
  -> growth-triggered global BA + filtering (COLMAP's ba_global_images_ratio
  schedule) -> final refinement.

TPU-shape discipline: PnP correspondences pad to a fixed cap and the BA camera
count pads to buckets of 16, so the whole incremental run compiles a handful of
programs regardless of sequence length.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import cameras
from ..globalsfm import (
    bundle_adjust,
    estimate_relative_poses,
    filter_observations,
    triangulate_tracks,
)
from ..globalsfm.ba import default_free_masks
from ..globalsfm.pnp import estimate_pose_pnp
from ..globalsfm.tracks3d import TrackObs
from ..tracks.store import TrackArrays
from ..utils.config import SfmConfig
from .correspondences import build_observations, build_pair_tensors, static_observation_mask
from .mapper import Reconstruction, _failed

_PNP_CAP = 2048
_CAM_BUCKET = 16


def _pad_cameras(q, t, V_real):
    V_pad = ((V_real + _CAM_BUCKET - 1) // _CAM_BUCKET) * _CAM_BUCKET
    qp = np.tile(np.array([1, 0, 0, 0], np.float32), (V_pad, 1))
    tp = np.zeros((V_pad, 3), np.float32)
    qp[:V_real] = q
    tp[:V_real] = t
    return qp, tp, V_pad


def run_incremental_mapper(
    tracks: TrackArrays,
    height: int,
    width: int,
    cfg: Optional[SfmConfig] = None,
    params: Optional[np.ndarray] = None,
    log=print,
) -> Reconstruction:
    cfg = cfg or SfmConfig()
    if params is None:
        params = np.asarray(cameras.make_default_params(height, width), np.float32)
    num_images = tracks.num_frames

    # seg-geometry gate (see mapper.py): labels are advisory; exclusions wait
    # for epipolar evidence from the verified pairs below
    seg_dyn_obs = None
    if cfg.remove_dynamic and cfg.seg_geometry_gate and tracks.labels is not None:
        seg_dyn_obs = (tracks.labels != 0) & tracks.mask
        if not seg_dyn_obs.any():
            seg_dyn_obs = None
    if seg_dyn_obs is not None:
        static_mask = tracks.mask.copy()
    else:
        static_mask = static_observation_mask(tracks, cfg.remove_dynamic)
    pair_t = build_pair_tensors(tracks, static_mask, cfg.min_num_matches, seed=cfg.seed)
    if len(pair_t.pairs) < 1:
        return _failed(num_images, params, height, width)

    # NOTE: BA refines the shared focal; normalization must always use the
    # CURRENT intrinsics or PnP residuals drift against the refined geometry
    def norm(uv, f=None):
        f = f if f is not None else float(params[0])
        return (uv - params[..., 2:4]) / f

    focal0 = float(params[0])
    thres_sq = np.full(len(pair_t.pairs),
                       (cfg.geometric_verification_max_error_px / focal0) ** 2, np.float32)
    tv = estimate_relative_poses(
        jax.random.PRNGKey(cfg.seed),
        jnp.asarray(norm(pair_t.uv1)),
        jnp.asarray(norm(pair_t.uv2)),
        jnp.asarray(pair_t.mask),
        jnp.asarray(thres_sq),
    )
    num_inl = np.asarray(tv.num_inliers)
    verified_pairs = num_inl >= cfg.geometric_verification_min_num_inliers
    if seg_dyn_obs is not None:
        from .correspondences import track_inlier_stats

        good_v, total_v = track_inlier_stats(
            tracks.num_tracks, pair_t, verified_pairs, np.asarray(tv.inliers))
        rate = good_v / np.maximum(total_v, 1)
        rescued = (total_v >= cfg.seg_rescue_min_samples) & (
            rate >= cfg.seg_rescue_inlier_rate)
        cand = seg_dyn_obs & ~rescued[:, None]
        log(f"[incremental] seg-geometry gate: "
            f"{int(seg_dyn_obs.any(axis=1).sum())} seg-flagged tracks, "
            f"{int((seg_dyn_obs.any(axis=1) & rescued).sum())} rescued")
        if cand.sum() / max(tracks.mask.sum(), 1) <= 0.6:
            static_mask = static_mask & ~cand
    if cfg.geometric_dynamic_filter:
        from .correspondences import geometric_dynamic_track_filter

        dyn = geometric_dynamic_track_filter(
            tracks.num_tracks, pair_t, verified_pairs, np.asarray(tv.inliers),
            cfg.geometric_dynamic_max_inlier_rate,
            cfg.geometric_dynamic_min_samples,
        )
        if dyn.any():
            log(f"[incremental] geometric dynamic filter flagged {int(dyn.sum())} tracks")
            static_mask = static_mask & ~dyn[:, None]
    ang = np.asarray(tv.tri_angle)
    score = num_inl * np.minimum(np.degrees(ang), 10.0)
    score[num_inl < cfg.geometric_verification_min_num_inliers] = -1
    if score.max() <= 0:
        return _failed(num_images, params, height, width)
    seed_e = int(np.argmax(score))
    i0, j0 = map(int, pair_t.pairs[seed_e])
    log(f"[incremental] seed pair ({i0}, {j0}): {num_inl[seed_e]} inliers, "
        f"{np.degrees(ang[seed_e]):.1f} deg")

    # observation tensors over ALL images
    obs_t = build_observations(tracks, static_mask, min_track_len=2)
    N = len(obs_t.track_row)
    if N < 8:
        return _failed(num_images, params, height, width)
    # track-axis bucketing (mapper parity): device kernels specialize on N
    n_pad = -(-N // 32768) * 32768 - N
    obs = TrackObs(jnp.asarray(np.pad(obs_t.frame_idx, ((0, n_pad), (0, 0)))),
                   jnp.asarray(np.pad(obs_t.uv, ((0, n_pad), (0, 0), (0, 0)))),
                   jnp.asarray(np.pad(obs_t.mask, ((0, n_pad), (0, 0)))))
    jparams = jnp.asarray(params)

    registered = np.zeros(num_images, bool)
    unregistrable = np.zeros(num_images, bool)
    q_all = np.tile(np.array([1, 0, 0, 0], np.float32), (num_images, 1))
    t_all = np.zeros((num_images, 3), np.float32)
    registered[i0] = registered[j0] = True
    q_all[j0] = np.asarray(tv.q_rel[seed_e])
    t_all[j0] = np.asarray(tv.t_rel[seed_e])

    def retriangulate():
        """Triangulate with current poses; only registered observations count.

        Returns (X device [N+pad, 3], good/valid/errs host sliced to N)."""
        reg = jnp.asarray(registered)
        gated = obs.mask & reg[obs.frame_idx]
        X = triangulate_tracks(
            jnp.asarray(q_all), jnp.asarray(t_all), jparams,
            TrackObs(obs.frame_idx, obs.uv, gated),
        )
        good, valid, errs = filter_observations(
            jnp.asarray(q_all), jnp.asarray(t_all), jparams, X,
            TrackObs(obs.frame_idx, obs.uv, gated),
            cfg.ba.filter_max_reproj_error_px, cfg.ba.filter_min_tri_angle_deg,
        )
        return (X, np.asarray(good)[:N], np.asarray(valid)[:N],
                np.asarray(errs)[:N])

    X, good, valid, _ = retriangulate()
    log(f"[incremental] seed triangulation: {int(valid.sum())} points")

    def global_ba(refine_focal):
        nonlocal q_all, t_all, X, good, valid, jparams
        sub = np.nonzero(registered)[0]
        full2sub = np.full(num_images, 0, np.int64)
        full2sub[sub] = np.arange(len(sub))
        qp, tp, V_pad = _pad_cameras(q_all[sub], t_all[sub], len(sub))
        sub_frame = full2sub[obs_t.frame_idx].astype(np.int32)
        gmask = good & registered[obs_t.frame_idx] & valid[:, None]
        free = np.zeros((V_pad, 6), np.float32)
        free[: len(sub)] = np.asarray(default_free_masks(max(len(sub), 2)))[: len(sub)]
        # ranked track cap (mapper parity): the [N, K, 6, 6]-class BA block
        # tensors at protocol scale (252k tracks) exceed chip HBM (measured
        # OOM at 23.4 of 15.75 GB); the solve runs on the best max_tracks
        # tracks and every retriangulate() pass re-fits the full set to the
        # refined poses — only poses/intrinsics carry over.
        cap = cfg.ba.max_tracks
        if N > cap:
            nobs = gmask.sum(axis=1)
            score = valid.astype(np.int64) * 1000 + nobs
            selr = np.sort(np.argpartition(-score, cap)[:cap])
        else:
            selr = np.arange(N)
        pad_s = -(-len(selr) // 32768) * 32768 - len(selr)
        selr_p = np.pad(selr, (0, pad_s)).astype(np.int32)
        dsel = jnp.asarray(selr_p)
        smask = np.pad(gmask[selr], ((0, pad_s), (0, 0)))
        smask[len(selr):] = False
        state = bundle_adjust(
            jnp.asarray(qp), jnp.asarray(tp), jparams, X[dsel],
            TrackObs(jnp.asarray(np.pad(sub_frame[selr], ((0, pad_s), (0, 0)))),
                     obs.uv[dsel], jnp.asarray(smask)),
            jnp.asarray(free),
            jnp.asarray(np.pad(valid[selr], (0, pad_s)), jnp.float32),
            max_iterations=cfg.ba.max_num_iterations // 2,
            use_soft_l1=(cfg.ba.loss == "soft_l1"),
            refine_focal=refine_focal,
        )
        q_all[sub] = np.asarray(state.q)[: len(sub)]
        t_all[sub] = np.asarray(state.t)[: len(sub)]
        jparams = state.params

    last_ba_count = 2
    while True:
        # next-best view: most raw observations of currently-valid 3D points
        # (`good` only covers registered views, so use the full obs mask here)
        cand_counts = np.zeros(num_images, np.int64)
        vmask = obs_t.mask & valid[:, None]
        np.add.at(cand_counts, obs_t.frame_idx[vmask], 1)
        cand_counts[registered | unregistrable] = -1
        order = np.argsort(-cand_counts)
        progressed = False
        for img in order:
            if cand_counts[img] < max(cfg.min_num_matches, 6):
                break
            sel = vmask & (obs_t.frame_idx == img)
            tr, sl = np.nonzero(sel)
            M = min(len(tr), _PNP_CAP)
            Xc = np.zeros((_PNP_CAP, 3), np.float32)
            xc = np.zeros((_PNP_CAP, 2), np.float32)
            mc = np.zeros(_PNP_CAP, bool)
            f_now = float(np.asarray(jparams)[0])
            Xc[:M] = np.asarray(X)[tr[:M]]
            xc[:M] = norm(obs_t.uv[tr[:M], sl[:M]], f_now)
            mc[:M] = True
            res = estimate_pose_pnp(
                jax.random.PRNGKey(cfg.seed + int(img)),
                jnp.asarray(Xc), jnp.asarray(xc), jnp.asarray(mc),
                jnp.asarray((2 * cfg.geometric_verification_max_error_px / f_now) ** 2),
            )
            if int(res.num_inliers) < max(cfg.min_num_matches, 6):
                log(f"[incremental] image {img}: PnP failed "
                    f"({int(res.num_inliers)}/{M} inliers), deferring")
                unregistrable[img] = True
                continue
            registered[img] = True
            # a successful registration changes the map: give failed images
            # another chance (COLMAP retries failed registrations too)
            unregistrable[:] = False
            q_all[img] = np.asarray(res.q)
            t_all[img] = np.asarray(res.t)
            progressed = True
            log(f"[incremental] registered image {img} "
                f"({int(res.num_inliers)}/{M} PnP inliers, "
                f"{int(registered.sum())}/{num_images} total)")
            break
        if not progressed:
            break
        X, good, valid, _ = retriangulate()
        if registered.sum() >= 1.25 * last_ba_count:   # COLMAP growth schedule
            global_ba(cfg.ba.refine_focal_length)
            X, good, valid, _ = retriangulate()
            last_ba_count = int(registered.sum())

    if registered.sum() < 3:
        return _failed(num_images, params, height, width)
    for _ in range(2):   # final refinement rounds
        global_ba(cfg.ba.refine_focal_length)
        X, good, valid, errs = retriangulate()
    log(f"[incremental] done: {int(registered.sum())}/{num_images} images, "
        f"{int(valid.sum())} points")

    gated = good & registered[obs_t.frame_idx]
    support = float((gated & valid[:, None]).sum()) / max(int(obs_t.mask.sum()), 1)
    return Reconstruction(
        num_images=num_images,
        registered=registered,
        qvec=q_all,
        tvec=t_all,
        params=np.asarray(jparams),
        height=height,
        width=width,
        points=np.asarray(X)[:N],
        track_valid=valid,
        obs_frame_idx=obs_t.frame_idx,
        obs_uv=obs_t.uv,
        obs_mask=gated,
        obs_error=np.asarray(errs),
        track_row=obs_t.track_row,
        support=support,
    )
