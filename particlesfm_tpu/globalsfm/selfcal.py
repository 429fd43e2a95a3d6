"""Shared-focal self-calibration from fundamental matrices.

The reference assumes a SIMPLE_PINHOLE camera whose focal starts at a heuristic
prior (colmap feature_importer default, consumed by gmapper's database cache)
and is refined only inside bundle adjustment
(/root/reference/sfm/gmapper/src/optim/bundle_adjustment.h:48-102,
refine_focal_length). Measured at protocol scale (48 frames, 1024x436, ~100k
tracks), free-focal BA from a heuristic prior drifts systematically HIGH
(1.1-4.7x ground truth across every acceptance sequence): with rotations pinned
in the first refinement phase, a focal inflation trades off against scene depth
almost residual-free, and the joint phase then polishes inside the warped basin.

This module removes the dependence on the prior altogether: the shared focal is
estimated directly from raw pixel correspondences BEFORE any intrinsics enter
the pipeline.

  1. batched fundamental-matrix RANSAC over all covisible pairs in lockstep
     (same fixed-hypothesis-budget design as twoview.estimate_relative_poses,
     but the model stays projective: rank-2 F, no essential projection);
  2. a 1-D log-grid search over candidate focals minimizing the
     Mendonca-Cipolla essentiality cost

         c_p(f) = (s1 - s2) / (s1 + s2)   of   E_p(f) = K(f)^T F_p K(f),

     where s1 >= s2 are the top singular values: E(f) lies on the essential
     manifold iff s1 == s2, which holds exactly when K(f) matches the true
     intrinsics. Per-pair curves are normalized by their own median so
     degenerate pairs (small baseline, planar, pure rotation -- flat or
     uninformative curves) cannot dominate, then aggregated by inlier-weighted
     mean and refined with a 3-point parabola in log f.

Everything is flat-batched [P*C, 3, 3] closed-form linalg (geometry/linalg3)
-- no iterative eigensolvers, no data-dependent shapes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import epipolar
from ..geometry.linalg3 import eigh3x3_desc
from .twoview import _sample_indices


class FundamentalResult(NamedTuple):
    F: jnp.ndarray            # [P, 3, 3] pixel-coordinate fundamental matrices
    inliers: jnp.ndarray      # [P, M] bool
    num_inliers: jnp.ndarray  # [P] int32


class FocalEstimate(NamedTuple):
    focal: jnp.ndarray        # [] estimated shared focal (pixels)
    confidence: jnp.ndarray   # [] in [0, 1]: fraction of informative pairs
                              #    whose own curve minimum agrees with the
                              #    global one within 20%
    num_pairs: jnp.ndarray    # [] int32 pairs that contributed
    curve: jnp.ndarray        # [C] aggregated cost curve (diagnostics)
    f_grid: jnp.ndarray       # [C] candidate focals


@partial(jax.jit, static_argnames=("num_hypotheses",))
def estimate_fundamentals(
    key: jax.Array,
    uv1: jnp.ndarray,        # [P, M, 2] raw pixel coords in image i
    uv2: jnp.ndarray,        # [P, M, 2] raw pixel coords in image j
    mask: jnp.ndarray,       # [P, M] bool
    thres_px_sq: float,      # squared Sampson threshold (px^2)
    num_hypotheses: int = 64,
) -> FundamentalResult:
    """Fixed-budget fundamental-matrix RANSAC for all pairs in one kernel."""
    P, M, _ = uv1.shape
    S = num_hypotheses
    keys = jax.random.split(key, P)
    idx = jax.vmap(lambda k, m: _sample_indices(k, m, S))(keys, mask)  # [P,S,8]

    rows = jnp.arange(P)[:, None, None]
    s1 = uv1[rows, idx]
    s2 = uv2[rows, idx]
    smask = mask[rows, idx].astype(uv1.dtype)

    F0 = epipolar.eight_point(
        s1.reshape(P * S, 8, 2), s2.reshape(P * S, 8, 2), smask.reshape(P * S, 8)
    ).reshape(P, S, 3, 3)
    err = epipolar.sampson_error(F0, uv1[:, None], uv2[:, None])  # [P, S, M]
    inl = (err < thres_px_sq) & mask[:, None]
    scores = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(scores, axis=-1)
    best_inl = jnp.take_along_axis(inl, best[:, None, None], axis=1)[:, 0]
    F_best = jnp.take_along_axis(F0, best[:, None, None, None], axis=1)[:, 0]

    # one masked LS refit on the winning consensus set
    F_refit = epipolar.eight_point(uv1, uv2, best_inl.astype(uv1.dtype))
    err_refit = epipolar.sampson_error(F_refit, uv1, uv2)
    inl_refit = (err_refit < thres_px_sq) & mask
    better = jnp.sum(inl_refit.astype(jnp.int32), -1) >= jnp.sum(
        best_inl.astype(jnp.int32), -1
    )
    F_final = jnp.where(better[:, None, None], F_refit, F_best)
    inl_final = jnp.where(better[:, None], inl_refit, best_inl)
    return FundamentalResult(
        F_final, inl_final, jnp.sum(inl_final.astype(jnp.int32), -1)
    )


def focal_cost_curves(
    F: jnp.ndarray,          # [P, 3, 3] pixel-coordinate fundamentals
    pp: jnp.ndarray,         # [2] principal point (cx, cy)
    f_grid: jnp.ndarray,     # [C] candidate focals
) -> jnp.ndarray:
    """Mendonca-Cipolla essentiality cost for every (pair, candidate): [P, C]."""
    C = f_grid.shape[0]
    K = jnp.zeros((C, 3, 3), F.dtype)
    K = K.at[:, 0, 0].set(f_grid).at[:, 1, 1].set(f_grid)
    K = K.at[:, 0, 2].set(pp[0]).at[:, 1, 2].set(pp[1]).at[:, 2, 2].set(1.0)
    E = jnp.einsum("cji,pjk,ckl->pcil", K, F, K)           # [P, C, 3, 3]
    P = F.shape[0]
    EtE = jnp.einsum("bji,bjk->bik", E.reshape(P * C, 3, 3), E.reshape(P * C, 3, 3))
    w, _ = eigh3x3_desc(EtE)                                # descending eigvals
    s = jnp.sqrt(jnp.maximum(w, 0.0)).reshape(P, C, 3)
    return (s[..., 0] - s[..., 1]) / jnp.maximum(s[..., 0] + s[..., 1], 1e-12)


@partial(jax.jit, static_argnames=("num_candidates", "num_hypotheses",
                                   "reject_planar"))
def estimate_shared_focal(
    key: jax.Array,
    uv1: jnp.ndarray,        # [P, M, 2] raw pixel coords
    uv2: jnp.ndarray,
    mask: jnp.ndarray,       # [P, M]
    pp: jnp.ndarray,         # [2] principal point
    f_lo: float,
    f_hi: float,
    thres_px_sq: float = 16.0,
    min_inliers: int = 24,
    num_candidates: int = 96,
    num_hypotheses: int = 64,
    reject_planar: bool = True,
) -> FocalEstimate:
    """Estimate the shared focal length from pixel correspondences alone.

    `reject_planar`: pairs a homography explains down to the noise floor carry
    no focal signal but AGREE with each other (the fitted F collapses to the
    degenerate [e]x.H family, whose essentiality curve dips at a consistent
    wrong focal — measured conf 0.89 at 1.6x GT on an all-planar scene), so
    they must be excluded, not just down-weighted. The tight-threshold
    criterion (thres/16, mirroring twoview.classify_two_view) keeps ordinary
    small-baseline video pairs, which are loosely H-explainable but not
    tightly."""
    fr = estimate_fundamentals(key, uv1, uv2, mask, thres_px_sq, num_hypotheses)
    f_grid = jnp.exp(
        jnp.linspace(jnp.log(f_lo), jnp.log(f_hi), num_candidates)
    ).astype(uv1.dtype)
    curves = focal_cost_curves(fr.F, jnp.asarray(pp, uv1.dtype), f_grid)  # [P,C]

    w_pair = jnp.where(fr.num_inliers >= min_inliers,
                       jnp.sqrt(fr.num_inliers.astype(curves.dtype)), 0.0)
    if reject_planar:
        from ..geometry.homography import homography_ransac, symmetric_transfer_error

        k_h, _ = jax.random.split(key)
        H, _, num_h = homography_ransac(
            k_h, uv1, uv2, mask, jnp.full(uv1.shape[0], thres_px_sq, uv1.dtype),
            num_hypotheses=32,
        )
        err_h = symmetric_transfer_error(H, uv1, uv2)
        num_h_tight = jnp.sum(
            ((err_h < thres_px_sq / 16.0) & mask).astype(jnp.int32), -1)
        planar = (
            (num_h.astype(curves.dtype)
             >= 0.85 * jnp.maximum(fr.num_inliers, 1).astype(curves.dtype))
            & (num_h_tight.astype(curves.dtype)
               > 0.5 * jnp.maximum(num_h, 1).astype(curves.dtype))
        )
        w_pair = jnp.where(planar, 0.0, w_pair)
    # self-normalize each pair's curve: a flat (degenerate-geometry) curve
    # becomes ~1 everywhere and contributes no gradient; informative pairs
    # contribute a dip at the true focal
    med = jnp.median(curves, axis=1, keepdims=True)
    norm_curves = curves / jnp.maximum(med, 1e-9)
    agg = jnp.sum(norm_curves * w_pair[:, None], axis=0) / jnp.maximum(
        jnp.sum(w_pair), 1e-9
    )                                                       # [C]

    i = jnp.argmin(agg)
    im = jnp.clip(i - 1, 0, num_candidates - 1)
    ip = jnp.clip(i + 1, 0, num_candidates - 1)
    # 3-point parabola in log f (uniform log grid)
    ym, y0, yp = agg[im], agg[i], agg[ip]
    denom = ym - 2.0 * y0 + yp
    shift = jnp.where(jnp.abs(denom) > 1e-12,
                      jnp.clip(0.5 * (ym - yp) / jnp.maximum(denom, 1e-12),
                               -1.0, 1.0),
                      0.0)
    interior = (i > 0) & (i < num_candidates - 1)
    shift = jnp.where(interior, shift, 0.0)
    step = (jnp.log(f_hi) - jnp.log(f_lo)) / (num_candidates - 1)
    f_hat = jnp.exp(jnp.log(f_grid[i]) + shift * step)

    # agreement confidence: informative pairs whose own curve minimum lands
    # within 20% of the global estimate. "Informative" = enough inliers AND a
    # real dip (min < 0.7 * median of own curve).
    per_min_i = jnp.argmin(curves, axis=1)
    per_f = f_grid[per_min_i]
    per_depth = jnp.take_along_axis(curves, per_min_i[:, None], axis=1)[:, 0]
    informative = (w_pair > 0) & (per_depth < 0.7 * jnp.maximum(med[:, 0], 1e-9))
    agree = informative & (jnp.abs(jnp.log(per_f / f_hat)) < 0.18)
    n_inf = jnp.sum(informative.astype(jnp.int32))
    conf = jnp.sum(agree.astype(curves.dtype)) / jnp.maximum(
        n_inf.astype(curves.dtype), 1.0
    )
    conf = jnp.where(n_inf >= 8, conf, 0.0)
    return FocalEstimate(f_hat, conf, n_inf, agg, f_grid)


def estimate_focal_from_flows(
    flows: dict,
    height: int,
    width: int,
    seed: int = 0,
    grid_step: int = 10,
    max_points: int = 2048,
    thres_px_sq: float = 4.0,
    compose_strides=(2, 4),
    fb_thresh_px: float = 0.5,
) -> dict:
    """Shared-focal self-calibration from dense flow fields (host entry).

    Builds tracker-free correspondences by chaining the forward flow field over
    `compose_strides` steps with a forward-backward consistency gate at every
    hop, then runs `estimate_shared_focal`. Two measured design points:

    - Flow-level correspondences beat tracker output (the path-consistency
      optimizer compounds per-step flow bias over track length: focal from
      tracks 39% high, from the same flow directly 15%, from photometrically
      refined flow 2-4% on the acceptance set).
    - Single-step pairs are too short-baseline to condition focal — the
      essentiality curve is shallow and the estimate seed-unstable (swings
      1458-1612 on one sequence). fb-gated composition to stride 4 deepens the
      curve (dip 0.72 -> 0.39) and stabilizes the estimate to +-0.2%.

    Falls back to raw stride-1/2 pairs when flow_b is absent.

    Returns a JSON-ready dict {focal, confidence, num_pairs, dip, interior};
    `dip` is the aggregated curve's min/median contrast (< ~0.5 means a real
    minimum), `interior` False flags a boundary minimum (not a calibration).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    mx = min(24, max(2, width // 8))
    my = min(24, max(2, height // 8))
    xs = np.arange(mx, width - mx, grid_step)
    ys = np.arange(my, height - my, grid_step)
    gx, gy = np.meshgrid(xs, ys)
    grid = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    if len(grid) < 64:  # image too small to carry a focal signal
        return {"focal": float(max(height, width)), "confidence": 0.0,
                "num_pairs": 0, "dip": 1.0, "interior": False}
    if len(grid) > max_points:
        grid = grid[rng.choice(len(grid), max_points, replace=False)]

    from ..ops.sampling import bilinear_sample

    uv1s, uv2s, oks = [], [], []
    if "flow_b" in flows and "flow_f" in flows:
        ff = jnp.asarray(flows["flow_f"])
        fb = jnp.asarray(flows["flow_b"])
        T = ff.shape[0]
        samp_b = jax.vmap(bilinear_sample)   # fields [Pw,H,W,2], pts [Pw,M,2]

        @partial(jax.jit, static_argnames=("K",))
        def compose(ff, fb, grid_d, K):
            """fb-gated K-hop composition, ONE dispatch per stride (the hop
            loop unrolls inside the jit — per-hop dispatches through the
            tunnel dominated the selfcal wall time)."""
            nw = T - K + 1
            t0s = jnp.arange(nw)
            p = jnp.broadcast_to(grid_d, (nw,) + grid_d.shape)
            ok = jnp.ones((nw, grid_d.shape[0]), bool)
            for k in range(K):
                f = samp_b(ff[t0s + k], p)
                pn = p + f
                b = samp_b(fb[t0s + k], pn)
                err = jnp.linalg.norm(f + b, axis=-1)
                ok &= (
                    (err < fb_thresh_px)
                    & (pn[..., 0] > 4) & (pn[..., 0] < width - 4)
                    & (pn[..., 1] > 4) & (pn[..., 1] < height - 4)
                )
                p = pn
            return p, ok

        grid_d = jnp.asarray(grid)
        for K in compose_strides:
            nw = T - K + 1
            if nw < 1:
                continue
            p, ok = compose(ff, fb, grid_d, K)
            uv1s.append(np.broadcast_to(grid, (nw,) + grid.shape))
            uv2s.append(np.asarray(p))
            oks.append(np.asarray(ok))
        uv1 = np.concatenate(uv1s)
        uv2 = np.concatenate(uv2s)
        ok = np.concatenate(oks)
    else:
        for name in ("flow_f", "flow_f2"):
            if name not in flows:
                continue
            fl = jnp.asarray(flows[name])                # [P, H, W, 2]
            samp_all = jax.vmap(
                lambda f: bilinear_sample(f, jnp.asarray(grid)))(fl)
            uv2s.append(np.asarray(samp_all) + grid[None])
            uv1s.append(np.repeat(grid[None], fl.shape[0], 0))
        uv1 = np.concatenate(uv1s)
        uv2 = np.concatenate(uv2s)
        ok = (
            (uv2[..., 0] > 4) & (uv2[..., 0] < width - 4)
            & (uv2[..., 1] > 4) & (uv2[..., 1] < height - 4)
        )
    pp = jnp.asarray([width / 2.0, height / 2.0], jnp.float32)
    est = estimate_shared_focal(
        jax.random.PRNGKey(seed), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.asarray(ok), pp, 0.3 * max(height, width), 3.0 * max(height, width),
        thres_px_sq=thres_px_sq)
    curve = np.asarray(est.curve)
    grid = np.asarray(est.f_grid)
    dip = float(curve.min() / max(float(np.median(curve)), 1e-9))
    return {
        "focal": float(est.focal),
        "confidence": float(est.confidence),
        "num_pairs": int(est.num_pairs),
        "dip": dip,
        # a minimum at the grid boundary is not a minimum: reject downstream
        "interior": bool(grid[1] < float(est.focal) < grid[-2]),
    }
