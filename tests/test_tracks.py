"""Trajectory engine + path-consistency optimizer tests.

The oracle below is an independent NumPy implementation of the reference's
greedy tracking semantics (track.py / trajectory.py), used for differential
testing of the scan-based engine.
"""
import numpy as np
import jax.numpy as jnp
from scipy import ndimage, optimize as sopt

from particlesfm_tpu.tracks import (
    run_tracker, TrackerConfig, assemble_tracks, sample_inside_window,
    optimize_locations, TrackArrays,
)


def bilinear(img, xy):
    """zero-padded bilinear sample of img [H,W,C] at xy [N,2] (test helper)."""
    H, W = img.shape[:2]
    x, y = xy[:, 0], xy[:, 1]
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    dx, dy = x - x0, y - y0
    out = 0.0
    for (iy, ix, w) in [
        (y0, x0, (1 - dx) * (1 - dy)),
        (y0, x0 + 1, dx * (1 - dy)),
        (y0 + 1, x0, (1 - dx) * dy),
        (y0 + 1, x0 + 1, dx * dy),
    ]:
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        v = img[np.clip(iy, 0, H - 1), np.clip(ix, 0, W - 1)] * valid[:, None]
        out = out + w[:, None] * v
    return out


def oracle_track(flows, occs, ratio):
    """NumPy re-statement of the reference greedy tracker (no optimization)."""
    T, H, W, _ = flows.shape
    trajs = []  # list of dict(start, pts, alive)
    cand_xy = np.stack(np.meshgrid(np.arange(0, W, ratio), np.arange(0, H, ratio)), -1)
    cand_xy = cand_xy.reshape(-1, 2).astype(np.float64)
    cand_mask = np.ones(len(cand_xy), bool)
    for f in range(T):
        for xy in cand_xy[cand_mask]:
            trajs.append({"start": f, "pts": [xy.copy()], "alive": True})
        act = [t for t in trajs if t["alive"]]
        cur = np.array([t["pts"][-1] for t in act])
        fl = bilinear(flows[f], cur)
        occ = bilinear(occs[f][..., None], cur)[:, 0]
        nxt = cur + fl
        ok = (
            (nxt[:, 0] > 0) & (nxt[:, 0] < W - 1)
            & (nxt[:, 1] > 0) & (nxt[:, 1] < H - 1)
            & (occ <= 0.1)
        )
        occupied = np.zeros((H, W))
        for t, n, o in zip(act, nxt, ok):
            if o:
                t["pts"].append(n)
                occupied[int(n[1]), int(n[0])] = 1
            else:
                t["alive"] = False
        edt = ndimage.distance_transform_edt(1.0 - occupied)
        cand_mask = (edt > ratio)[::ratio, ::ratio].reshape(-1)
    return trajs


def _synthetic_flow(T=6, H=24, W=32, shift=(2.0, 1.0)):
    flows = np.tile(np.array(shift, np.float32), (T, H, W, 1))
    occs = np.zeros((T, H, W), np.float32)
    occs[:, :4, :4] = 1.0  # a small occluded region
    return flows, occs


def test_tracker_matches_oracle():
    flows, occs = _synthetic_flow()
    T, H, W, _ = flows.shape
    cfg = TrackerConfig(sample_ratio=2, capacity=2048, path_consistency=False)
    out = run_tracker(jnp.asarray(flows), jnp.asarray(occs), None, None, cfg, H, W)
    tracks = assemble_tracks(out, min_len=1)
    ref = oracle_track(flows.astype(np.float64), occs.astype(np.float64), 2)

    assert int(out.overflow) == 0
    assert tracks.num_tracks == len(ref)
    # sort both by (start_frame, first position) for comparison
    def keyify(start, pts0):
        return (start, round(float(pts0[1]), 3), round(float(pts0[0]), 3))

    ours = {}
    for i in range(tracks.num_tracks):
        t = np.nonzero(tracks.mask[i])[0]
        ours[keyify(t[0], tracks.xy[i, t[0]])] = tracks.xy[i, t]
    for r in ref:
        k = keyify(r["start"], r["pts"][0])
        assert k in ours, f"missing traj {k}"
        np.testing.assert_allclose(ours[k], np.array(r["pts"]), atol=1e-3)


def test_tracker_min_len_filter():
    flows, occs = _synthetic_flow()
    T, H, W, _ = flows.shape
    cfg = TrackerConfig(sample_ratio=2, capacity=2048, path_consistency=False)
    out = run_tracker(jnp.asarray(flows), jnp.asarray(occs), None, None, cfg, H, W)
    t3 = assemble_tracks(out, min_len=3)
    t1 = assemble_tracks(out, min_len=1)
    assert t3.num_tracks < t1.num_tracks
    assert t3.lengths.min() >= 3


def test_optimize_locations_matches_scipy(rng):
    H, W = 20, 28
    flow12 = rng.normal(scale=1.5, size=(H, W, 2)).astype(np.float32)
    n = 40
    x0 = np.stack([rng.uniform(2, W - 3, n), rng.uniform(2, H - 3, n)], -1)
    uv_ref1 = x0 + rng.normal(scale=0.5, size=(n, 2))
    uv_ref2 = x0 + rng.normal(scale=0.8, size=(n, 2))
    scale = rng.uniform(0.0, 1.0, size=n)
    p0 = np.concatenate([uv_ref1, uv_ref2], -1) + rng.normal(scale=0.3, size=(n, 4))

    p_opt = np.asarray(
        optimize_locations(
            jnp.asarray(p0, jnp.float32),
            jnp.asarray(uv_ref1, jnp.float32),
            jnp.asarray(uv_ref2, jnp.float32),
            jnp.asarray(scale, jnp.float32),
            jnp.asarray(flow12),
            num_iters=30,
        )
    )

    def resid(p, i):
        x1, x2 = p[:2], p[2:]
        f12 = bilinear_clamp(flow12, x1[None])[0]
        return np.concatenate(
            [x1 - uv_ref1[i], (x2 - uv_ref2[i]) * scale[i], (x2 - x1) - f12]
        )

    def bilinear_clamp(img, xy):
        Hh, Ww = img.shape[:2]
        x = np.clip(xy[:, 0], 0, Ww - 1)
        y = np.clip(xy[:, 1], 0, Hh - 1)
        x0i = np.clip(np.floor(x).astype(int), 0, Ww - 2)
        y0i = np.clip(np.floor(y).astype(int), 0, Hh - 2)
        dx, dy = (x - x0i)[:, None], (y - y0i)[:, None]
        return (
            img[y0i, x0i] * (1 - dx) * (1 - dy)
            + img[y0i, x0i + 1] * dx * (1 - dy)
            + img[y0i + 1, x0i] * (1 - dx) * dy
            + img[y0i + 1, x0i + 1] * dx * dy
        )

    for i in range(0, n, 7):
        ref = sopt.least_squares(resid, p0[i], args=(i,), method="lm", xtol=1e-12)
        ours_cost = np.sum(resid(p_opt[i], i) ** 2)
        ref_cost = np.sum(resid(ref.x, i) ** 2)
        assert ours_cost <= ref_cost * 1.05 + 1e-8


def test_sample_inside_window(rng):
    # build tracks: 5 frames, traj0 covers 0-4, traj1 covers 2-4, traj2 covers 0-1
    xy = np.zeros((3, 5, 2), np.float32)
    mask = np.zeros((3, 5), bool)
    mask[0, :] = True
    mask[1, 2:] = True
    mask[2, :2] = True
    xy[0] = np.arange(10).reshape(5, 2)
    tracks = TrackArrays(xy=xy, mask=mask)
    locs, present, idx = sample_inside_window(tracks, [0, 1, 2, 3], min_length=3)
    assert list(idx) == [0]
    np.testing.assert_array_equal(present, [[True] * 4])
    locs, present, idx = sample_inside_window(tracks, [2, 3, 4], min_length=3)
    assert list(idx) == [0, 1]


def test_track_arrays_reference_roundtrip():
    xy = np.random.default_rng(0).uniform(size=(4, 6, 2)).astype(np.float32)
    mask = np.ones((4, 6), bool)
    mask[1, :3] = False
    tracks = TrackArrays(xy=xy * mask[..., None], mask=mask)
    d = tracks.to_reference_dict()
    back = TrackArrays.from_reference_dict(d, num_frames=6)
    np.testing.assert_array_equal(back.mask, tracks.mask)
    np.testing.assert_allclose(back.xy, tracks.xy, atol=1e-6)


def test_optimize_locations_patch_matches_full(rng):
    """Gather-free patch mode must reproduce the full-map LM wherever the
    refinement stays inside its 6x6 window (always, for subpixel travel)."""
    H, W = 24, 32
    flow12 = rng.normal(scale=1.2, size=(H, W, 2)).astype(np.float32)
    n = 64
    x0 = np.stack([rng.uniform(1, W - 2, n), rng.uniform(1, H - 2, n)], -1)
    uv_ref1 = x0 + rng.normal(scale=0.5, size=(n, 2))
    uv_ref2 = x0 + rng.normal(scale=0.8, size=(n, 2))
    scale = rng.uniform(0.0, 1.0, size=n)
    p0 = np.concatenate([uv_ref1, uv_ref2], -1) + rng.normal(scale=0.3, size=(n, 4))
    args = (
        jnp.asarray(p0, jnp.float32),
        jnp.asarray(uv_ref1, jnp.float32),
        jnp.asarray(uv_ref2, jnp.float32),
        jnp.asarray(scale, jnp.float32),
        jnp.asarray(flow12),
    )
    full = np.asarray(optimize_locations(*args, num_iters=25))
    pat = np.asarray(optimize_locations(*args, num_iters=25, patch=True))
    assert np.max(np.abs(full - pat)) < 5e-3, np.max(np.abs(full - pat))
