"""Mapper behavior on degenerate two-view geometry (planar scene, rotation-
contaminated pairs) — the round-2 capability for reference parity with
two_view_geometry.cc's configuration handling inside the global mapper."""
import numpy as np
import pytest

from particlesfm_tpu.sfm.mapper import run_global_mapper
from particlesfm_tpu.tracks.store import TrackArrays
from particlesfm_tpu.utils.config import SfmConfig
from particlesfm_tpu.geometry.alignment import ate_rmse


def _project_scene(X, Rs, ts, f, cx, cy, h, w):
    """Tracks from 3D points over all views; mask = in-frustum."""
    T = len(Rs)
    N = len(X)
    xy = np.zeros((N, T, 2), np.float32)
    mask = np.zeros((N, T), bool)
    for t in range(T):
        Xc = X @ Rs[t].T + ts[t]
        z = Xc[:, 2]
        u = f * Xc[:, 0] / z + cx
        v = f * Xc[:, 1] / z + cy
        ok = (z > 0.1) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        xy[:, t, 0] = u
        xy[:, t, 1] = v
        mask[:, t] = ok
    return TrackArrays(xy=xy, mask=mask)


def _arc_cameras(T, radius=6.0, step_deg=3.0):
    Rs, ts, Cs = [], [], []
    for i in range(T):
        a = np.deg2rad(i * step_deg)
        C = np.array([radius * np.sin(a), 0.15 * i, -radius * np.cos(a) + radius])
        # look roughly at scene center ahead (z+)
        yaw = -a * 0.5
        R = np.array([
            [np.cos(yaw), 0, np.sin(yaw)],
            [0, 1, 0],
            [-np.sin(yaw), 0, np.cos(yaw)],
        ])
        Rs.append(R)
        ts.append(-R @ C)
        Cs.append(C)
    return np.array(Rs), np.array(ts), np.array(Cs)


class TestPlanarScene:
    def test_mapper_survives_planar_scene(self):
        """All-world-points-on-one-plane: essential RANSAC is degenerate, the
        classification repose-from-H path must keep the mapper on track."""
        rng = np.random.default_rng(0)
        T, h, w, f = 8, 480, 640, 768.0  # true focal = mapper prior (1.2*640)
        Rs, ts, Cs = _arc_cameras(T)
        # ground plane z = 8 (camera frame ~z+ looking), lateral extent wide
        X = np.stack([
            rng.uniform(-6, 6, 400), rng.uniform(-4, 4, 400), np.full(400, 8.0)
        ], 1)
        tracks = _project_scene(X, Rs, ts, f, w / 2, h / 2, h, w)
        tracks.xy += rng.normal(0, 0.3, tracks.xy.shape).astype(np.float32)
        cfg = SfmConfig()
        rec = run_global_mapper(tracks, h, w, cfg, log=lambda *a: None)
        assert rec.num_registered == T
        C_est = _centers(rec)
        err = ate_rmse(C_est[rec.registered], Cs[rec.registered])
        span = np.linalg.norm(Cs[-1] - Cs[0])
        assert err < 0.05 * span, (err, span)

    def test_classification_off_still_runs(self):
        """Control: same scene with classify_degenerate=False must not crash
        (may or may not recover good poses — planar E is ambiguous)."""
        rng = np.random.default_rng(0)
        T, h, w, f = 6, 480, 640, 768.0
        Rs, ts, Cs = _arc_cameras(T)
        X = np.stack([
            rng.uniform(-6, 6, 300), rng.uniform(-4, 4, 300), np.full(300, 8.0)
        ], 1)
        tracks = _project_scene(X, Rs, ts, f, w / 2, h / 2, h, w)
        cfg = SfmConfig()
        cfg.classify_degenerate = False
        rec = run_global_mapper(tracks, h, w, cfg, log=lambda *a: None)
        assert rec is not None


class TestPureRotation:
    def test_pure_rotation_fails_gracefully(self):
        """A tripod pan (no baseline anywhere) is unreconstructable: the mapper
        must detect the all-panoramic graph and return a failed reconstruction
        instead of fabricating positions."""
        rng = np.random.default_rng(1)
        T, h, w, f = 6, 480, 640, 768.0
        Rs, ts = [], []
        for i in range(T):
            yaw = np.deg2rad(2.5 * i)
            R = np.array([
                [np.cos(yaw), 0, np.sin(yaw)],
                [0, 1, 0],
                [-np.sin(yaw), 0, np.cos(yaw)],
            ])
            Rs.append(R)
            ts.append(np.zeros(3))          # shared center: pure rotation
        X = np.stack([
            rng.uniform(-5, 5, 300), rng.uniform(-3, 3, 300),
            rng.uniform(6, 14, 300)
        ], 1)
        tracks = _project_scene(X, np.array(Rs), np.array(ts), f, w / 2, h / 2, h, w)
        cfg = SfmConfig()
        rec = run_global_mapper(tracks, h, w, cfg, log=lambda *a: None)
        assert rec.num_registered == 0


def _centers(rec):
    from particlesfm_tpu.geometry import rotations as rot
    R = np.asarray(rot.quat_to_rotmat(rec.qvec))
    return np.einsum("tij,tj->ti", R.transpose(0, 2, 1), -rec.tvec)
