"""Tests for the eval harness, COLMAP database export, and io interop."""
import sqlite3
import numpy as np
import pytest

from particlesfm_tpu.eval.pose_eval import (
    evaluate_sequence, read_sintel_cam, write_sintel_cam, summarize,
)
from particlesfm_tpu.eval.traj_iou import trajectory_label_metrics
from particlesfm_tpu.io.colmap_db import (
    ColmapDatabase, export_tracks_to_database, tracks_to_matches,
    pair_id_from_image_ids, image_ids_from_pair_id,
)
from particlesfm_tpu.io.trackio import save_reference_track_npy, load_reference_track_npy
from particlesfm_tpu.io.images import write_depth_png16, read_depth_png16
from particlesfm_tpu.tracks.store import TrackArrays


def make_poses(n=10, drift=0.0, rng=None):
    poses = {}
    for i in range(n):
        R = np.eye(3)
        t = np.array([0.5 * i + (drift * i * i), 0.0, 2.0])
        poses[f"f{i:04d}"] = np.concatenate([R, t[:, None]], axis=1)
    return poses


class TestPoseEval:
    def test_perfect_poses(self):
        gt = make_poses()
        res = evaluate_sequence(gt, gt, name="x")
        assert not res.failed
        assert res.ate < 1e-9
        assert res.rpe_trans < 1e-9 and res.rpe_rot_deg < 1e-6

    def test_failure_rule(self):
        gt = make_poses(10)
        est = {k: v for k, v in list(gt.items())[:7]}   # 70% < 80%
        res = evaluate_sequence(est, gt)
        assert res.failed

    def test_drifted_poses_scored(self):
        gt = make_poses(10)
        est = make_poses(10, drift=0.01)
        res = evaluate_sequence(est, gt)
        assert not res.failed and res.ate > 0
        assert "MEAN" in summarize([res])

    def test_sintel_cam_roundtrip(self, tmp_path):
        K = np.diag([1120.0, 1120.0, 1.0]); K[0, 2], K[1, 2] = 511.5, 217.5
        P = np.concatenate([np.eye(3), [[0.1], [0.2], [0.3]]], axis=1)
        write_sintel_cam(tmp_path / "a.cam", K, P)
        K2, P2 = read_sintel_cam(tmp_path / "a.cam")
        np.testing.assert_allclose(K2, K)
        np.testing.assert_allclose(P2, P)


class TestTrajIoU:
    def test_perfect_labels(self):
        rng = np.random.default_rng(0)
        N, T, H, W = 30, 4, 32, 48
        xy = rng.uniform(0, [W - 1, H - 1], (N, T, 2)).astype(np.float32)
        mask = np.ones((N, T), bool)
        gt_masks = np.zeros((T, H, W))
        gt_masks[:, :, : W // 2] = 1.0   # left half dynamic
        labels = (xy[..., 0] < W / 2 - 0.5).astype(np.int8)
        # avoid rounding boundary ambiguity
        sel = np.abs(xy[..., 0] - (W / 2 - 0.5)) > 1.0
        tr = TrackArrays(xy=xy, mask=mask & sel, labels=labels)
        m = trajectory_label_metrics(tr, gt_masks)
        assert m["iou"] > 0.99 and m["f1"] > 0.99


class TestColmapDb:
    def test_pair_id_roundtrip(self):
        assert image_ids_from_pair_id(pair_id_from_image_ids(3, 17)) == (3, 17)
        assert pair_id_from_image_ids(17, 3) == pair_id_from_image_ids(3, 17)

    def test_tracks_to_matches_sample_k(self):
        T = 30
        xy = np.tile(np.array([5.0, 7.0], np.float32), (1, T, 1))
        mask = np.ones((1, T), bool)
        tr = TrackArrays(xy=xy, mask=mask)
        kps, mts = tracks_to_matches(tr, sample_k=5)
        # every observation contributes at most sample_k matches as a source,
        # so the total match count is bounded by T * sample_k (dedup may merge
        # symmetric contributions)
        total = sum(len(m) for m in mts.values())
        assert 0 < total <= T * 5
        # all matched pairs reference the single keypoint (index 0) per frame
        for m in mts.values():
            assert (m == 0).all()

    def test_export_database(self, tmp_path):
        rng = np.random.default_rng(0)
        N, T = 40, 6
        xy = rng.uniform(0, [100, 80], (N, T, 2)).astype(np.float32)
        mask = rng.random((N, T)) < 0.8
        tr = TrackArrays(xy=xy, mask=mask)
        db_path = tmp_path / "database.db"
        export_tracks_to_database(
            db_path, tr, 80, 100, pairs_txt=tmp_path / "pairs.txt"
        )
        conn = sqlite3.connect(db_path)
        (n_img,) = conn.execute("SELECT COUNT(*) FROM images").fetchone()
        (n_cam,) = conn.execute("SELECT COUNT(*) FROM cameras").fetchone()
        (n_match,) = conn.execute("SELECT COUNT(*) FROM matches").fetchone()
        (n_tvg,) = conn.execute("SELECT COUNT(*) FROM two_view_geometries").fetchone()
        assert n_img == T and n_cam == 1
        assert n_match == n_tvg and n_match > 0
        assert (tmp_path / "pairs.txt").read_text().count("\n") == n_match
        # keypoint blob decodes as [N, 6] float32
        r, c, b = conn.execute("SELECT rows, cols, data FROM keypoints WHERE image_id=1").fetchone()
        kp = np.frombuffer(b, np.float32).reshape(r, c)
        assert c == 6


class TestIoInterop:
    def test_track_npy_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        xy = rng.uniform(0, 50, (7, 9, 2)).astype(np.float32)
        mask = rng.random((7, 9)) < 0.6
        mask[:, 2] = True
        labels = ((rng.random((7, 9)) < 0.5) & mask).astype(np.int8)
        tr = TrackArrays(xy=xy, mask=mask, labels=labels)
        save_reference_track_npy(tmp_path / "track.npy", tr)
        back = load_reference_track_npy(tmp_path / "track.npy", num_frames=9)
        np.testing.assert_array_equal(back.mask, mask)
        np.testing.assert_allclose(back.xy[mask], xy[mask], atol=1e-6)

    def test_depth_png16_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        d = rng.uniform(0, 1, (16, 24)).astype(np.float32)
        write_depth_png16(tmp_path / "d.png", d)
        back = read_depth_png16(tmp_path / "d.png")
        np.testing.assert_allclose(back, d, atol=1.0 / 65535 + 1e-6)
