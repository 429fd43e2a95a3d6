"""Two-view degenerate-configuration classification tests.

Covers the reference capability at two_view_geometry.h:48-67 /
two_view_geometry.cc:285-375: planar scenes, pure rotations (panoramic), and
watermark-style border translations must be detected; general 3D scenes must
classify CALIBRATED. Plus homography estimation/decomposition unit tests.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from particlesfm_tpu.geometry.homography import (
    decompose_homography, dlt_homography, homography_ransac,
    symmetric_transfer_error)
from particlesfm_tpu.globalsfm.twoview import (
    CONFIG_CALIBRATED, CONFIG_PANORAMIC, CONFIG_PLANAR, CONFIG_WATERMARK,
    classify_two_view, estimate_relative_poses)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _plane_points(rng, n, normal, d, extent=1.0):
    """Points on plane n.X = d (camera-1 frame, in front of camera)."""
    pts = rng.uniform(-extent, extent, (n, 3))
    normal = normal / np.linalg.norm(normal)
    pts = pts - np.outer(pts @ normal - d, normal)
    return pts


def _project(X, R=np.eye(3), t=np.zeros(3)):
    Xc = X @ R.T + t
    return Xc[:, :2] / Xc[:, 2:3]


class TestHomography:
    def test_dlt_recovers_synthetic_h(self):
        rng = np.random.default_rng(0)
        R = _rot_y(0.2)
        t = np.array([0.3, -0.1, 0.05])
        n = np.array([0.1, 0.05, 1.0])
        n = n / np.linalg.norm(n)
        d = 4.0
        H_true = R + np.outer(t, n) / d
        X = _plane_points(rng, 40, n, d) + np.array([0, 0, 4.0])
        # re-project points to actually lie on plane n.X=d after shift
        X = X - np.outer(X @ n - d, n)
        x1 = _project(X)
        x2 = _project(X, R, t)
        H = np.asarray(dlt_homography(jnp.asarray(x1[None]), jnp.asarray(x2[None])))[0]
        err = np.asarray(
            symmetric_transfer_error(jnp.asarray(H)[None], jnp.asarray(x1)[None],
                                     jnp.asarray(x2)[None])
        )
        assert np.median(err) < 1e-8
        H_true_n = H_true / np.linalg.norm(H_true)
        H_n = H * np.sign(H.ravel() @ H_true_n.ravel())
        assert np.allclose(H_n, H_true_n, atol=1e-5)

    def test_decompose_recovers_pose(self):
        rng = np.random.default_rng(1)
        R = _rot_y(0.15)
        t = np.array([0.4, 0.1, -0.1])
        n = np.array([0.0, 0.0, 1.0])
        d = 3.0
        X = _plane_points(rng, 60, n, d)
        x1 = _project(X)
        x2 = _project(X, R, t)
        H = dlt_homography(jnp.asarray(x1[None]), jnp.asarray(x2[None]))
        R_est, t_est, n_est, t_mag = decompose_homography(
            H, jnp.asarray(x1[None]), jnp.asarray(x2[None])
        )
        R_est = np.asarray(R_est)[0]
        t_est = np.asarray(t_est)[0]
        assert np.allclose(R_est, R, atol=2e-3), R_est
        t_dir = t / np.linalg.norm(t)
        assert abs(float(t_est @ t_dir)) > 0.999
        assert float(t_mag[0]) > 0.05  # real baseline -> not panoramic

    def test_decompose_pure_rotation(self):
        rng = np.random.default_rng(2)
        R = _rot_y(0.1) @ np.array(
            [[1, 0, 0], [0, np.cos(0.05), -np.sin(0.05)], [0, np.sin(0.05), np.cos(0.05)]]
        )
        X = rng.uniform(-1, 1, (50, 3)) + np.array([0, 0, 5.0])
        x1 = _project(X)
        x2 = _project(X, R, np.zeros(3))
        H = dlt_homography(jnp.asarray(x1[None]), jnp.asarray(x2[None]))
        R_est, t_est, n_est, t_mag = decompose_homography(
            H, jnp.asarray(x1[None]), jnp.asarray(x2[None])
        )
        assert float(t_mag[0]) < 5e-3       # zero baseline signature
        assert np.allclose(np.asarray(R_est)[0], R, atol=2e-3)


def _pad(x, M):
    out = np.zeros((M, 2), np.float32)
    out[: len(x)] = x
    m = np.zeros(M, bool)
    m[: len(x)] = True
    return out, m


def _classify_scene(x1, x2, uv1, uv2, hw, thres_sq=1e-5):
    M = x1.shape[0]
    e = estimate_relative_poses(
        jax.random.PRNGKey(0), jnp.asarray(x1[None]), jnp.asarray(x2[None]),
        jnp.ones((1, M), bool), jnp.full((1,), thres_sq, jnp.float32),
    )
    cls = classify_two_view(
        jax.random.PRNGKey(1), jnp.asarray(x1[None]), jnp.asarray(x2[None]),
        jnp.ones((1, M), bool), jnp.full((1,), thres_sq, jnp.float32),
        e.inliers, jnp.asarray(uv1[None]), jnp.asarray(uv2[None]), hw,
    )
    return int(cls.config[0]), cls


def _to_pix(x, f=400.0, c=(320, 240)):
    return x * f + np.asarray(c)


class TestClassification:
    def test_general_scene_calibrated(self):
        rng = np.random.default_rng(3)
        R = _rot_y(0.1)
        t = np.array([0.5, 0.0, 0.1])
        X = rng.uniform(-2, 2, (80, 3)) + np.array([0, 0, 6.0])
        X[:, 2] += rng.uniform(-2, 2, 80)   # real depth variation
        x1 = _project(X).astype(np.float32)
        x2 = _project(X, R, t).astype(np.float32)
        cfg, _ = _classify_scene(x1, x2, _to_pix(x1), _to_pix(x2), (480, 640))
        assert cfg == CONFIG_CALIBRATED

    def test_planar_scene(self):
        rng = np.random.default_rng(4)
        R = _rot_y(0.12)
        t = np.array([0.4, 0.05, 0.0])
        n = np.array([0.0, 0.0, 1.0])
        X = _plane_points(rng, 80, n, 4.0)
        x1 = _project(X).astype(np.float32)
        x2 = _project(X, R, t).astype(np.float32)
        cfg, cls = _classify_scene(x1, x2, _to_pix(x1), _to_pix(x2), (480, 640))
        assert cfg == CONFIG_PLANAR
        # recovered H-pose must match GT rotation
        from particlesfm_tpu.geometry import rotations as rot
        R_est = np.asarray(rot.quat_to_rotmat(cls.q_h))[0]
        assert np.allclose(R_est, R, atol=5e-3)

    def test_pure_rotation_panoramic(self):
        rng = np.random.default_rng(5)
        R = _rot_y(0.08)
        X = rng.uniform(-2, 2, (80, 3)) + np.array([0, 0, 5.0])
        x1 = _project(X).astype(np.float32)
        x2 = _project(X, R, np.zeros(3)).astype(np.float32)
        cfg, cls = _classify_scene(x1, x2, _to_pix(x1), _to_pix(x2), (480, 640))
        assert cfg == CONFIG_PANORAMIC
        assert np.allclose(np.asarray(cls.t_h)[0], 0.0)

    def test_watermark(self):
        # border-region points moving by one pure image translation
        rng = np.random.default_rng(6)
        H, W = 480, 640
        f, c = 400.0, (320.0, 240.0)
        m = 40
        uv1 = np.concatenate([
            np.stack([rng.uniform(0, 30, m), rng.uniform(0, H, m)], 1),
            np.stack([rng.uniform(W - 30, W, m), rng.uniform(0, H, m)], 1),
        ]).astype(np.float32)
        uv2 = uv1 + np.array([1.5, 0.8], np.float32)
        x1 = ((uv1 - c) / f).astype(np.float32)
        x2 = ((uv2 - c) / f).astype(np.float32)
        cfg, _ = _classify_scene(x1, x2, uv1, uv2, (H, W), thres_sq=1e-4)
        assert cfg == CONFIG_WATERMARK
