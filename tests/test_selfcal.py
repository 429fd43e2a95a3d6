"""Shared-focal self-calibration (globalsfm/selfcal.py).

Validates the Mendonca-Cipolla focal search on exact fundamental matrices and
the full F-RANSAC + grid-search path on noisy projected correspondences.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from particlesfm_tpu.globalsfm import selfcal
from particlesfm_tpu.geometry import rotations as rot

F_GT, CX, CY = 1310.0, 512.0, 218.0


def _k():
    return np.array([[F_GT, 0, CX], [0, F_GT, CY], [0, 0, 1.0]])


def _random_pose(rng, rot_scale=0.1):
    aa = rng.normal(size=3) * rot_scale
    R = np.asarray(rot.quat_to_rotmat(jnp.asarray(
        rot.angle_axis_to_quat(jnp.asarray(aa)))))
    t = rng.normal(size=3)
    return R, t / np.linalg.norm(t)


def test_focal_cost_dips_at_true_focal_on_exact_F():
    rng = np.random.default_rng(0)
    Kinv = np.linalg.inv(_k())
    Fs = []
    for _ in range(24):
        R, t = _random_pose(rng)
        E = np.cross(np.eye(3), t) @ R
        F = Kinv.T @ E @ Kinv
        Fs.append(F / np.linalg.norm(F))
    f_grid = jnp.exp(jnp.linspace(np.log(400.0), np.log(4000.0), 96)).astype(
        jnp.float32)
    curves = selfcal.focal_cost_curves(
        jnp.asarray(np.stack(Fs), jnp.float32),
        jnp.asarray([CX, CY], jnp.float32), f_grid)
    agg = np.asarray(curves.mean(0))
    f_min = float(f_grid[np.argmin(agg)])
    assert abs(f_min / F_GT - 1.0) < 0.03
    assert agg.min() < 0.01  # essentiality nearly exact at the true focal


def _project_pairs(rng, num_pairs, num_points, noise_px):
    uv1 = np.zeros((num_pairs, num_points, 2), np.float32)
    uv2 = np.zeros_like(uv1)
    for p in range(num_pairs):
        X = np.stack([rng.uniform(-2, 2, num_points),
                      rng.uniform(-1, 1, num_points),
                      rng.uniform(4, 10, num_points)], -1)
        R, t = _random_pose(rng, rot_scale=0.08)
        X2 = X @ R.T + t * 0.4
        uv1[p] = (X[:, :2] / X[:, 2:]) * F_GT + [CX, CY]
        uv2[p] = (X2[:, :2] / X2[:, 2:]) * F_GT + [CX, CY]
    uv1 += rng.normal(size=uv1.shape) * noise_px
    uv2 += rng.normal(size=uv2.shape) * noise_px
    return uv1, uv2


def test_estimate_shared_focal_from_noisy_correspondences():
    rng = np.random.default_rng(1)
    uv1, uv2 = _project_pairs(rng, 32, 120, noise_px=0.3)
    est = selfcal.estimate_shared_focal(
        jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(uv1.shape[:2], bool), jnp.asarray([CX, CY], jnp.float32),
        400.0, 4000.0)
    assert abs(float(est.focal) / F_GT - 1.0) < 0.05
    assert float(est.confidence) > 0.6
    assert int(est.num_pairs) > 16


def test_estimate_shared_focal_survives_outliers():
    rng = np.random.default_rng(2)
    uv1, uv2 = _project_pairs(rng, 32, 120, noise_px=0.3)
    # 30% gross outliers per pair
    n_out = 36
    uv2[:, :n_out] = rng.uniform(0, 1024, size=uv2[:, :n_out].shape)
    est = selfcal.estimate_shared_focal(
        jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(uv1.shape[:2], bool), jnp.asarray([CX, CY], jnp.float32),
        400.0, 4000.0)
    assert abs(float(est.focal) / F_GT - 1.0) < 0.08


def test_pure_rotation_never_confident_and_wrong():
    """Pure-rotation pairs: the fitted F is a degenerate [e]x.K.R.Kinv family,
    yet the rotation homography itself encodes K (rotation self-calibration),
    so the estimate may legitimately succeed. The contract under test is the
    one the mapper relies on: the estimator is never confident AND wrong."""
    rng = np.random.default_rng(3)
    num_pairs, num_points = 16, 100
    uv1 = np.zeros((num_pairs, num_points, 2), np.float32)
    uv2 = np.zeros_like(uv1)
    K = _k()
    Kinv = np.linalg.inv(K)
    for p in range(num_pairs):
        pts = np.stack([rng.uniform(100, 900, num_points),
                        rng.uniform(50, 380, num_points),
                        np.ones(num_points)], -1)
        R, _ = _random_pose(rng, rot_scale=0.05)
        H = K @ R @ Kinv  # pure rotation homography
        q = pts @ H.T
        uv1[p] = pts[:, :2]
        uv2[p] = q[:, :2] / q[:, 2:]
    uv1 += rng.normal(size=uv1.shape) * 0.3
    uv2 += rng.normal(size=uv2.shape) * 0.3
    est = selfcal.estimate_shared_focal(
        jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(uv1.shape[:2], bool), jnp.asarray([CX, CY], jnp.float32),
        400.0, 4000.0)
    assert (float(est.confidence) < 0.5
            or abs(float(est.focal) / F_GT - 1.0) < 0.1)


def _gate_accepts(info, min_pairs=16, min_conf=0.3, max_dip=0.5):
    """Mirror of stages.read_flow_selfcal's acceptance logic."""
    return (info["interior"] and info["num_pairs"] >= min_pairs
            and info["dip"] <= max_dip and info["confidence"] >= min_conf)


def test_flow_selfcal_rejects_degenerate_translation_scene():
    """make_flow_scene's geometry (downward-looking pure translation over a
    near-planar surface) barely observes focal; the contract is the gate one:
    never accepted AND wrong."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from flow_scenes import make_flow_scene

    from particlesfm_tpu.globalsfm.selfcal import estimate_focal_from_flows

    sc = make_flow_scene(num_views=10, height=192, width=256, focal=240.0)
    info = estimate_focal_from_flows(
        sc["flows"], sc["height"], sc["width"], seed=0)
    assert (not _gate_accepts(info)
            or abs(info["focal"] / sc["focal"] - 1.0) < 0.1), info


def test_flow_selfcal_recovers_focal_on_conditioned_scene():
    """With camera rotation + strong parallax the estimate is accurate AND
    passes the acceptance gate."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from flow_scenes import make_conditioned_flow_scene

    from particlesfm_tpu.globalsfm.selfcal import estimate_focal_from_flows

    sc = make_conditioned_flow_scene(num_views=16, height=192, width=256,
                                     focal=240.0)
    info = estimate_focal_from_flows(
        sc["flows"], sc["height"], sc["width"], seed=0)
    assert _gate_accepts(info), info
    assert abs(info["focal"] / sc["focal"] - 1.0) < 0.06, info


def test_read_flow_selfcal_tiers(tmp_path):
    """stages.read_flow_selfcal: strict tier -> +-15% BA trust region,
    marginal tier (shallow dip, decent agreement) -> +-30%, junk -> None."""
    import json

    from particlesfm_tpu.pipeline.stages import read_flow_selfcal
    from particlesfm_tpu.utils.config import Config

    cfg = Config()

    def write(info):
        (tmp_path / "selfcal.json").write_text(json.dumps(info))
        return read_flow_selfcal(tmp_path, cfg)

    base = {"focal": 1234.0, "num_pairs": 40, "interior": True}
    assert write({**base, "confidence": 0.9, "dip": 0.2}) == (1234.0, 0.15)
    # round-4 seq_05's exact profile: dip 0.57 rejected a -1.0%-of-GT estimate
    assert write({**base, "confidence": 0.56, "dip": 0.57}) == (1234.0, 0.30)
    # low agreement: rejected by both tiers (degenerate-scene profile)
    assert write({**base, "confidence": 0.21, "dip": 0.53}) is None
    # boundary minimum is not a calibration
    assert write({**base, "confidence": 0.9, "dip": 0.2,
                  "interior": False}) is None
