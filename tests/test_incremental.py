"""PnP + incremental mapper tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from particlesfm_tpu.geometry import alignment, rotations as rot, se3
from particlesfm_tpu.globalsfm.pnp import estimate_pose_pnp
from particlesfm_tpu.sfm.incremental import run_incremental_mapper
from particlesfm_tpu.utils.config import SfmConfig

from synthetic import orbit_scene


class TestPnP:
    def test_recovers_pose_with_outliers(self):
        sc = orbit_scene(num_views=4, num_points=200, pixel_noise=0.0)
        rng = np.random.default_rng(0)
        v = 2
        vis = np.nonzero(sc["vis"][v])[0]
        X = sc["X"][vis]
        x = (sc["uv"][v, vis] - sc["params"][2:4]) / sc["focal"]
        out = rng.random(len(X)) < 0.2
        x = np.where(out[:, None], rng.uniform(-0.4, 0.4, x.shape), x).astype(np.float32)
        res = estimate_pose_pnp(
            jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(x),
            jnp.ones(len(X), bool), jnp.asarray((4.0 / sc["focal"]) ** 2),
        )
        ang = np.degrees(float(rot.quat_geodesic_angle(res.q, jnp.asarray(sc["q"][v]))))
        terr = np.linalg.norm(np.asarray(res.t) - sc["t"][v])
        assert ang < 0.5, f"rotation error {ang} deg"
        assert terr < 0.02, f"translation error {terr}"
        assert int(res.num_inliers) > 0.7 * (~out).sum()


class TestIncrementalMapper:
    def test_reconstructs_orbit(self):
        sc = orbit_scene(num_views=8, num_points=250, pixel_noise=0.3, seed=3)
        cfg = SfmConfig()
        rec = run_incremental_mapper(
            sc["tracks"], sc["height"], sc["width"], cfg, log=lambda *a: None
        )
        assert rec.num_registered == 8
        c_est = np.asarray(se3.camera_center(jnp.asarray(rec.qvec), jnp.asarray(rec.tvec)))
        ate = alignment.ate_rmse(c_est[rec.registered], sc["centers"][rec.registered])
        span = np.linalg.norm(sc["centers"][-1] - sc["centers"][0])
        assert ate < 0.02 * span, f"incremental ATE {ate} vs span {span}"
        assert rec.track_valid.sum() > 150

    def test_seg_geometry_gate(self):
        """Noisy seg labels (false dynamic flags) are advisory in the
        incremental mapper too: epipolar evidence rescues static tracks."""
        sc = orbit_scene(num_views=8, num_points=260, pixel_noise=0.3, seed=11)
        tracks = sc["tracks"]
        rng = np.random.default_rng(2)
        labels = np.zeros(tracks.mask.shape, np.int8)
        labels[rng.random(tracks.num_tracks) < 0.4] = 1
        from particlesfm_tpu.tracks.store import TrackArrays

        noisy = TrackArrays(xy=tracks.xy, mask=tracks.mask, labels=labels)
        logs = []
        rec = run_incremental_mapper(
            noisy, sc["height"], sc["width"], SfmConfig(),
            log=lambda *a: logs.append(" ".join(map(str, a))))
        assert rec.num_registered == 8
        assert any("seg-geometry gate" in l for l in logs)
        c_est = np.asarray(se3.camera_center(jnp.asarray(rec.qvec),
                                             jnp.asarray(rec.tvec)))
        ate = alignment.ate_rmse(c_est[rec.registered],
                                 sc["centers"][rec.registered])
        span = np.linalg.norm(sc["centers"][-1] - sc["centers"][0])
        assert ate < 0.02 * span, f"gated incremental ATE {ate} vs span {span}"
        assert rec.track_valid.sum() > 0.8 * tracks.num_tracks
