"""Tests for the textured synth world renderer (particlesfm_tpu.synth).

The renderer is the in-environment training/eval data source for the flow and
depth nets (the reference trains on FlyingThings3D and benchmarks on Sintel —
zero egress here), so its ground truth must be exact: these tests check
photometric consistency of renders against GT flow, depth/mask consistency,
and camera-path sanity.
"""
import numpy as np
import pytest

from particlesfm_tpu.synth import random_scene


def _warp(img_b, flow):
    H, W = img_b.shape[:2]
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    ub, vb = us + flow[..., 0], vs + flow[..., 1]
    x0 = np.clip(np.floor(ub).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(vb).astype(int), 0, H - 2)
    wx, wy = ub - x0, vb - y0
    out = (
        (1 - wx)[..., None] * (1 - wy)[..., None] * img_b[y0, x0]
        + wx[..., None] * (1 - wy)[..., None] * img_b[y0, x0 + 1]
        + (1 - wx)[..., None] * wy[..., None] * img_b[y0 + 1, x0]
        + wx[..., None] * wy[..., None] * img_b[y0 + 1, x0 + 1]
    )
    inb = (ub >= 1) & (ub < W - 2) & (vb >= 1) & (vb < H - 2)
    return out, inb


class TestRenderConsistency:
    def test_photometric_consistency_static(self):
        sc = random_scene(np.random.default_rng(0), num_views=4, height=96,
                          width=128, motion_scale=0.4)
        i0 = sc.render(0).astype(np.float32)
        i1 = sc.render(1).astype(np.float32)
        fl = sc.gt_flow(0, 1)
        warp, inb = _warp(i1, fl)
        err = np.abs(warp - i0).mean(-1)[inb]
        # GT flow must explain the photometry to interpolation error
        assert np.median(err) < 4.0
        assert (err > 25).mean() < 0.01

    def test_photometric_consistency_dynamic(self):
        sc = random_scene(np.random.default_rng(3), num_views=4, height=96,
                          width=128, motion_scale=0.4, num_dynamic=2)
        dyn = sc.gt_dynamic(0)
        if dyn.mean() < 0.005:
            pytest.skip("sphere not visible for this seed")
        i0 = sc.render(0).astype(np.float32)
        i1 = sc.render(1).astype(np.float32)
        fl = sc.gt_flow(0, 1)
        warp, inb = _warp(i1, fl)
        err = np.abs(warp - i0).mean(-1)
        # dynamic-region flow must track the moving sphere's texture too
        # (exclude the rim where sphere/background interpolation mixes)
        from scipy.ndimage import binary_erosion
        core = binary_erosion(dyn, iterations=2) & inb
        if core.sum() > 50:
            assert np.median(err[core]) < 6.0

    def test_depth_and_mask(self):
        sc = random_scene(np.random.default_rng(1), num_views=3, height=64,
                          width=96, num_dynamic=1)
        z = sc.gt_depth(0)
        assert z.shape == (64, 96) and (z > 0).all() and np.isfinite(z).all()
        inv = sc.gt_inverse_depth_norm(0)
        assert inv.min() >= 0 and inv.max() <= 1
        dyn = sc.gt_dynamic(0)
        if dyn.any():
            # spheres float above the surface: dynamic pixels are closer
            assert z[dyn].mean() < z[~dyn].mean()

    def test_rotating_cameras(self):
        sc = random_scene(np.random.default_rng(2), num_views=10, height=32, width=32)
        # rotations must actually vary (round-1 scenes were translation-only)
        dR = sc.R[0] @ sc.R[5].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang > 0.5
        for i in range(10):
            assert np.allclose(sc.R[i] @ sc.R[i].T, np.eye(3), atol=1e-8)
            assert np.linalg.det(sc.R[i]) > 0.99

    def test_principal_point_window_equivalence(self):
        """A crop window rendered with offset principal point equals the same
        region of a larger sensor render (the training-crop trick)."""
        rng_args = dict(num_views=2, motion_scale=0.3)
        rng = np.random.default_rng(7)
        big = random_scene(rng, height=96, width=128, focal=150.0, **rng_args)
        # re-create the same world for a 48x64 window at offset (20, 30)
        small = random_scene(np.random.default_rng(7), height=48, width=64,
                             focal=150.0,
                             principal=(128 / 2.0 - 30, 96 / 2.0 - 20), **rng_args)
        ib = big.render(0)[20:20 + 48, 30:30 + 64]
        is_ = small.render(0)
        assert np.array_equal(ib, is_)
        fb = big.gt_flow(0, 1)[20:20 + 48, 30:30 + 64]
        fs = small.gt_flow(0, 1)
        assert np.allclose(fb, fs, atol=1e-4)


class TestFlowDepthData:
    def test_flow_pair_generation(self):
        from particlesfm_tpu.flow.data import FlowPairSpec, generate_dataset

        spec = FlowPairSpec(crop_hw=(48, 64), sensor_hw=(96, 192), frames=3)
        i1, i2, fl = generate_dataset(2, spec, workers=1, log=lambda *a: None)
        assert i1.shape == i2.shape == (12, 48, 64, 3)
        assert fl.shape == (12, 48, 64, 2) and fl.dtype == np.float16
        # forward and backward pairs present: flows roughly negate
        assert np.isfinite(fl.astype(np.float32)).all()

    def test_depth_frame_generation(self):
        from particlesfm_tpu.depth.train import generate_depth_dataset

        imgs, deps = generate_depth_dataset(2, hw=(48, 64), frames=2, workers=1,
                                            log=lambda *a: None)
        assert imgs.shape == (4, 48, 64, 3) and deps.shape == (4, 48, 64)
        assert deps.max() <= 1.0 and deps.min() >= 0.0


class TestFlowInferPlumbing:
    def test_checkpoint_roundtrip_and_padding(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from particlesfm_tpu.flow.infer import (
            load_flow_apply, save_flow_checkpoint)
        from particlesfm_tpu.models.raft import compact_raft

        model = compact_raft()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)),
                            jnp.zeros((64, 64, 3)), iters=1)["params"]
        ck = tmp_path / "ck.msgpack"
        save_flow_checkpoint(ck, params, "compact", {"iters": 2})
        apply = load_flow_apply(ck)
        # non-multiple-of-8 image sizes must work (InputPadder contract);
        # dims >= 64 so the 4-level correlation pyramid stays non-degenerate
        img = np.random.default_rng(0).uniform(0, 255, (93, 101, 3)).astype(np.float32)
        flow = np.asarray(apply(img, img))
        assert flow.shape == (93, 101, 2)
        assert np.isfinite(flow).all()
