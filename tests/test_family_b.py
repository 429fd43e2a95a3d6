"""Held-out family B (synth/family_b.py): ground-truth self-consistency.

The cross-domain eval (VERDICT round-3 task 3) is only meaningful if family B's
ground truth is exact; these tests pin the same invariants the family-A
renderer is tested for (test_synth.py)."""
import numpy as np

from particlesfm_tpu.synth.family_b import random_box_scene


def _scene(seed=0, **kw):
    rng = np.random.default_rng(seed)
    args = dict(num_views=6, height=72, width=112, num_dynamic=1,
                motion_scale=0.6, num_boxes=6)
    args.update(kw)
    return random_box_scene(rng, **args)


def test_depth_positive_and_finite():
    sc = _scene()
    for v in (0, 3):
        z = sc.gt_depth(v)
        assert np.isfinite(z).all()
        assert (z > 0).all()
        # piecewise-planar world must span real depth contrast
        assert z.max() / z.min() > 3.0


def test_flow_matches_reprojection_of_material_points():
    """gt_flow must equal project(b, material points of a) - grid exactly."""
    sc = _scene(1)
    a, b = 1, 2
    pts, idx, _, _ = sc.hit_points(a)
    pts_b = pts.copy()
    for i, bx in enumerate(sc.boxes):
        m = idx == i
        if m.any():
            pts_b[m] += (b - a) * bx.vel
    uv_b = sc.project(b, pts_b)
    us, vs = np.meshgrid(np.arange(sc.width, dtype=np.float64),
                         np.arange(sc.height, dtype=np.float64))
    want = (uv_b - np.stack([us, vs], -1)).astype(np.float32)
    np.testing.assert_allclose(sc.gt_flow(a, b), want, atol=1e-5)


def test_flow_photometric_consistency_static():
    """Warping frame b's albedo to frame a via gt_flow should match frame a
    on static in-bounds pixels, up to shading/noise/exposure (bounded)."""
    sc = _scene(2, num_dynamic=0)
    a, b = 0, 1
    Ia = sc.render(a).astype(np.float32) / 255.0
    Ib = sc.render(b).astype(np.float32) / 255.0
    fl = sc.gt_flow(a, b)
    H, W = Ia.shape[:2]
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    ub = np.clip(np.round(us + fl[..., 0]).astype(int), 0, W - 1)
    vb = np.clip(np.round(vs + fl[..., 1]).astype(int), 0, H - 1)
    inb = ((us + fl[..., 0] >= 1) & (us + fl[..., 0] <= W - 2)
           & (vs + fl[..., 1] >= 1) & (vs + fl[..., 1] <= H - 2))
    err = np.abs(Ib[vb, ub] - Ia).mean(axis=-1)
    # median error small (occlusion boundaries and rounding produce a tail)
    assert np.median(err[inb]) < 0.1


def test_dynamic_mask_only_on_movers():
    sc = _scene(3, num_dynamic=2)
    dyn = sc.gt_dynamic(2)
    assert dyn.dtype == bool
    # movers exist and cover a nonzero but minority region
    frac = dyn.mean()
    assert 0.0 <= frac < 0.5
    sc0 = _scene(4, num_dynamic=0)
    assert not sc0.gt_dynamic(1).any()


def test_pose_project_roundtrip():
    """world_to_cam + intrinsics reproject hit points onto their own pixels."""
    sc = _scene(5)
    v = 2
    pts, _, _, _ = sc.hit_points(v)
    uv = sc.project(v, pts)
    us, vs = np.meshgrid(np.arange(sc.width, dtype=np.float64),
                         np.arange(sc.height, dtype=np.float64))
    np.testing.assert_allclose(uv[..., 0], us, atol=1e-6)
    np.testing.assert_allclose(uv[..., 1], vs, atol=1e-6)


def test_images_have_texture_and_nuisances_bounded():
    sc = _scene(6)
    imgs = np.stack([sc.render(v) for v in range(3)])
    # per-frame contrast: quantized textures + shading give real structure
    assert imgs.std(axis=(1, 2, 3)).min() > 10.0
    # frames differ (camera moves + exposure drifts) but not wildly
    d01 = np.abs(imgs[0].astype(int) - imgs[1].astype(int)).mean()
    assert 1.0 < d01 < 80.0
