"""ops/ kernels vs torch/scipy references (the semantics the reference relies on)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from scipy import ndimage

from particlesfm_tpu.ops import sampling, flow_ops, density


def torch_grid_sample(data_hwc, xy):
    """torch grid_sample with align_corners=True at pixel coords, like
    the reference's grid_sample wrapper (point_trajectory/trajectory.py:25-37)."""
    data = torch.from_numpy(np.moveaxis(data_hwc, -1, 0)).unsqueeze(0).float()
    g = torch.from_numpy(xy).float()[None, None]
    H, W = data.shape[2], data.shape[3]
    g = g.clone()
    g[..., 0] /= (W - 1) / 2
    g[..., 1] /= (H - 1) / 2
    g -= 1
    out = F.grid_sample(data, g, align_corners=True)
    return out.squeeze(0).squeeze(1).permute(1, 0).numpy()


def test_bilinear_sample_matches_torch(rng):
    img = rng.normal(size=(17, 23, 3)).astype(np.float32)
    xy = np.stack(
        [rng.uniform(-2, 25, size=200), rng.uniform(-2, 19, size=200)], axis=-1
    ).astype(np.float32)
    ours = np.asarray(sampling.bilinear_sample(jnp.asarray(img), jnp.asarray(xy)))
    ref = torch_grid_sample(img, xy)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_backward_warp_matches_torch(rng):
    img = rng.normal(size=(12, 16, 2)).astype(np.float32)
    flow = rng.normal(scale=2.0, size=(12, 16, 2)).astype(np.float32)
    ours = np.asarray(flow_ops.backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    # torch reference (utils.py:71-86)
    im = torch.from_numpy(np.moveaxis(img, -1, 0)).unsqueeze(0).float()
    fl = torch.from_numpy(np.moveaxis(flow, -1, 0)).unsqueeze(0).float()
    hh, ww = torch.meshgrid(torch.arange(12).float(), torch.arange(16).float(), indexing="ij")
    coord = torch.stack([ww, hh])[None]
    grids = coord + fl
    grids[:, 0] /= (16 - 1) / 2
    grids[:, 1] /= (12 - 1) / 2
    grids -= 1
    ref = F.grid_sample(im, grids.permute(0, 2, 3, 1), align_corners=True)
    ref = np.moveaxis(ref.squeeze(0).numpy(), 0, -1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_occlusion_mask_consistency(rng):
    # consistent flows: forward +v, backward -v (sampled at the right target)
    H, W = 20, 30
    flow_f = np.tile(np.array([3.0, 0.0], np.float32), (H, W, 1))
    flow_b = -flow_f
    occ, err = flow_ops.occlusion_mask(jnp.asarray(flow_f), jnp.asarray(flow_b), thres=1.0)
    occ = np.asarray(occ)
    # interior: not occluded; last 3 columns go out of bounds
    assert occ[:, : W - 3].max() == 0.0
    assert occ[:, W - 3 :].min() == 1.0
    # inconsistent backward flow -> occluded everywhere
    occ2, _ = flow_ops.occlusion_mask(
        jnp.asarray(flow_f), jnp.asarray(flow_b * 0.0), thres=1.0
    )
    assert np.asarray(occ2).min() == 1.0


def test_free_cell_mask_matches_edt(rng):
    for ratio in (2, 4):
        occ = (rng.uniform(size=(40, 56)) < 0.02).astype(np.float32)
        edt = ndimage.distance_transform_edt(1.0 - occ)
        ref = (edt > ratio).astype(np.float32)
        ours = np.asarray(density.free_cell_mask(jnp.asarray(occ), float(ratio)))
        np.testing.assert_array_equal(ours, ref)


def test_motion_boundary_matches_reference(rng):
    flow = rng.normal(size=(15, 19, 2)).astype(np.float32)
    ours = np.asarray(flow_ops.motion_boundary(jnp.asarray(flow), 0.02))
    # reference numpy semantics (trajectory.py:39-43 + utils.py gradient)
    dx = np.zeros_like(flow)
    dy = np.zeros_like(flow)
    dx[:, :-1] = np.abs(flow[:, :-1] - flow[:, 1:])
    dy[:-1] = np.abs(flow[:-1] - flow[1:])
    gx, gy = dx.mean(-1), dy.mean(-1)
    ref = (np.sqrt(gx**2 + gy**2) > 0.02 * np.linalg.norm(flow, ord=2, axis=-1)).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)


def test_compose_flow_constant_translation():
    H, W = 20, 30
    f_ab = np.full((H, W, 2), (3.0, 1.0), np.float32)
    f_bc = np.full((H, W, 2), (2.0, -1.0), np.float32)
    comp, valid = flow_ops.compose_flow(jnp.asarray(f_ab), jnp.asarray(f_bc))
    comp, valid = np.asarray(comp), np.asarray(valid)
    # interior: exact chain; validity marks where p + f_ab left the image
    np.testing.assert_allclose(
        comp[valid], np.broadcast_to((5.0, 0.0), comp[valid].shape), atol=1e-5
    )
    assert valid[:-1, : W - 3].all()
    assert not valid[:, W - 3 :].any()   # x + 3 > W-1 there


def test_stride2_compose_fallback_replaces_only_disagreement():
    rng = np.random.default_rng(0)
    H, W = 24, 32
    f1a = rng.normal(0, 0.5, (3, H, W, 2)).astype(np.float32)
    f1b = rng.normal(0, 0.5, (3, H, W, 2)).astype(np.float32)
    comps, valids = [], []
    for k in range(3):
        c, v = flow_ops.compose_flow(jnp.asarray(f1a[k]), jnp.asarray(f1b[k]))
        comps.append(np.asarray(c)); valids.append(np.asarray(v))
    comps, valids = np.stack(comps), np.stack(valids)
    # net stride-2 = per-pair composition + tiny noise, except a corrupted block
    net = comps + rng.normal(0, 0.1, (3, H, W, 2)).astype(np.float32)
    net[1, 5:12, 6:14] += 25.0
    out, used = flow_ops.stride2_compose_fallback(
        jnp.asarray(net), jnp.asarray(f1a), jnp.asarray(f1b), disagree_px=4.0
    )
    out, used = np.asarray(out), np.asarray(used)
    # agreeing pixels keep the net values
    np.testing.assert_array_equal(out[0], net[0])
    assert not used[0].any() and not used[2].any()
    # the corrupted block is replaced where the composition is valid
    v1 = valids[1, 5:12, 6:14]
    assert (used[1, 5:12, 6:14] | ~v1).all()
    assert np.abs(out[1, 5:12, 6:14][v1] - comps[1, 5:12, 6:14][v1]).max() < 1e-5
