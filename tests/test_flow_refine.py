"""Photometric flow refinement (flow/refine.py).

The contract under test: given a textured image pair related by a known warp
and a flow initialization carrying a structured bias, refinement removes most
of the bias where texture supports it and never leaves the trust region.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from particlesfm_tpu.flow.refine import photometric_refine, photometric_refine_pair
from particlesfm_tpu.ops.sampling import bilinear_sample

H, W = 64, 96


def _textured(rng):
    """Smooth random texture with rich gradients everywhere."""
    base = rng.uniform(0, 1, (H + 32, W + 32)).astype(np.float32)
    # blur until the texture wavelength is several pixels: gradient-based
    # refinement assumes local linearity of the intensity surface (pixel-scale
    # noise is outside LK's regime; the net's flow on real images is too)
    k = np.array([0.25, 0.5, 0.25], np.float32)
    for _ in range(8):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, base)
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    return base


def _pair_with_gt_flow(rng, shift=(1.3, -0.7)):
    """I2 is I1 translated by `shift` (constant GT flow), sampled from one
    larger texture so both crops are exact."""
    big = _textured(rng)
    ox, oy = 16, 16
    I1 = big[oy:oy + H, ox:ox + W]
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    pos = np.stack([xs + ox + shift[0], ys + oy + shift[1]], -1)
    I2 = np.asarray(
        bilinear_sample(jnp.asarray(big[..., None]),
                        jnp.asarray(pos.reshape(-1, 2)))
    ).reshape(H, W)
    # I2(y) = big(y + o + shift): content moves by -shift, so the flow field
    # satisfying I2(x + flow) = I1(x) is -shift
    gt = np.broadcast_to(-np.asarray(shift, np.float32), (H, W, 2)).copy()
    return I1, I2, gt


def test_refinement_removes_structured_bias():
    rng = np.random.default_rng(0)
    I1, I2, gt = _pair_with_gt_flow(rng)
    # structured (spatially smooth, non-zero-mean) initialization error
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    bias = np.stack([0.4 + 0.3 * np.sin(xs / 17.0),
                     -0.3 + 0.2 * np.cos(ys / 11.0)], -1).astype(np.float32)
    flow0 = gt + bias
    out = np.asarray(photometric_refine_pair(
        jnp.asarray(I1), jnp.asarray(I2), jnp.asarray(flow0)))
    inner = (slice(8, -8), slice(8, -8))
    err0 = np.linalg.norm((flow0 - gt)[inner], axis=-1).mean()
    err1 = np.linalg.norm((out - gt)[inner], axis=-1).mean()
    assert err1 < 0.35 * err0, (err0, err1)


def test_trust_region_bounds_correction():
    rng = np.random.default_rng(1)
    I1, I2, gt = _pair_with_gt_flow(rng)
    flow0 = gt + 0.5
    out = np.asarray(photometric_refine_pair(
        jnp.asarray(I1), jnp.asarray(I2), jnp.asarray(flow0), max_total=1.5))
    d = np.linalg.norm(out - flow0, axis=-1)
    assert d.max() <= 1.5 + 1e-4


def test_textureless_regions_keep_initialization():
    rng = np.random.default_rng(2)
    I1, I2, gt = _pair_with_gt_flow(rng)
    # flatten a block of both images: no signal there
    I1 = I1.copy(); I2 = I2.copy()
    I1[20:40, 30:60] = 0.5
    I2[20:40, 30:60] = 0.5
    flow0 = gt + np.asarray([0.6, 0.6], np.float32)
    out = np.asarray(photometric_refine_pair(
        jnp.asarray(I1), jnp.asarray(I2), jnp.asarray(flow0)))
    # deep inside the flat block (beyond the window radius) nothing moves
    core = (slice(27, 33), slice(40, 50))
    assert np.abs(out[core] - flow0[core]).max() < 0.15


def test_batched_matches_single():
    rng = np.random.default_rng(3)
    I1, I2, gt = _pair_with_gt_flow(rng)
    flow0 = gt + 0.3
    single = np.asarray(photometric_refine_pair(
        jnp.asarray(I1), jnp.asarray(I2), jnp.asarray(flow0)))
    batched = np.asarray(photometric_refine(
        jnp.asarray(np.stack([np.repeat(I1[..., None], 3, -1)] * 2)),
        jnp.asarray(np.stack([np.repeat(I2[..., None], 3, -1)] * 2)),
        jnp.asarray(np.stack([flow0] * 2))))
    assert batched.shape == (2, H, W, 2)
    np.testing.assert_allclose(batched[0], batched[1], atol=1e-6)
    # RGB with equal channels == grayscale path
    np.testing.assert_allclose(batched[0], single, atol=1e-4)


def test_scheduled_refinement_and_anchored_trust_region():
    rng = np.random.default_rng(4)
    I1, I2, gt = _pair_with_gt_flow(rng)
    flow0 = gt + 0.8
    from particlesfm_tpu.flow.refine import photometric_refine_scheduled
    out = np.asarray(photometric_refine_scheduled(
        jnp.asarray(np.stack([I1])[..., None].repeat(3, -1)),
        jnp.asarray(np.stack([I2])[..., None].repeat(3, -1)),
        jnp.asarray(np.stack([flow0])), max_total=1.5))[0]
    inner = (slice(8, -8), slice(8, -8))
    err0 = np.linalg.norm((flow0 - gt)[inner], axis=-1).mean()
    err1 = np.linalg.norm((out - gt)[inner], axis=-1).mean()
    assert err1 < 0.35 * err0
    # trust region is anchored at the ORIGINAL flow across phases: total
    # correction never exceeds max_total even though two phases ran
    d = np.linalg.norm(out - flow0, axis=-1)
    assert d.max() <= 1.5 + 1e-4


def test_fused_refine_matches_standalone_pass():
    """load_flow_apply_pairs(refine_schedule=...) == net forward followed by
    the standalone scheduled refinement (the round-4 flow stage runs the fused
    path; pipeline/stages.py relies on this equivalence to skip its loop)."""
    from particlesfm_tpu.flow.infer import load_flow_apply_pairs
    from particlesfm_tpu.flow.refine import photometric_refine_scheduled
    from particlesfm_tpu.pipeline.run import DEFAULT_RAFT_CKPT

    if not DEFAULT_RAFT_CKPT.exists():
        import pytest

        pytest.skip("no shipped flow checkpoint")
    rng = np.random.default_rng(0)
    T, H, W = 3, 64, 96
    stack = rng.integers(0, 256, (T, H, W, 3)).astype(np.uint8)
    ia = np.array([0, 1], np.int32)
    ib = np.array([1, 2], np.int32)
    sched = ((1, 2.0, 3),)
    plain = load_flow_apply_pairs(str(DEFAULT_RAFT_CKPT), iters=2)
    fused = load_flow_apply_pairs(str(DEFAULT_RAFT_CKPT), iters=2,
                                  refine_schedule=sched, refine_max_total=2.0)
    assert not plain.refines and fused.refines
    base = plain(stack, ia, ib)
    want = photometric_refine_scheduled(
        jnp.asarray(stack[ia], jnp.float32) / 255.0,
        jnp.asarray(stack[ib], jnp.float32) / 255.0,
        base, schedule=sched, max_total=2.0)
    got = fused(stack, ia, ib)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
