"""Shape/behavior sanity tests for the neural models (tiny sizes, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from particlesfm_tpu.models.raft import (RAFT, build_corr_pyramid, lookup_corr,
                                         lookup_corr_gather,
                                         upsample_flow_convex)
from particlesfm_tpu.models.motionseg import TrajOADepth, augment_traj
from particlesfm_tpu.models.depth import DepthNet, normalize_depth, scale_shift_invariant_loss


class TestRAFT:
    def test_corr_pyramid_and_lookup_shapes(self):
        H, W, D = 8, 16, 32
        rng = np.random.default_rng(0)
        f1 = jnp.asarray(rng.normal(size=(H, W, D)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(H, W, D)), jnp.float32)
        pyr = build_corr_pyramid(f1, f2, num_levels=3)
        assert pyr[0].shape == (H * W, H, W, 1)
        assert pyr[1].shape == (H * W, H // 2, W // 2, 1)
        ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        coords = jnp.stack([xs, ys], -1)
        corr = lookup_corr(pyr, coords, radius=2)
        assert corr.shape == (H, W, 3 * 25)

    def test_lookup_matmul_matches_gather(self):
        # the production row-gather + hat-matmul lookup must equal the
        # per-corner scalar-gather reference, including out-of-bounds clamping
        H, W, D = 8, 16, 32
        rng = np.random.default_rng(3)
        f1 = jnp.asarray(rng.normal(size=(H, W, D)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(H, W, D)), jnp.float32)
        pyr = build_corr_pyramid(f1, f2, num_levels=3)
        # fractional coords, some far outside the map
        coords = jnp.asarray(
            rng.uniform(-4, 20, size=(H, W, 2)), jnp.float32)
        for radius in (1, 3, 4):
            a = lookup_corr(pyr, coords, radius=radius)
            b = lookup_corr_gather(pyr, coords, radius=radius)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_corr_identity_peak(self):
        # identical feature maps: the zero-offset correlation should be maximal
        H, W, D = 6, 6, 16
        rng = np.random.default_rng(1)
        f = jnp.asarray(rng.normal(size=(H, W, D)), jnp.float32)
        pyr = build_corr_pyramid(f, f, num_levels=1)
        ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        corr = lookup_corr(pyr, jnp.stack([xs, ys], -1), radius=1)
        center = corr.reshape(H, W, 3, 3)[:, :, 1, 1]
        assert bool(jnp.all(center >= corr.reshape(H, W, 9).max(-1) - 1e-4))

    def test_forward_shapes(self):
        # pyramid needs H/8, W/8 >= 2^(num_levels-1): use >= 64 px sides
        model = RAFT()
        key = jax.random.PRNGKey(0)
        img = jnp.zeros((64, 96, 3), jnp.float32)
        params = model.init(key, img, img, iters=2)
        flow = model.apply(params, img, img, iters=2)
        assert flow.shape == (64, 96, 2)
        # identical images -> near-zero flow is NOT guaranteed untrained;
        # just require finiteness
        assert bool(jnp.all(jnp.isfinite(flow)))

    def test_upsample_convex_constant(self):
        # uniform mask weights must reproduce 8x nearest-ish upsampling of 8*flow
        H, W = 4, 4
        flow = jnp.ones((H, W, 2), jnp.float32)
        mask = jnp.zeros((H, W, 576), jnp.float32)  # softmax -> uniform over 9
        up = upsample_flow_convex(flow, mask)
        assert up.shape == (32, 32, 2)
        np.testing.assert_allclose(np.asarray(up[8:-8, 8:-8]), 8.0, atol=1e-5)


class TestMotionSeg:
    def test_augment_features(self):
        B, N, L, H, W = 1, 5, 4, 16, 24
        rng = np.random.default_rng(0)
        traj = jnp.asarray(rng.uniform(0, 1, (B, N, L, 2)), jnp.float32)
        depth = jnp.asarray(rng.uniform(0, 1, (B, L, H, W)), jnp.float32)
        valid = jnp.ones((B, N, L), bool)
        feats = augment_traj(traj, depth, valid, (H, W))
        assert feats.shape == (B, N, L, 10)

    def test_forward_logits(self):
        B, N, L, H, W = 2, 16, 5, 16, 24
        rng = np.random.default_rng(0)
        model = TrajOADepth(input_hw=(H, W))
        traj = jnp.asarray(rng.uniform(0, 1, (B, N, L, 2)), jnp.float32)
        depth = jnp.asarray(rng.uniform(0, 1, (B, L, H, W)), jnp.float32)
        valid = jnp.asarray(rng.random((B, N, L)) < 0.8)
        variables = model.init(jax.random.PRNGKey(0), traj, depth, valid)
        logits = model.apply(variables, traj, depth, valid)
        assert logits.shape == (B, N)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_train_mode_updates_batch_stats(self):
        B, N, L, H, W = 1, 8, 4, 8, 12
        rng = np.random.default_rng(0)
        model = TrajOADepth(input_hw=(H, W))
        traj = jnp.asarray(rng.uniform(0, 1, (B, N, L, 2)), jnp.float32)
        depth = jnp.asarray(rng.uniform(0, 1, (B, L, H, W)), jnp.float32)
        valid = jnp.ones((B, N, L), bool)
        variables = model.init(jax.random.PRNGKey(0), traj, depth, valid, train=True)
        assert "batch_stats" in variables
        _, updates = model.apply(
            variables, traj, depth, valid, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in updates


class TestDepth:
    def test_forward_and_normalize(self):
        model = DepthNet(base=8)
        img = jnp.zeros((32, 48, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img)
        d = model.apply(variables, img)
        assert d.shape == (32, 48)
        assert bool(jnp.all(d >= 0))
        n = normalize_depth(d + 1.0)
        assert float(n.min()) >= 0.0 and float(n.max()) <= 1.0

    def test_ssi_loss_zero_for_affine_match(self):
        rng = np.random.default_rng(0)
        t = jnp.asarray(rng.uniform(0, 1, (16, 16)), jnp.float32)
        pred = 3.0 * t + 0.5
        mask = jnp.ones_like(t, bool)
        loss = scale_shift_invariant_loss(pred, t, mask)
        assert float(loss) < 1e-8
