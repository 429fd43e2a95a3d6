"""Pallas kernel tests (TPU interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from particlesfm_tpu.models.raft import build_corr_pyramid, lookup_corr
from particlesfm_tpu.ops.corr_lookup import lookup_corr_pyramid_pallas


def test_corr_lookup_matches_xla_reference():
    rng = np.random.default_rng(0)
    H, W, D = 8, 12, 16
    f1 = jnp.asarray(rng.normal(size=(H, W, D)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(H, W, D)), jnp.float32)
    pyr = build_corr_pyramid(f1, f2, 2)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys], -1) + jnp.asarray(
        rng.uniform(-2, 2, (H, W, 2)), jnp.float32
    )
    ref = lookup_corr(pyr, coords, radius=3)
    out = lookup_corr_pyramid_pallas(pyr, coords, radius=3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_corr_lookup_out_of_bounds_zero():
    rng = np.random.default_rng(1)
    H, W, D = 6, 8, 8
    f = jnp.asarray(rng.normal(size=(H, W, D)), jnp.float32)
    pyr = build_corr_pyramid(f, f, 1)
    # coords far outside: all samples must be zero (zero-padding semantics)
    coords = jnp.full((H, W, 2), 1000.0, jnp.float32)
    out = lookup_corr_pyramid_pallas(pyr, coords, radius=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
