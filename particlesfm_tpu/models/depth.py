"""Monocular relative-depth network (MiDaS-class contract) in Flax.

The reference runs its MiDaS fork for per-frame relative depth, consumed only by
the motion-seg featurization as 16-bit PNGs normalized to [0, 1]
(/root/reference/run_particlesfm.py:55-57, motion_seg/load_cut_seq.py:41). The
contract is therefore: image -> relative inverse depth, normalized to [0, 1]
per frame. This module provides a TPU-native encoder-decoder with that contract
(residual encoder + refinement decoder in the spirit of MiDaS's monodepth
architecture), trainable from scratch; `normalize_depth` reproduces the
reference's per-frame [0, 65535]/65535 normalization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=self.stride, name="skip")(x)
        return nn.relu(x + y)


class FusionBlock(nn.Module):
    """MiDaS-style refinement: upsample deep features, fuse with the skip."""
    features: int

    @nn.compact
    def __call__(self, deep, skip, train: bool = False):
        up = jax.image.resize(
            deep, (skip.shape[0], skip.shape[1], deep.shape[-1]), method="bilinear"
        )
        x = jnp.concatenate([up, skip], axis=-1)
        x = ConvBlock(self.features, name="fuse")(x, train)
        return x


class DepthNet(nn.Module):
    """Relative inverse-depth estimator. Input [H, W, 3] in [0,255] -> [H, W]."""
    base: int = 32

    @nn.compact
    def __call__(self, image, train: bool = False):
        x = (image / 255.0 - 0.5) * 2.0
        b = self.base
        e1 = ConvBlock(b, 2, name="enc1")(x, train)          # /2
        e2 = ConvBlock(b * 2, 2, name="enc2")(e1, train)     # /4
        e3 = ConvBlock(b * 4, 2, name="enc3")(e2, train)     # /8
        e4 = ConvBlock(b * 8, 2, name="enc4")(e3, train)     # /16
        e5 = ConvBlock(b * 8, 2, name="enc5")(e4, train)     # /32
        d4 = FusionBlock(b * 8, name="dec4")(e5, e4, train)
        d3 = FusionBlock(b * 4, name="dec3")(d4, e3, train)
        d2 = FusionBlock(b * 2, name="dec2")(d3, e2, train)
        d1 = FusionBlock(b, name="dec1")(d2, e1, train)
        out = nn.Conv(1, (3, 3), padding=1, name="head")(d1)
        out = jax.image.resize(out, (image.shape[0], image.shape[1], 1), method="bilinear")
        return nn.relu(out[..., 0])   # nonnegative relative inverse depth


def normalize_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Per-frame min-max normalization to [0, 1] — the on-disk contract of the
    reference's 16-bit depth PNGs (write side of run_midas; read side divides by
    65535 at load_cut_seq.py:41)."""
    lo = jnp.min(depth)
    hi = jnp.max(depth)
    return (depth - lo) / jnp.maximum(hi - lo, 1e-12)


def scale_shift_invariant_loss(pred, target, mask):
    """SSI MSE loss (MiDaS's trimmed ls analog, simplified): align pred to target
    with per-image least-squares scale/shift, then masked MSE."""
    m = mask.astype(pred.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    px = jnp.sum(pred * m) / n
    tx = jnp.sum(target * m) / n
    cov = jnp.sum((pred - px) * (target - tx) * m) / n
    var = jnp.sum((pred - px) ** 2 * m) / n
    s = cov / jnp.maximum(var, 1e-12)
    b = tx - s * px
    return jnp.sum(((s * pred + b) - target) ** 2 * m) / n
