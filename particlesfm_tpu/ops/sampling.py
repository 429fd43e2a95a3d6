"""Differentiable bilinear sampling on TPU.

Semantics match torch.nn.functional.grid_sample(align_corners=True, zero padding)
at pixel-coordinate call sites, since the reference samples flow/occ maps that way
(/root/reference/point_trajectory/trajectory.py:25-37): coordinates are pixel units
(x in [0, W-1], y in [0, H-1]); out-of-range samples clamp-to-edge within one pixel
and fade to zero beyond (zero padding of the unit grid).

Implementation is gather-based; XLA lowers the dynamic gathers efficiently, and the
op fuses with surrounding elementwise work. Shapes are static; points are padded.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray, zero_pad: bool = True) -> jnp.ndarray:
    """Sample img [H, W, C] at pixel coords xy [..., 2] (x, y). Returns [..., C].

    With zero_pad=True, samples outside [0,W-1]x[0,H-1] blend to zero like
    grid_sample's default zero padding (bilinear weight of in-range corners only).
    """
    H, W, C = img.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        v = img[yi_c, xi_c]
        if zero_pad:
            v = v * valid[..., None].astype(img.dtype)
        return v

    w00 = ((1 - dx) * (1 - dy))[..., None]
    w01 = (dx * (1 - dy))[..., None]
    w10 = ((1 - dx) * dy)[..., None]
    w11 = (dx * dy)[..., None]
    out = (
        w00 * gather(y0i, x0i)
        + w01 * gather(y0i, x0i + 1)
        + w10 * gather(y0i + 1, x0i)
        + w11 * gather(y0i + 1, x0i + 1)
    )
    return out


def bilinear_sample_nchw(img: jnp.ndarray, xy: jnp.ndarray, zero_pad: bool = True) -> jnp.ndarray:
    """Sample img [C, H, W] at pixel coords xy [N, 2] -> [N, C]."""
    return bilinear_sample(jnp.moveaxis(img, 0, -1), xy, zero_pad=zero_pad)


def grid_coords(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel coordinate grid [H, W, 2] with (x, y) channels."""
    ys = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    xs = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    return jnp.stack([xs, ys], axis=-1)
