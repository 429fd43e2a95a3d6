"""Trajectory density control as a disc convolution.

The reference keeps head density uniform by computing a Euclidean distance
transform of the occupied map and spawning only on grid cells with
EDT > sample_ratio (/root/reference/point_trajectory/trajectory.py:148-152).
The predicate "nearest occupied pixel is farther than r" is exactly
"no occupied pixel within Euclidean distance <= r", which is one binary
convolution with a disc kernel — a TPU-friendly stencil instead of a host EDT.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def disc_kernel(radius: float) -> np.ndarray:
    """Binary disc: offsets with euclidean norm <= radius. Shape (2k+1, 2k+1)."""
    k = int(np.floor(radius))
    ys, xs = np.mgrid[-k : k + 1, -k : k + 1]
    return ((xs * xs + ys * ys) <= radius * radius).astype(np.float32)


def free_cell_mask(occupied: jnp.ndarray, radius: float) -> jnp.ndarray:
    """occupied: [H, W] (1.0 at active heads). Returns [H, W] 1.0 where
    EDT(1-occupied) > radius — i.e. where a new trajectory may spawn."""
    kern = jnp.asarray(disc_kernel(radius))
    kh, kw = kern.shape
    x = occupied[None, None, :, :]
    w = kern[None, None, :, :]
    hits = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)]
    )[0, 0]
    return (hits == 0.0).astype(occupied.dtype)
