"""Pallas TPU kernel: windowed correlation-pyramid lookup for RAFT.

The lookup samples, for every source pixel p, a (2r+1)^2 window of its own
correlation map corr[p] at coords[p] + integer offsets, bilinearly. The XLA
fallback (models/raft.py lookup_corr) lowers to 4 x 81 scattered gathers per
pixel per level. This kernel exploits the structure instead: all 81 sample
points of a pixel share ONE fractional offset, so the whole window equals a
bilinear combination of four integer-shifted copies of a (2r+2)^2 window —
one small strided DMA from HBM per (pixel, level) instead of hundreds of
gathers, then pure VPU math:

    out = (1-wy)(1-wx) W[:-1,:-1] + (1-wy)wx W[:-1,1:]
        + wy(1-wx) W[1:,:-1]  + wy wx W[1:,1:]

The correlation map is pre-padded with zeros so every slice is in-bounds and
out-of-image samples read 0 (grid_sample zero-padding semantics).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(coords_ref, corr_hbm, out_ref, scratch, sem, *, radius, Hp, Wp):
    """One program per source pixel: DMA its window, combine 4 shifts."""
    r = radius
    win = 2 * r + 2
    i = pl.program_id(0)
    cx = coords_ref[i, 0]
    cy = coords_ref[i, 1]
    # clamp into the padded-safe region; PAD = 2r+2 zeros on each side
    pad = 2 * r + 2
    Wl = Wp - 2 * pad
    Hl = Hp - 2 * pad
    cx = jnp.clip(cx, -(r + 1.0), Wl + r + 0.0)
    cy = jnp.clip(cy, -(r + 1.0), Hl + r + 0.0)
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    wx = cx - x0
    wy = cy - y0
    xs = x0.astype(jnp.int32) - r + pad
    ys = y0.astype(jnp.int32) - r + pad

    dma = pltpu.make_async_copy(
        corr_hbm.at[i, pl.ds(ys, win), pl.ds(xs, win)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    W = scratch[:, :]
    top = (1.0 - wx) * W[: win - 1, : win - 1] + wx * W[: win - 1, 1:win]
    bot = (1.0 - wx) * W[1:win, : win - 1] + wx * W[1:win, 1:win]
    out_ref[0, :, :] = (1.0 - wy) * top + wy * bot


@partial(jax.jit, static_argnames=("radius", "interpret"))
def lookup_corr_level_pallas(corr: jnp.ndarray, coords: jnp.ndarray, radius: int = 4,
                             interpret: bool = False):
    """corr: [P, Hl, Wl] per-pixel correlation maps; coords: [P, 2] (x, y) at
    this level's scale. Returns [P, (2r+1), (2r+1)]."""
    P, Hl, Wl = corr.shape
    r = radius
    pad = 2 * r + 2
    corr_p = jnp.pad(corr, ((0, 0), (pad, pad), (pad, pad)))
    Hp, Wp = Hl + 2 * pad, Wl + 2 * pad
    win = 2 * r + 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2 * r + 1, 2 * r + 1), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((win, win), corr.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = partial(_lookup_kernel, radius=r, Hp=Hp, Wp=Wp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, 2 * r + 1, 2 * r + 1), corr.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(coords, corr_p)


def lookup_corr_pyramid_pallas(pyramid, coords: jnp.ndarray, radius: int = 4,
                               interpret: bool = False):
    """Drop-in replacement for models.raft.lookup_corr.

    pyramid: list of [P, Hl, Wl, 1]; coords: [H, W, 2] at level-0 scale.
    Returns [H, W, num_levels * (2r+1)^2].
    """
    H, W, _ = coords.shape
    P = H * W
    flat = coords.reshape(P, 2)
    out = []
    for lvl, corr in enumerate(pyramid):
        c = flat / (2.0 ** lvl)
        o = lookup_corr_level_pallas(corr[..., 0], c, radius, interpret)
        out.append(o.reshape(P, -1))
    return jnp.concatenate(out, axis=-1).reshape(H, W, -1)
