"""Dense flow consistency ops: backward warping, occlusion masks, motion boundaries.

Behavioral contract from /root/reference/point_trajectory/utils.py:
- backward_warp: sample the backward flow map at pixel+forward_flow (lines 71-86)
- occlusion:  err = ||warp(flow_b) + flow_f||, occluded if err > thres OR target
  out of bounds (lines 88-105, get_oob_mask at 60-68)
- motion_boundary: flow-gradient magnitude > thres * ||flow|| (trajectory.py:39-43)

All ops are batched over frames [T, H, W, 2] and jit-friendly; frames shard
data-parallel over the device mesh (embarrassingly parallel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import bilinear_sample, grid_coords


def backward_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp img [H, W, C] by flow [H, W, 2]: out(p) = img(p + flow(p))."""
    H, W, _ = flow.shape
    coords = grid_coords(H, W, flow.dtype) + flow
    return bilinear_sample(img, coords)


def out_of_bounds_mask(flow: jnp.ndarray) -> jnp.ndarray:
    """1.0 where pixel + flow leaves [0, W-1] x [0, H-1]."""
    H, W, _ = flow.shape
    target = grid_coords(H, W, flow.dtype) + flow
    oob = (
        (target[..., 0] < 0)
        | (target[..., 0] > W - 1)
        | (target[..., 1] < 0)
        | (target[..., 1] > H - 1)
    )
    return oob.astype(flow.dtype)


def occlusion_mask(flow_f: jnp.ndarray, flow_b: jnp.ndarray, thres: float):
    """Forward/backward consistency. Returns (occ [H,W] bool-as-float, err [H,W])."""
    warped_b = backward_warp(flow_b, flow_f)
    err = jnp.linalg.norm(warped_b + flow_f, axis=-1)
    occ = (err > thres).astype(flow_f.dtype)
    occ = jnp.clip(occ + out_of_bounds_mask(flow_f), 0.0, 1.0)
    return occ, err


def flow_check(flows_f: jnp.ndarray, flows_b: jnp.ndarray, thres: float):
    """Batched occlusion check over [T, H, W, 2] stacks. Returns (occ [T,H,W], err)."""
    return jax.vmap(lambda f, b: occlusion_mask(f, b, thres))(flows_f, flows_b)


def motion_boundary(flow: jnp.ndarray, thres: float = 0.02) -> jnp.ndarray:
    """Motion-boundary mask: forward-difference gradient magnitude vs flow norm."""
    dx = jnp.zeros_like(flow)
    dy = jnp.zeros_like(flow)
    dx = dx.at[:, :-1, :].set(jnp.abs(flow[:, :-1, :] - flow[:, 1:, :]))
    dy = dy.at[:-1, :, :].set(jnp.abs(flow[:-1, :, :] - flow[1:, :, :]))
    grad = jnp.sqrt(jnp.mean(dx, -1) ** 2 + jnp.mean(dy, -1) ** 2)
    return (grad > thres * jnp.linalg.norm(flow, axis=-1)).astype(flow.dtype)
