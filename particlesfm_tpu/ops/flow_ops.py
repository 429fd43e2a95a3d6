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


def compose_flow(flow_ab: jnp.ndarray, flow_bc: jnp.ndarray):
    """Chain two flow fields: out(p) = flow_ab(p) + flow_bc(p + flow_ab(p)).

    Returns (composed [H,W,2], valid [H,W] bool) — valid is False where the
    intermediate lookup left the image (the composition is undefined there).
    """
    H, W, _ = flow_ab.shape
    mid = grid_coords(H, W, flow_ab.dtype) + flow_ab
    valid = (
        (mid[..., 0] >= 0) & (mid[..., 0] <= W - 1)
        & (mid[..., 1] >= 0) & (mid[..., 1] <= H - 1)
    )
    return flow_ab + bilinear_sample(flow_bc, mid), valid


def stride2_compose_fallback(
    flow2: jnp.ndarray,            # [N, H, W, 2] net stride-2 flow (pair i: i -> i+2)
    flow1_a: jnp.ndarray,          # [N, H, W, 2] stride-1 first hop  (i -> i+1)
    flow1_b: jnp.ndarray,          # [N, H, W, 2] stride-1 second hop (i+1 -> i+2)
    disagree_px: float = 4.0,
):
    """Replace net stride-2 flow with the stride-1 composition where they
    disagree by more than `disagree_px`.

    Motivation (measured on the protocol-scale acceptance set): the compact
    flow net's stride-2 error is bimodal — ~0.5 px median but 17-20 px on
    pairs whose true displacement exceeds its trained motion range (~44 px),
    while the composition of two stride-1 fields stays at ~1-1.6 px
    everywhere. Where both agree the (slightly sharper) net field is kept;
    large disagreement means one of them failed, and only the net's failure
    mode is unbounded. Composition is skipped where its intermediate lookup
    left the image."""
    comp, valid = jax.vmap(compose_flow)(flow1_a, flow1_b)
    disagree = jnp.linalg.norm(flow2 - comp, axis=-1) > disagree_px
    use_comp = (disagree & valid)[..., None]
    return jnp.where(use_comp, comp, flow2), use_comp[..., 0]


def motion_boundary(flow: jnp.ndarray, thres: float = 0.02) -> jnp.ndarray:
    """Motion-boundary mask: forward-difference gradient magnitude vs flow norm."""
    dx = jnp.zeros_like(flow)
    dy = jnp.zeros_like(flow)
    dx = dx.at[:, :-1, :].set(jnp.abs(flow[:, :-1, :] - flow[:, 1:, :]))
    dy = dy.at[:-1, :, :].set(jnp.abs(flow[:-1, :, :] - flow[1:, :, :]))
    grad = jnp.sqrt(jnp.mean(dx, -1) ** 2 + jnp.mean(dy, -1) ** 2)
    return (grad > thres * jnp.linalg.norm(flow, axis=-1)).astype(flow.dtype)
