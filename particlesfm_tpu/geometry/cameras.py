"""COLMAP-compatible camera models, batched and jit-friendly.

The reference pipeline imports all frames as one shared SIMPLE_PINHOLE camera with
initial focal f=1.2*max(h,w) handled by COLMAP (/root/reference/sfm/import_feature_matches.py:36-65);
its BA refines focal length. We support the three models the pipeline can encounter:
SIMPLE_PINHOLE (f,cx,cy), PINHOLE (fx,fy,cx,cy), SIMPLE_RADIAL (f,cx,cy,k).

Parameters are carried as a fixed-width row `params[...,4]` plus an integer model id,
so camera math vmaps over heterogeneous cameras without dynamic shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

SIMPLE_PINHOLE = 0
PINHOLE = 1
SIMPLE_RADIAL = 2

MODEL_NAMES = {SIMPLE_PINHOLE: "SIMPLE_PINHOLE", PINHOLE: "PINHOLE", SIMPLE_RADIAL: "SIMPLE_RADIAL"}
MODEL_IDS = {v: k for k, v in MODEL_NAMES.items()}
# COLMAP numeric model ids (read_write_model.py CAMERA_MODELS)
COLMAP_MODEL_ID = {SIMPLE_PINHOLE: 0, PINHOLE: 1, SIMPLE_RADIAL: 2}
FROM_COLMAP_MODEL_ID = {0: SIMPLE_PINHOLE, 1: PINHOLE, 2: SIMPLE_RADIAL}
NUM_PARAMS = {SIMPLE_PINHOLE: 3, PINHOLE: 4, SIMPLE_RADIAL: 4}


def pack_params(model: int, raw) -> jnp.ndarray:
    """Pack a COLMAP param list into the canonical row (fx, fy, cx, cy, k)."""
    raw = jnp.asarray(raw, jnp.float32)
    if model == SIMPLE_PINHOLE:
        f, cx, cy = raw[0], raw[1], raw[2]
        return jnp.stack([f, f, cx, cy, jnp.zeros_like(f)])
    if model == PINHOLE:
        return jnp.concatenate([raw[:4], jnp.zeros((1,), raw.dtype)])
    if model == SIMPLE_RADIAL:
        f, cx, cy, k = raw[0], raw[1], raw[2], raw[3]
        return jnp.stack([f, f, cx, cy, k])
    raise ValueError(f"unknown camera model {model}")


def unpack_params(model: int, packed) -> list:
    p = [float(x) for x in packed]
    if model == SIMPLE_PINHOLE:
        return [p[0], p[2], p[3]]
    if model == PINHOLE:
        return p[:4]
    if model == SIMPLE_RADIAL:
        return [p[0], p[2], p[3], p[4]]
    raise ValueError(f"unknown camera model {model}")


def cam_to_img(params: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Normalized camera coords (...,2) -> pixels (...,2). params: (...,5) canonical row."""
    fx, fy, cx, cy, k = jnp.moveaxis(params, -1, 0)
    r2 = jnp.sum(xy * xy, axis=-1)
    d = 1.0 + k * r2
    u = fx * xy[..., 0] * d + cx
    v = fy * xy[..., 1] * d + cy
    return jnp.stack([u, v], axis=-1)


def img_to_cam(params: jnp.ndarray, uv: jnp.ndarray, num_iters: int = 5) -> jnp.ndarray:
    """Pixels -> normalized camera coords; fixed-point undistortion for SIMPLE_RADIAL."""
    fx, fy, cx, cy, k = jnp.moveaxis(params, -1, 0)
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    xd = jnp.stack([x, y], axis=-1)
    xu = xd
    for _ in range(num_iters):
        r2 = jnp.sum(xu * xu, axis=-1, keepdims=True)
        xu = xd / (1.0 + k[..., None] * r2)
    return xu


def project(params: jnp.ndarray, x_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points (...,3) -> pixels (...,2). No cheirality masking."""
    z = x_cam[..., 2:3]
    xy = x_cam[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    return cam_to_img(params, xy)


def make_default_params(height: int, width: int, focal_factor: float = 1.2) -> jnp.ndarray:
    """COLMAP's default prior: f = focal_factor * max(h, w), principal point at center."""
    f = focal_factor * max(height, width)
    return jnp.array([f, f, width / 2.0, height / 2.0, 0.0], jnp.float32)
