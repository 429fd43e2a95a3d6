"""Path-consistency trajectory optimization as batched Gauss-Newton.

Replaces the reference's Ceres solve (/root/reference/point_trajectory/optimize/src/
trajectory_optimize.cpp:50-82 with the residual at path_consistency_cost.h:42-59):
per trajectory a 4-dof block p = (x1, y1, x2, y2) with 6 residuals

    r0,r1 = (x1,y1) - uv_ref1                    # stride-1 flow anchor
    r2,r3 = ((x2,y2) - uv_ref2) * ref2_scale     # stride-2 flow anchor
    r4,r5 = (x2,y2) - (x1,y1) - flow12(x1,y1)    # path consistency via bilinear map

The problem is block-diagonal across trajectories, so instead of one sparse
Cholesky we run a vmapped Levenberg-Marquardt with closed-form 4x4 solves —
one fused XLA kernel over the whole batch. flow12 is sampled with edge-clamp
bilinear interpolation (Ceres Grid2D semantics, linear_interpolation.h:85-146).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sample_flow_and_jac(flow_map: jnp.ndarray, xy: jnp.ndarray):
    """Edge-clamped bilinear sample of flow_map [H, W, 2] at xy [..., 2].

    Returns (flow [..., 2], jac [..., 2, 2]) where jac = d flow / d xy, the exact
    piecewise-constant derivative of the interpolant (what Ceres' autodiff sees).
    """
    H, W, _ = flow_map.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    dx = (x - x0.astype(x.dtype))[..., None]
    dy = (y - y0.astype(y.dtype))[..., None]
    f00 = flow_map[y0, x0]
    f01 = flow_map[y0, x0 + 1]
    f10 = flow_map[y0 + 1, x0]
    f11 = flow_map[y0 + 1, x0 + 1]
    top = f00 + dx * (f01 - f00)
    bot = f10 + dx * (f11 - f10)
    val = top + dy * (bot - top)
    dfdx = (1 - dy) * (f01 - f00) + dy * (f11 - f10)
    dfdy = bot - top
    jac = jnp.stack([dfdx, dfdy], axis=-1)  # [..., 2(channel), 2(x,y)]
    # clamp region has zero derivative in the clamped direction
    inx = ((xy[..., 0] >= 0.0) & (xy[..., 0] <= W - 1.0))[..., None, None]
    iny = ((xy[..., 1] >= 0.0) & (xy[..., 1] <= H - 1.0))[..., None, None]
    gate = jnp.concatenate([inx, iny], axis=-1).astype(val.dtype)
    return val, jac * gate


_PATCH = 6  # local flow window per trajectory: allows +-2 px of refinement
            # travel around the init before edge-clamping (Ceres converges to
            # subpixel adjustments here; see optimize_locations_patch)


def _extract_patches(flow_map: jnp.ndarray, xy: jnp.ndarray):
    """Gather a [P, P, 2] window of flow_map [H, W, 2] around each xy [..., 2].

    Returns (patch [..., P, P, 2], ps [..., 2] int32 window origin). Windows are
    clipped fully inside the image, so every later in-window read is in-bounds
    and image-edge behavior matches edge-clamped interpolation.
    """
    H, W, _ = flow_map.shape
    P = _PATCH
    px = jnp.clip(jnp.floor(xy[..., 0]).astype(jnp.int32) - (P // 2 - 1), 0, W - P)
    py = jnp.clip(jnp.floor(xy[..., 1]).astype(jnp.int32) - (P // 2 - 1), 0, H - P)
    rows = py[..., None] + jnp.arange(P, dtype=jnp.int32)          # [..., P]
    cols = px[..., None] + jnp.arange(P, dtype=jnp.int32)          # [..., P]
    lin = rows[..., :, None] * W + cols[..., None, :]              # [..., P, P]
    flat = flow_map.reshape(H * W, 2)
    patch = jnp.take(flat, lin.reshape(lin.shape[:-2] + (P * P,)), axis=0)
    return patch.reshape(lin.shape + (2,)), jnp.stack([px, py], axis=-1)


def _patch_sample_and_jac(patch, ps, xy, height, width):
    """Bilinear sample + Jacobian from per-point patches — no gathers.

    The 2x2 interpolation cell is selected with one-hot weights over the patch
    nodes (a [P-1]-length einsum per corner), so the LM loop is pure vector
    math: scatter/gather-free, which is what makes the per-frame refinement
    cheap on TPU (XLA row gathers from the full flow map serialize).
    Semantics match _sample_flow_and_jac wherever the point stays within its
    window; beyond it, the window edge-clamps (refinement travel is subpixel
    in practice — the window gives +-2 px of slack).
    """
    P = _PATCH
    x = jnp.clip(xy[..., 0], 0.0, width - 1.0) - ps[..., 0].astype(xy.dtype)
    y = jnp.clip(xy[..., 1], 0.0, height - 1.0) - ps[..., 1].astype(xy.dtype)
    x = jnp.clip(x, 0.0, P - 1.0)
    y = jnp.clip(y, 0.0, P - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, P - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, P - 2).astype(jnp.int32)
    dx = (x - x0.astype(x.dtype))[..., None]
    dy = (y - y0.astype(y.dtype))[..., None]
    sel_x = jax.nn.one_hot(x0, P - 1, dtype=xy.dtype)              # [..., P-1]
    sel_y = jax.nn.one_hot(y0, P - 1, dtype=xy.dtype)
    f00 = jnp.einsum("...pqc,...p,...q->...c", patch[..., : P - 1, : P - 1, :], sel_y, sel_x)
    f01 = jnp.einsum("...pqc,...p,...q->...c", patch[..., : P - 1, 1:, :], sel_y, sel_x)
    f10 = jnp.einsum("...pqc,...p,...q->...c", patch[..., 1:, : P - 1, :], sel_y, sel_x)
    f11 = jnp.einsum("...pqc,...p,...q->...c", patch[..., 1:, 1:, :], sel_y, sel_x)
    top = f00 + dx * (f01 - f00)
    bot = f10 + dx * (f11 - f10)
    val = top + dy * (bot - top)
    dfdx = (1 - dy) * (f01 - f00) + dy * (f11 - f10)
    dfdy = bot - top
    jac = jnp.stack([dfdx, dfdy], axis=-1)
    inx = ((xy[..., 0] >= 0.0) & (xy[..., 0] <= width - 1.0))[..., None, None]
    iny = ((xy[..., 1] >= 0.0) & (xy[..., 1] <= height - 1.0))[..., None, None]
    gate = jnp.concatenate([inx, iny], axis=-1).astype(val.dtype)
    return val, jac * gate


def path_consistency_residuals(p, uv_ref1, uv_ref2, ref2_scale, flow12_map,
                               sample_fn=None):
    """Residuals r [..., 6] and Jacobian J [..., 6, 4] for blocks p [..., 4]."""
    x1 = p[..., 0:2]
    x2 = p[..., 2:4]
    if sample_fn is None:
        f12, jf = _sample_flow_and_jac(flow12_map, x1)
    else:
        f12, jf = sample_fn(x1)
    r01 = x1 - uv_ref1
    r02 = (x2 - uv_ref2) * ref2_scale[..., None]
    r12 = (x2 - x1) - f12
    r = jnp.concatenate([r01, r02, r12], axis=-1)

    eye2 = jnp.eye(2, dtype=p.dtype)
    z2 = jnp.zeros_like(eye2)
    shape = p.shape[:-1]
    e = jnp.broadcast_to(eye2, shape + (2, 2))
    z = jnp.broadcast_to(z2, shape + (2, 2))
    s = ref2_scale[..., None, None] * e
    J_top = jnp.concatenate([e, z], axis=-1)          # d r01 / d(x1,x2)
    J_mid = jnp.concatenate([z, s], axis=-1)          # d r02
    J_bot = jnp.concatenate([-e - jf, e], axis=-1)    # d r12
    J = jnp.concatenate([J_top, J_mid, J_bot], axis=-2)
    return r, J


def _solve4_spd(H, g):
    """Batched 4x4 SPD solve via explicit Cholesky (pure elementwise ops).

    jnp.linalg.solve inside the tracker's lax.scan faults the TPU worker at
    large batch sizes; this closed-form factorization uses no linalg primitive
    and is faster anyway. H: [..., 4, 4], g: [..., 4] -> x with H x = g.
    """
    eps = 1e-20

    def at(i, j):
        return H[..., i, j]

    l00 = jnp.sqrt(jnp.maximum(at(0, 0), eps))
    l10 = at(1, 0) / l00
    l20 = at(2, 0) / l00
    l30 = at(3, 0) / l00
    l11 = jnp.sqrt(jnp.maximum(at(1, 1) - l10 * l10, eps))
    l21 = (at(2, 1) - l20 * l10) / l11
    l31 = (at(3, 1) - l30 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(at(2, 2) - l20 * l20 - l21 * l21, eps))
    l32 = (at(3, 2) - l30 * l20 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(at(3, 3) - l30 * l30 - l31 * l31 - l32 * l32, eps))
    # forward substitution L y = g
    y0 = g[..., 0] / l00
    y1 = (g[..., 1] - l10 * y0) / l11
    y2 = (g[..., 2] - l20 * y0 - l21 * y1) / l22
    y3 = (g[..., 3] - l30 * y0 - l31 * y1 - l32 * y2) / l33
    # back substitution L^T x = y
    x3 = y3 / l33
    x2 = (y2 - l32 * x3) / l22
    x1 = (y1 - l21 * x2 - l31 * x3) / l11
    x0 = (y0 - l10 * x1 - l20 * x2 - l30 * x3) / l00
    return jnp.stack([x0, x1, x2, x3], axis=-1)


@partial(jax.jit, static_argnames=("num_iters", "patch"))
def optimize_locations(
    uv12: jnp.ndarray,
    uv_ref1: jnp.ndarray,
    uv_ref2: jnp.ndarray,
    ref2_scale: jnp.ndarray,
    flow12_map: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    num_iters: int = 20,
    patch: bool = False,
) -> jnp.ndarray:
    """Batched LM solve of the path-consistency problem.

    uv12: [N, 4] initial (x1,y1,x2,y2); uv_ref1/uv_ref2: [N, 2]; ref2_scale: [N];
    flow12_map: [H, W, 2]; mask: [N] (rows with 0 are passed through unchanged).
    With `patch`, the flow map is gathered ONCE into per-point 6x6 windows and
    every LM iteration samples gather-free from them (same solution wherever
    the refinement stays within +-2 px of the init — it is subpixel in
    practice; the full-map mode re-gathers 4 corners per point per iteration).
    Returns optimized [N, 4].
    """
    if mask is None:
        mask = jnp.ones(uv12.shape[:-1], uv12.dtype)
    mask = mask.astype(uv12.dtype)

    sample_fn = None
    if patch:
        H, W, _ = flow12_map.shape
        patches, ps = _extract_patches(flow12_map, uv12[..., 0:2])
        sample_fn = lambda x1: _patch_sample_and_jac(patches, ps, x1, H, W)

    # Single-evaluation Levenberg-Marquardt: the carry holds the best point's
    # gradient/Hessian, so a rejected step re-proposes from the stored model
    # with larger damping instead of re-evaluating — one residual+Jacobian
    # evaluation (the bilinear-gather traffic that dominates the tracker's
    # per-frame cost) per iteration instead of two.
    def eval_model(p):
        r, J = path_consistency_residuals(p, uv_ref1, uv_ref2, ref2_scale,
                                          flow12_map, sample_fn)
        cost = jnp.sum(r * r, axis=-1)
        g = jnp.einsum("...ri,...r->...i", J, r)
        H = jnp.einsum("...ri,...rj->...ij", J, J)
        return cost, g, H

    cost0, g0, H0 = eval_model(uv12)

    def body(carry, _):
        p_best, cost_best, g, H, lam = carry
        Hd = H + lam[..., None, None] * jnp.eye(4, dtype=uv12.dtype)
        p_cand = p_best + _solve4_spd(Hd, -g)
        cost_c, g_c, H_c = eval_model(p_cand)
        better = cost_c < cost_best
        b1 = better[..., None]
        b2 = better[..., None, None]
        return (
            jnp.where(b1, p_cand, p_best),
            jnp.where(better, cost_c, cost_best),
            jnp.where(b1, g_c, g),
            jnp.where(b2, H_c, H),
            jnp.clip(jnp.where(better, lam * 0.3, lam * 4.0), 1e-8, 1e6),
        ), None

    lam0 = jnp.full(uv12.shape[:-1], 1e-4, uv12.dtype)
    (p_opt, *_), _ = jax.lax.scan(
        body, (uv12, cost0, g0, H0, lam0), None, length=num_iters
    )
    return jnp.where(mask[..., None] > 0, p_opt, uv12)
