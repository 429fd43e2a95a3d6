"""Triplet baseline-ratio estimation for similarity-constrained translation averaging.

ParticleSfM's headline addition to LUD position estimation is per-triplet
baseline-ratio scale constraints (/root/reference/sfm/gmapper/src/global/
triplet_util.cc:61-140, consumed at least_unsquared_deviation_position_estimator.cc:
103-138,307-335). The reference computes ratios per triplet in a thread pool by
triangulating common points at unit baseline; here the whole triplet set is one
vmapped kernel:

  for each pair (a, b) in the triplet, place camera a at the origin and camera b
  at -w_ab (unit baseline along the estimated world direction of p_a - p_b),
  two-ray triangulate each common point, and read off its depth from each camera.
  The physical depth is (depth at unit baseline) x (true baseline), so ratios of
  unit-baseline depths of the SAME point from the SAME camera across two pairs
  give the inverse baseline ratio. Ratios are aggregated by a masked median with
  minimum-triangulation-angle gating.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .translation import TripletConstraints


def _masked_median(x, mask):
    big = jnp.where(mask, x, jnp.inf)
    sorted_x = jnp.sort(big)
    count = jnp.sum(mask.astype(jnp.int32))
    mid = jnp.clip(count // 2, 0, x.shape[0] - 1)
    return jnp.where(count > 0, sorted_x[mid], 1.0)


def _unit_baseline_depths(r_a, r_b, p_b, min_angle_rad):
    """Two-ray depths with camera a at origin, camera b at p_b (unit baseline).

    r_a, r_b: [Q, 3] unit world rays. Returns (depth_a, depth_b, valid [Q]).
    """
    c = jnp.sum(r_a * r_b, axis=-1)
    denom = jnp.maximum(1.0 - c * c, 1e-12)
    pa = jnp.sum(r_a * p_b, axis=-1)
    pb = jnp.sum(r_b * p_b, axis=-1)
    la = (pa - c * pb) / denom
    lb = (c * pa - pb) / denom
    ang = jnp.arccos(jnp.clip(jnp.abs(c), -1.0, 1.0))
    valid = (la > 1e-6) & (lb > 1e-6) & (ang >= min_angle_rad)
    return la, lb, valid


def _one_triplet(Ri, Rj, Rk, w_ij, w_ik, w_jk, xi, xj, xk, mask, min_angle_rad, max_points):
    ones = jnp.ones(xi.shape[:-1] + (1,), xi.dtype)

    def world_rays(R, x):
        r = jnp.einsum("ji,qj->qi", R, jnp.concatenate([x, ones], -1))
        return r / jnp.clip(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)

    ri, rj, rk = world_rays(Ri, xi), world_rays(Rj, xj), world_rays(Rk, xk)
    # pair (i, j): p_i = 0, p_j = -w_ij (w ~ p_i - p_j)
    dij_i, dij_j, v_ij = _unit_baseline_depths(ri, rj, -w_ij, min_angle_rad)
    dik_i, _, v_ik = _unit_baseline_depths(ri, rk, -w_ik, min_angle_rad)
    djk_j, _, v_jk = _unit_baseline_depths(rj, rk, -w_jk, min_angle_rad)

    ok_ik = mask & v_ij & v_ik
    ok_jk = mask & v_ij & v_jk
    b_ik = _masked_median(dij_i / jnp.maximum(dik_i, 1e-12), ok_ik)
    b_jk = _masked_median(dij_j / jnp.maximum(djk_j, 1e-12), ok_jk)
    count = jnp.minimum(jnp.sum(ok_ik.astype(jnp.int32)), jnp.sum(ok_jk.astype(jnp.int32)))
    weight = jnp.minimum(count.astype(xi.dtype) / max_points, 1.0)
    weight = jnp.where(count >= 3, weight, 0.0)
    ratios = jnp.stack([jnp.ones_like(b_ik), b_ik, b_jk])
    return ratios, weight


@partial(jax.jit, static_argnames=("max_points",))
def triplet_baseline_constraints(
    R_abs: jnp.ndarray,        # [V, 3, 3]
    w_dir: jnp.ndarray,        # [E, 3] unit world directions per edge
    triplet_views: jnp.ndarray,  # [T, 3] int32 image indices (i, j, k)
    triplet_edges: jnp.ndarray,  # [T, 3] int32 edge indices (ij, ik, jk)
    x_i: jnp.ndarray,          # [T, Q, 2] normalized coords of common points in i
    x_j: jnp.ndarray,
    x_k: jnp.ndarray,
    mask: jnp.ndarray,         # [T, Q]
    min_angle_deg: float | jnp.ndarray = 2.0,
    max_points: int = 100,
) -> TripletConstraints:
    min_rad = jnp.deg2rad(jnp.asarray(min_angle_deg, x_i.dtype))
    Ri = R_abs[triplet_views[:, 0]]
    Rj = R_abs[triplet_views[:, 1]]
    Rk = R_abs[triplet_views[:, 2]]
    wij = w_dir[triplet_edges[:, 0]]
    wik = w_dir[triplet_edges[:, 1]]
    wjk = w_dir[triplet_edges[:, 2]]
    ratios, weight = jax.vmap(
        lambda a, b, c, d, e, f, g, h, i, m: _one_triplet(
            a, b, c, d, e, f, g, h, i, m, min_rad, float(max_points)
        )
    )(Ri, Rj, Rk, wij, wik, wjk, x_i, x_j, x_k, mask)
    return TripletConstraints(edge_idx=triplet_edges, ratios=ratios, weight=weight)
