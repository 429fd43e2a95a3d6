"""Robust rotation averaging: Chatterjee-Govindu L1-IRLS, dense on the MXU.

Counterpart of the reference's sparse-Cholesky implementation
(/root/reference/sfm/gmapper/src/global/robust_rotation_estimator.{h,cc}):
same residual R_err = R_j^T R_ij R_i in angle-axis (robust_rotation_estimator.cc:273-298),
same two-phase schedule (L1 minimization then IRLS with w = sigma^2/(e^2+sigma^2)^2,
lines 162-250). The tangent-space linear system is a graph Laplacian (x) I_3, so each
step is one dense VxV Cholesky with 3 right-hand sides — problems of this class have
<= ~2k cameras, which is trivially dense on TPU and removes the sparse solver entirely.

Edges may be padded: rows with edge_mask == 0 contribute zero weight.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import rotations as rot


def _edge_residuals(R, Ri_rel, edges):
    """err_e = Log(R_j^T R_ij R_i) in angle-axis, [E, 3]."""
    Ri = R[edges[:, 0]]
    Rj = R[edges[:, 1]]
    M = jnp.einsum("eji,ejk,ekl->eil", Rj, Ri_rel, Ri)
    return rot.rotmat_to_angle_axis(M)


def _solve_tangent_step(num_views, edges, w, err):
    """min_delta sum_e w_e ||err_e + delta_i - delta_j||^2 with delta_0 = 0.

    Returns delta [V, 3]. The Hessian is the weighted graph Laplacian [V, V]
    (identical for x/y/z), solved densely with 3 RHS.
    """
    V = num_views
    i = edges[:, 0]
    j = edges[:, 1]
    L = jnp.zeros((V, V), err.dtype)
    L = L.at[i, i].add(w)
    L = L.at[j, j].add(w)
    L = L.at[i, j].add(-w)
    L = L.at[j, i].add(-w)
    b = jnp.zeros((V, 3), err.dtype)
    b = b.at[i].add(-w[:, None] * err)
    b = b.at[j].add(w[:, None] * err)
    # gauge: pin view 0
    L = L.at[0, :].set(0.0).at[:, 0].set(0.0).at[0, 0].set(1.0)
    b = b.at[0].set(0.0)
    # guard against isolated padded views
    L = L + 1e-8 * jnp.eye(V, dtype=L.dtype)
    return jnp.linalg.solve(L, b)


@partial(jax.jit, static_argnames=("num_views", "l1_iters", "irls_iters"))
def average_rotations(
    num_views: int,
    edges: jnp.ndarray,       # [E, 2] int32 (i, j); may contain padded rows
    R_rel: jnp.ndarray,       # [E, 3, 3] relative rotations R_ij (R_j ~= R_ij R_i)
    R_init: jnp.ndarray,      # [V, 3, 3] initial absolute rotations (e.g. MST chain)
    edge_mask: jnp.ndarray,   # [E] 1.0 valid / 0.0 padded
    l1_iters: int = 5,
    irls_iters: int = 30,
    sigma_deg: float = 5.0,
):
    """Returns (refined absolute rotations [V, 3, 3] (world->cam, view 0 pinned),
    info dict with per-phase iteration counts and the final mean edge residual).

    Both phases terminate on step-norm convergence (max_i ||delta_i|| below
    tolerance) with the configured iteration counts as hard caps, mirroring
    Theia's RobustRotationEstimator convergence checks instead of running a
    fixed schedule (robust_rotation_estimator.cc:162-250).
    """
    sigma = jnp.deg2rad(jnp.asarray(sigma_deg, R_init.dtype))
    step_tol = jnp.asarray(1e-4, R_init.dtype)   # radians; ~0.006 deg

    def apply_step(R, delta):
        # right perturbation: R_i <- R_i Exp(delta_i) matches err ~ err0 + d_i - d_j
        return jnp.einsum("vij,vjk->vik", R, rot.angle_axis_to_rotmat(delta))

    def phase(R, weight_fn, max_iters):
        def body(carry):
            R, it, _step = carry
            err = _edge_residuals(R, R_rel, edges)
            w = weight_fn(err)
            delta = _solve_tangent_step(num_views, edges, w, err)
            step = jnp.max(jnp.linalg.norm(delta, axis=-1))
            return apply_step(R, delta), it + 1, step

        def cond(carry):
            it, step = carry[1], carry[2]
            return (step > step_tol) & (it < max_iters)

        R, it, step = jax.lax.while_loop(
            cond, body, (R, jnp.zeros((), jnp.int32),
                         jnp.asarray(jnp.inf, R_init.dtype)))
        return R, it, step

    def l1_weights(err):
        e = jnp.linalg.norm(err, axis=-1)
        return edge_mask / jnp.maximum(e, 1e-5)   # IRLS weight for L1

    def irls_weights(err):
        e2 = jnp.sum(err * err, axis=-1)
        return edge_mask * (sigma * sigma) / jnp.square(e2 + sigma * sigma)

    R, it_l1, _ = phase(R_init, l1_weights, l1_iters)
    R, it_irls, last_step = phase(R, irls_weights, irls_iters)
    err = _edge_residuals(R, R_rel, edges)
    e = jnp.linalg.norm(err, axis=-1)
    mean_err = jnp.sum(e * edge_mask) / jnp.maximum(jnp.sum(edge_mask), 1.0)
    # median over valid edges (padded rows pushed to +inf): robust to outlier
    # edges that the averaging correctly down-weights but cannot zero out
    e_valid = jnp.where(edge_mask > 0, e, jnp.inf)
    k = jnp.maximum(jnp.sum(edge_mask > 0).astype(jnp.int32) // 2, 0)
    med_err = jnp.sort(e_valid)[k]
    info = {"l1_iters": it_l1, "irls_iters": it_irls,
            "last_step_rad": last_step, "mean_residual_rad": mean_err,
            "median_residual_rad": med_err}
    return rot.project_to_rotmat(R), info
