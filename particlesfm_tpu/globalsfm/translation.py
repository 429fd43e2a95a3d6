"""Translation estimation: pairwise refinement with known rotations + LUD averaging.

Pairwise refinement mirrors the reference's IRLS on the epipolar constraint
(/root/reference/sfm/gmapper/src/global/known_rotation_util.cc:109-193): per pair,
the world-frame baseline direction w (p_i - p_j) satisfies (f1w x f2w) . w = 0 for
every correspondence (f?w = world-rotated rays); IRLS minimizes sum |a_m . w| over
||w|| = 1 with the null vector of the weighted 3x3 scatter matrix, and the sign is
fixed by a cheirality majority vote. Where the reference runs one pair per thread in
a colmap::ThreadPool (known_rotation_util.cc:195-229), we vmap over all pairs.

Position averaging is the reference's default LUD ("least unsquared deviations")
with ParticleSfM's similarity-averaging addition of per-triplet baseline-ratio
scale constraints (least_unsquared_deviation_position_estimator.cc:140-177,258-344):

    min sum_e || p_i - p_j - s_e w_e ||_1  +  sum_t w_t | (b./b.) s_a - s_b |_1
    s.t. s_e >= 1  (view 0 pinned at the origin)

The constrained L1 program (theia::ConstrainedL1Solver, ADMM) becomes projected
IRLS with the substitution s = 1 + u, u >= 0: each iteration reweights rows
elementwise by 1/|r| and solves the normal equations matrix-free with CG — the
forward/adjoint operators are pure gather/segment-sum kernels, so the whole solve
stays on device with static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import epipolar, rotations as rot


# ---------------------------------------------------------------------------
# pairwise translation refinement
# ---------------------------------------------------------------------------

def _refine_one(x1, x2, mask, Ri, Rj, w_init, num_iters):
    """Refine world baseline direction w (unit, p_i - p_j) for one pair."""
    ones = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    f1w = jnp.einsum("ji,nj->ni", Ri, jnp.concatenate([x1, ones], -1))
    f2w = jnp.einsum("ji,nj->ni", Rj, jnp.concatenate([x2, ones], -1))
    a = jnp.cross(f1w, f2w)                               # [M, 3]
    m = mask.astype(x1.dtype)

    def body(w, _):
        e = jnp.abs(a @ w)
        wgt = m / jnp.maximum(e, 1e-7)
        C = jnp.einsum("n,ni,nj->ij", wgt, a, a)
        evals, evecs = jnp.linalg.eigh(C)
        return evecs[:, 0], None

    w, _ = jax.lax.scan(body, w_init, None, length=num_iters)

    # cheirality: with t_ij = R_j w, do the majority of matches triangulate in front?
    Rij = Rj @ Ri.T
    t_ij = Rj @ w
    d1, d2 = epipolar.triangulate_midpoint_depths(Rij, t_ij, x1, x2)
    front = jnp.sum(((d1 > 0) & (d2 > 0)) * m)
    total = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.where(front > 0.5 * total, w, -w)


@partial(jax.jit, static_argnames=("num_iters",))
def refine_pairwise_translations(
    edges: jnp.ndarray,      # [E, 2] int32
    R_abs: jnp.ndarray,      # [V, 3, 3] world->cam rotations
    x1: jnp.ndarray,         # [E, M, 2] normalized coords in image i
    x2: jnp.ndarray,         # [E, M, 2] normalized coords in image j
    mask: jnp.ndarray,       # [E, M] bool
    w_init: jnp.ndarray,     # [E, 3] initial directions (e.g. from two-view poses)
    num_iters: int = 64,
) -> jnp.ndarray:
    """Refined unit world-frame baseline directions w_e ~ p_i - p_j, [E, 3]."""
    Ri = R_abs[edges[:, 0]]
    Rj = R_abs[edges[:, 1]]
    return jax.vmap(lambda a, b, m, ri, rj, w: _refine_one(a, b, m, ri, rj, w, num_iters))(
        x1, x2, mask, Ri, Rj, w_init
    )


def directions_from_relative_poses(edges, R_abs, t_rel):
    """World baseline directions from two-view translations: w = R_j^T t_ij."""
    Rj = R_abs[edges[:, 1]]
    w = jnp.einsum("eji,ej->ei", Rj, t_rel)
    return w / jnp.clip(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# LUD position averaging
# ---------------------------------------------------------------------------

class TripletConstraints(NamedTuple):
    """Baseline-ratio scale constraints: 3 rows per triplet over scale variables.

    edge_idx [T, 3]: indices into the edge list of pairs (ij, ik, jk);
    ratios [T, 3]: triangulated baselines (b_ij, b_ik, b_jk) within the triplet;
    weight [T]: confidence (#common points scaled), 0 disables a row group.
    """
    edge_idx: jnp.ndarray
    ratios: jnp.ndarray
    weight: jnp.ndarray

    @staticmethod
    def empty():
        return TripletConstraints(
            edge_idx=jnp.zeros((0, 3), jnp.int32),
            ratios=jnp.ones((0, 3), jnp.float32),
            weight=jnp.zeros((0,), jnp.float32),
        )


def _lud_ops(num_views, edges, w_dir, trip: TripletConstraints):
    """Forward/adjoint of the LUD constraint operator with s = 1 + u.

    Unknowns z = (p [V,3], u [E]); p[0] is the pinned gauge (projected to 0).
    Rows: pair rows  p_i - p_j - (1+u_e) w_e            -> linear part + const -w_e
          triplet rows over scales, e.g. (b_ik/b_ij) s_ij - s_ik   (x3 combos)
    Returns (forward, adjoint, b_pair [E,3], b_trip [T,3]) where the residual is
    forward(z) - b.
    """
    i = edges[:, 0]
    j = edges[:, 1]
    e12, e13, e23 = trip.edge_idx[:, 0], trip.edge_idx[:, 1], trip.edge_idx[:, 2]
    b12, b13, b23 = trip.ratios[:, 0], trip.ratios[:, 1], trip.ratios[:, 2]
    tw = trip.weight
    r12 = b13 / jnp.maximum(b12, 1e-12)
    r13 = b23 / jnp.maximum(b12, 1e-12)
    r23 = b23 / jnp.maximum(b13, 1e-12)

    def project(p):
        return p.at[0].set(0.0)

    def forward(p, u):
        p = project(p)
        r_pair = p[i] - p[j] - u[:, None] * w_dir
        rA = tw * (r12 * u[e12] - u[e13])
        rB = tw * (r13 * u[e12] - u[e23])
        rC = tw * (r23 * u[e13] - u[e23])
        return r_pair, jnp.stack([rA, rB, rC], axis=-1)

    def adjoint(y_pair, y_trip):
        p = jnp.zeros((num_views, 3), y_pair.dtype)
        p = p.at[i].add(y_pair)
        p = p.at[j].add(-y_pair)
        u = -jnp.sum(y_pair * w_dir, axis=-1)
        yA, yB, yC = y_trip[:, 0] * tw, y_trip[:, 1] * tw, y_trip[:, 2] * tw
        u = u.at[e12].add(r12 * yA + r13 * yB)
        u = u.at[e13].add(-yA + r23 * yC)
        u = u.at[e23].add(-yB - yC)
        return project(p), u

    b_pair = w_dir                                     # from -(1) * w_e moved to RHS
    b_trip = jnp.stack([tw * (1.0 - r12), tw * (1.0 - r13), tw * (1.0 - r23)], -1)
    return forward, adjoint, b_pair, b_trip


@partial(jax.jit, static_argnames=("num_views", "irls_iters", "cg_iters"))
def estimate_positions_lud(
    num_views: int,
    edges: jnp.ndarray,        # [E, 2] int32
    w_dir: jnp.ndarray,        # [E, 3] unit world directions p_i - p_j
    edge_mask: jnp.ndarray,    # [E] 1.0 valid / 0.0 padded
    triplets: TripletConstraints | None = None,
    irls_iters: int = 32,
    cg_iters: int = 64,
    irls_eps: float = 1e-4,
):
    """Camera positions [V, 3] (view 0 at origin) + per-edge scales [E]."""
    trip = triplets if triplets is not None else TripletConstraints.empty()
    forward, adjoint, b_pair, b_trip = _lud_ops(num_views, edges, w_dir, trip)
    em = edge_mask[:, None]

    def normal_matvec(p, u, wp, wt, damp):
        rp, rtr = forward(p, u)
        ap, au = adjoint(rp * wp, rtr * wt)
        return ap + damp * p, au + damp * u

    def cg_solve(wp, wt, p0, u0, damp):
        bp, bu = adjoint(b_pair * wp, b_trip * wt)
        Ap, Au = normal_matvec(p0, u0, wp, wt, damp)
        rp, ru = bp - Ap, bu - Au
        zp, zu = rp, ru
        rs = jnp.sum(rp * rp) + jnp.sum(ru * ru)

        def body(carry, _):
            p, u, rp, ru, zp, zu, rs = carry
            Ap, Au = normal_matvec(zp, zu, wp, wt, damp)
            alpha = rs / jnp.maximum(jnp.sum(zp * Ap) + jnp.sum(zu * Au), 1e-20)
            p = p + alpha * zp
            u = u + alpha * zu
            rp = rp - alpha * Ap
            ru = ru - alpha * Au
            rs_new = jnp.sum(rp * rp) + jnp.sum(ru * ru)
            beta = rs_new / jnp.maximum(rs, 1e-20)
            zp = rp + beta * zp
            zu = ru + beta * zu
            return (p, u, rp, ru, zp, zu, rs_new), None

        (p, u, *_), _ = jax.lax.scan(
            body, (p0, u0, rp, ru, zp, zu, rs), None, length=cg_iters
        )
        return p, u

    def irls_body(carry, _):
        p, u = carry
        rp, rtr = forward(p, u)
        res_p = rp - b_pair
        res_t = rtr - b_trip
        wp = em / jnp.maximum(jnp.abs(res_p), irls_eps)
        wt = 1.0 / jnp.maximum(jnp.abs(res_t), irls_eps)
        p, u = cg_solve(wp, wt, p, u, damp=1e-8)
        u = jnp.maximum(u, 0.0)          # project scales back to s >= 1
        return (p, u), None

    p0 = jnp.zeros((num_views, 3), w_dir.dtype)
    u0 = jnp.zeros((edges.shape[0],), w_dir.dtype)
    # first pass: plain least squares (unit weights) to leave the origin
    p, u = cg_solve(em * jnp.ones_like(b_pair), jnp.ones_like(b_trip), p0, u0, 1e-8)
    u = jnp.maximum(u, 0.0)
    (p, u), _ = jax.lax.scan(irls_body, (p, u), None, length=irls_iters)
    return p.at[0].set(0.0), 1.0 + u
