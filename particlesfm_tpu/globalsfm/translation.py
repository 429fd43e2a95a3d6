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

The constrained L1 program (theia::ConstrainedL1Solver, ADMM) becomes IRLS with
block-coordinate descent: given scales, the positions solve three exact VxV
weighted-Laplacian systems (one per coordinate); given positions, the scales
solve an ExE system (diagonal from the pair rows + the triplet coupling) and are
clamped to s >= 1. The joint linear system must NOT be solved unconstrained: it
has an exact trivial solution (p = 0, s = 0), and only the active s >= 1
constraint removes that scale null space — solving blockwise with the clamp
applied inside the iteration keeps every subproblem well-posed. All pieces are
gather/segment-sum + small dense solves, fully on device with static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import epipolar, rotations as rot
from ..geometry.linalg3 import eigh3x3_desc


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
        # closed-form 3x3 eigendecomposition: C is near-singular BY DESIGN
        # (its null direction is the solution), which drives XLA's iterative
        # eigh to its worst case inside this scan
        _, evecs = eigh3x3_desc(C)
        return evecs[:, 2], None

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


@partial(jax.jit, static_argnames=("num_views", "admm_iters"))
def estimate_positions_lud(
    num_views: int,
    edges: jnp.ndarray,        # [E, 2] int32
    w_dir: jnp.ndarray,        # [E, 3] unit world directions p_i - p_j
    edge_mask: jnp.ndarray,    # [E] 1.0 valid / 0.0 padded
    triplets: TripletConstraints | None = None,
    admm_iters: int = 2000,
    rho: float = 1.0,
):
    """Camera positions [V, 3] (view 0 at origin) + per-edge scales [E].

    Solves the constrained L1 program exactly as the reference does — ADMM in
    the style of theia::ConstrainedL1Solver (max 400 iterations,
    least_unsquared_deviation_position_estimator.cc:160-177):

        min ||A z||_1   s.t.  s >= 1,   z = (p, s)

    with splitting y1 = A z (soft-thresholded) and y2 = s (projected to >= 1).
    The z-update matrix (A^T A + G^T G) is assembled once by vmapping the
    gather/segment-sum operator over basis vectors and Cholesky-factored once;
    each iteration is then shrinkage + projection + one triangular solve — all
    tiny dense ops on device. The s >= 1 constraint is what removes the
    trivial-solution null direction (p = 0, s = 0) of the homogeneous rows;
    unconstrained or post-hoc-projected solvers drift toward that collapse.
    """
    trip = triplets if triplets is not None else TripletConstraints.empty()
    V = num_views
    E = edges.shape[0]
    T = trip.edge_idx.shape[0]
    D = 3 * V + E
    i = edges[:, 0]
    j = edges[:, 1]
    em = edge_mask[:, None]
    e12, e13, e23 = trip.edge_idx[:, 0], trip.edge_idx[:, 1], trip.edge_idx[:, 2]
    b12, b13, b23 = trip.ratios[:, 0], trip.ratios[:, 1], trip.ratios[:, 2]
    tw = trip.weight
    r12 = b13 / jnp.maximum(b12, 1e-12)
    r13 = b23 / jnp.maximum(b12, 1e-12)
    r23 = b23 / jnp.maximum(b13, 1e-12)

    def pack(pv, sv):
        return jnp.concatenate([pv.reshape(-1), sv])

    def unpack(z):
        return z[: 3 * V].reshape(V, 3), z[3 * V :]

    def A_apply(z):
        pv, sv = unpack(z)
        pv = pv.at[0].set(0.0)                       # gauge: p0 pinned
        r_pair = (pv[i] - pv[j] - sv[:, None] * w_dir) * em
        rA = tw * (r12 * sv[e12] - sv[e13])
        rB = tw * (r13 * sv[e12] - sv[e23])
        rC = tw * (r23 * sv[e13] - sv[e23])
        return r_pair, jnp.stack([rA, rB, rC], axis=-1)

    def At_apply(y_pair, y_trip):
        y_pair = y_pair * em
        pv = jnp.zeros((V, 3), w_dir.dtype)
        pv = pv.at[i].add(y_pair)
        pv = pv.at[j].add(-y_pair)
        pv = pv.at[0].set(0.0)
        sv = -jnp.sum(y_pair * w_dir, axis=-1)
        yA, yB, yC = y_trip[:, 0] * tw, y_trip[:, 1] * tw, y_trip[:, 2] * tw
        sv = sv.at[e12].add(r12 * yA + r13 * yB)
        sv = sv.at[e13].add(-yA + r23 * yC)
        sv = sv.at[e23].add(-yB - yC)
        return pack(pv, sv)

    # z-update matrix M = A^T A + G^T G (+ identity rows for the pinned gauge)
    def M_col(z):
        rp, rt = A_apply(z)
        col = At_apply(rp, rt)
        _, sv = unpack(z)
        return col + pack(jnp.zeros((V, 3), w_dir.dtype), sv)   # + G^T G z

    M = jax.vmap(M_col)(jnp.eye(D, dtype=w_dir.dtype))
    gauge = jnp.concatenate(
        [jnp.zeros(3, w_dir.dtype), jnp.ones(D - 3, w_dir.dtype)]
    )
    M = M * gauge[:, None] * gauge[None, :] + jnp.diag(1.0 - gauge)
    M = M + 1e-8 * jnp.eye(D, dtype=w_dir.dtype)
    cho = jax.scipy.linalg.cho_factor(M)

    kappa = 1.0 / rho
    h = jnp.ones((E,), w_dir.dtype)                 # constraint s >= 1

    # Convergence-terminated ADMM (Theia's ConstrainedL1Solver stops on
    # primal/dual residual criteria, least_unsquared_deviation_position_
    # estimator.cc:160-177): stop when both the primal residual ||Az - y||
    # and the dual residual rho*||A^T (y - y_prev)|| drop below an
    # absolute+relative tolerance, with `admm_iters` as the hard cap.
    # Theia-scale tolerances (absolute_tolerance 1e-4, ConstrainedL1Solver);
    # positions only seed registration — BA refines them — so sub-1e-4
    # ADMM precision buys nothing downstream.
    tol_abs, tol_rel = 1e-4, 1e-4

    def body(carry):
        z, y1p, y1t, y2, u1p, u1t, u2, it, _pr, _dr, _done = carry
        # z-update: min ||[A;G]z - [y+(b=0) - u]||^2
        rhs = At_apply(y1p - u1p, y1t - u1t) + pack(
            jnp.zeros((V, 3), w_dir.dtype), y2 - u2
        )
        z = jax.scipy.linalg.cho_solve(cho, rhs * gauge)
        Ap, At_ = A_apply(z)
        _, sv = unpack(z)
        # y1: soft-threshold (L1 prox); y2: projection onto s >= 1
        v1p, v1t = Ap + u1p, At_ + u1t
        y1p_n = jnp.sign(v1p) * jnp.maximum(jnp.abs(v1p) - kappa, 0.0)
        y1t_n = jnp.sign(v1t) * jnp.maximum(jnp.abs(v1t) - kappa, 0.0)
        y2_n = jnp.maximum(sv + u2, h)
        u1p = u1p + Ap - y1p_n
        u1t = u1t + At_ - y1t_n
        u2 = u2 + sv - y2_n
        # residual norms over the stacked splitting constraints
        r_pri = jnp.sqrt(
            jnp.sum((Ap - y1p_n) ** 2) + jnp.sum((At_ - y1t_n) ** 2)
            + jnp.sum((sv - y2_n) ** 2))
        dz = At_apply(y1p_n - y1p, y1t_n - y1t) + pack(
            jnp.zeros((V, 3), w_dir.dtype), y2_n - y2)
        r_dual = rho * jnp.sqrt(jnp.sum(dz * dz))
        scale_ref = jnp.sqrt(
            jnp.sum(Ap ** 2) + jnp.sum(At_ ** 2) + jnp.sum(sv ** 2))
        tol = tol_abs * jnp.sqrt(float(3 * E + 3 * T)) + tol_rel * scale_ref
        done = (r_pri < tol) & (r_dual < tol)
        return (z, y1p_n, y1t_n, y2_n, u1p, u1t, u2, it + 1, r_pri, r_dual, done)

    def cond(carry):
        it, done = carry[7], carry[10]
        return (~done) & (it < admm_iters)

    z0 = pack(jnp.zeros((V, 3), w_dir.dtype), jnp.ones((E,), w_dir.dtype))
    zeros_p = jnp.zeros((E, 3), w_dir.dtype)
    zeros_t = jnp.zeros((T, 3), w_dir.dtype)
    init = (z0, zeros_p, zeros_t, jnp.ones((E,), w_dir.dtype), zeros_p, zeros_t,
            jnp.zeros((E,), w_dir.dtype), jnp.zeros((), jnp.int32),
            jnp.asarray(jnp.inf, w_dir.dtype), jnp.asarray(jnp.inf, w_dir.dtype),
            jnp.zeros((), bool))
    out = jax.lax.while_loop(cond, body, init)
    z, it, r_pri, r_dual = out[0], out[7], out[8], out[9]
    pv, sv = unpack(z)
    info = {"iters": it, "r_primal": r_pri, "r_dual": r_dual}
    return pv.at[0].set(0.0), sv, info
