"""Linear (spectral) position estimation from triplet baseline ratios.

Counterpart of the reference's optional method "linear"
(/root/reference/sfm/gmapper/src/global/linear_position_estimator.{h,cc} —
Jiang et al., "A Global Linear Method for Camera Pose Registration", ICCV 2013):
within a triplet (i, j, k) with known world-frame pair directions u = w_ij,
v = w_ik, w = w_jk and triangulated baseline ratios r_ik = b_ik / b_ij,
r_jk = b_jk / b_ij, the unknown common scale lambda = u^T (p_i - p_j) cancels:

    (p_i - p_k) - r_ik * v u^T (p_i - p_j) = 0
    (p_j - p_k) - r_jk * w u^T (p_i - p_j) = 0

(all directions here follow this codebase's convention w_e ~ p_first - p_second).
Stacking the homogeneous rows, positions are the smallest eigenvector of A^T A
restricted to the centered subspace (translation nullspace projected out) —
the reference solves the same eigenproblem with Spectra's shift-invert
(linear_position_estimator.cc:188-199); at our scale a dense eigh is exact and
instant. Sign is fixed by majority agreement with the pair directions.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .translation import TripletConstraints


@partial(jax.jit, static_argnames=("num_views",))
def estimate_positions_linear(
    num_views: int,
    edges: jnp.ndarray,        # [E, 2] int32 (i, j), direction w ~ p_i - p_j
    w_dir: jnp.ndarray,        # [E, 3]
    triplet_views: jnp.ndarray,   # [T, 3] int32 (i, j, k)
    trip: TripletConstraints,     # edge_idx (ij, ik, jk) + ratios + weights
) -> jnp.ndarray:
    """Returns positions [V, 3] (centered, unit scale, sign-corrected)."""
    V = num_views
    i = triplet_views[:, 0]
    j = triplet_views[:, 1]
    k = triplet_views[:, 2]
    u = w_dir[trip.edge_idx[:, 0]]                 # w_ij ~ p_i - p_j
    v = w_dir[trip.edge_idx[:, 1]]                 # w_ik ~ p_i - p_k
    w = w_dir[trip.edge_idx[:, 2]]                 # w_jk ~ p_j - p_k
    b12, b13, b23 = trip.ratios[:, 0], trip.ratios[:, 1], trip.ratios[:, 2]
    r_ik = b13 / jnp.maximum(b12, 1e-12)
    r_jk = b23 / jnp.maximum(b12, 1e-12)
    tw = jnp.sqrt(jnp.maximum(trip.weight, 0.0))

    I3 = jnp.eye(3, dtype=w_dir.dtype)
    # row blocks (3 rows each): C_a p_a + C_b p_b + C_c p_c = 0
    # row set A over (i, j, k):  (p_i - p_k) - r_ik v u^T (p_i - p_j)
    M_A = r_ik[:, None, None] * v[:, :, None] * u[:, None, :]   # [T, 3, 3]
    A_i = (I3 - M_A) * tw[:, None, None]
    A_j = M_A * tw[:, None, None]
    A_k = -I3 * tw[:, None, None]
    # row set B over (i, j, k):  (p_j - p_k) - r_jk w u^T (p_i - p_j)
    M_B = r_jk[:, None, None] * w[:, :, None] * u[:, None, :]
    B_i = -M_B * tw[:, None, None]
    B_j = (I3 + M_B) * tw[:, None, None]
    B_k = -I3 * tw[:, None, None]

    # accumulate A^T A over [V, V] 3x3 blocks via one-hot contractions
    oh_i = jax.nn.one_hot(i, V, dtype=w_dir.dtype)
    oh_j = jax.nn.one_hot(j, V, dtype=w_dir.dtype)
    oh_k = jax.nn.one_hot(k, V, dtype=w_dir.dtype)

    def acc(blocks_onehots):
        H = jnp.zeros((V, V, 3, 3), w_dir.dtype)
        for Ca, oa in blocks_onehots:
            for Cb, ob in blocks_onehots:
                contrib = jnp.einsum("tri,trj->tij", Ca, Cb)   # [T, 3, 3]
                H = H + jnp.einsum("tv,tw,tij->vwij", oa, ob, contrib)
        return H

    H = acc([(A_i, oh_i), (A_j, oh_j), (A_k, oh_k)])
    H = H + acc([(B_i, oh_i), (B_j, oh_j), (B_k, oh_k)])
    Hf = H.transpose(0, 2, 1, 3).reshape(3 * V, 3 * V)

    # project out the 3-dim uniform-translation nullspace: T = (1_V (x) I3)/sqrt(V)
    ones = jnp.ones((V, 1, 1), w_dir.dtype)
    Tn = (ones * I3).reshape(3 * V, 3) / jnp.sqrt(jnp.asarray(V, w_dir.dtype))
    P = jnp.eye(3 * V, dtype=w_dir.dtype) - Tn @ Tn.T
    big = jnp.trace(Hf) + 1.0
    Hp = P @ Hf @ P + big * (Tn @ Tn.T)
    evals, evecs = jnp.linalg.eigh(Hp)
    p = evecs[:, 0].reshape(V, 3)
    # sign: majority agreement with the measured pair directions
    d = p[edges[:, 0]] - p[edges[:, 1]]
    agree = jnp.sum(jnp.sum(d * w_dir, axis=-1))
    p = jnp.where(agree < 0, -p, p)
    p = p - p[0]
    scale = jnp.median(jnp.linalg.norm(p[1:], axis=-1))
    return p / jnp.where(scale < 1e-12, 1.0, scale)
