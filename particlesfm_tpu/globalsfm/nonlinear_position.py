"""1DSfM nonlinear position refinement (Wilson & Snavely ECCV 2014).

Counterpart of the reference's optional position method "nonlinear"
(/root/reference/sfm/gmapper/src/global/nonlinear_position_estimator.cc:140-165,
208-210): minimize the robust chordal error between estimated baseline
directions and measured world-frame pair directions,

    min_p  sum_e  rho( || (p_i - p_j)/||p_i - p_j||  -  w_e || )

solved by Levenberg-Marquardt over all positions jointly (the reference builds
one Ceres problem with PairwiseTranslationError blocks). Our version runs a
batched LM with an exact dense [3V, 3V] normal solve — edge residual Jacobians
are closed-form projections — and takes any initialization (the reference uses
random; LUD/GLOMAP output is a strictly better starting point and keeps the
estimator deterministic).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _residuals(p, edges, w_dir, scale_soft):
    d = p[edges[:, 0]] - p[edges[:, 1]]                # [E, 3]
    nrm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    u = d / jnp.maximum(nrm, 1e-9)
    r = u - w_dir
    r2 = jnp.sum(r * r, axis=-1)
    w = 1.0 / jnp.sqrt(1.0 + r2 / (scale_soft * scale_soft))   # soft-L1 IRLS
    return r, u, nrm[..., 0], w


@partial(jax.jit, static_argnames=("num_views", "max_iterations"))
def refine_positions_nonlinear(
    num_views: int,
    edges: jnp.ndarray,       # [E, 2] int32
    w_dir: jnp.ndarray,       # [E, 3] unit world directions p_i - p_j
    edge_mask: jnp.ndarray,   # [E]
    p_init: jnp.ndarray,      # [V, 3]
    max_iterations: int = 30,
    loss_scale: float = 0.1,
) -> jnp.ndarray:
    V = num_views
    i = edges[:, 0]
    j = edges[:, 1]
    em = edge_mask

    free = jnp.ones((V, 3), w_dir.dtype).at[0].set(0.0)   # pin p0 (translation)

    def cost_of(p):
        r, _, _, _ = _residuals(p, edges, w_dir, loss_scale)
        r2 = jnp.sum(r * r, axis=-1)
        s2 = loss_scale * loss_scale
        return jnp.sum(2.0 * s2 * (jnp.sqrt(1.0 + r2 / s2) - 1.0) * em)

    def lm_step(carry, _):
        p, lam = carry
        r, u, nrm, w = _residuals(p, edges, w_dir, loss_scale)
        w = w * em
        # d r / d d = (I - u u^T) / ||d||;  d d/d p_i = I, d d/d p_j = -I
        I3 = jnp.eye(3, dtype=p.dtype)
        J = (I3 - u[..., :, None] * u[..., None, :]) / jnp.maximum(
            nrm[..., None, None], 1e-9
        ) * w[..., None, None]                          # [E, 3, 3]
        rw = r * w[..., None]
        # normal equations over [3V]: per-edge block rows (+J at i, -J at j)
        JtJ = jnp.einsum("eri,erj->eij", J, J)          # [E, 3, 3]
        g = jnp.einsum("eri,er->ei", J, rw)
        H = jnp.zeros((V, V, 3, 3), p.dtype)
        H = H.at[i, i].add(JtJ).at[j, j].add(JtJ)
        H = H.at[i, j].add(-JtJ).at[j, i].add(-JtJ)
        b = jnp.zeros((V, 3), p.dtype).at[i].add(-g).at[j].add(g)
        Hf = H.transpose(0, 2, 1, 3).reshape(3 * V, 3 * V)
        Hf = Hf + lam * jnp.eye(3 * V, dtype=p.dtype)
        fvec = free.reshape(-1)
        Hf = Hf * fvec[:, None] * fvec[None, :] + jnp.diag(1.0 - fvec)
        dp = jnp.linalg.solve(Hf, b.reshape(-1) * fvec).reshape(V, 3)
        p_new = p + dp
        accept = cost_of(p_new) < cost_of(p)
        p = jnp.where(accept, p_new, p)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-10),
                        jnp.minimum(lam * 3.0, 1e6))
        return (p, lam), None

    (p, _), _ = jax.lax.scan(
        lm_step, (p_init, jnp.asarray(1e-4, w_dir.dtype)), None,
        length=max_iterations,
    )
    return p
