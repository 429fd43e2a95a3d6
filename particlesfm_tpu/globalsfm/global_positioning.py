"""GLOMAP-style global positioning: joint camera-position + 3D-point solve.

The reference's best-accuracy mode shells out to `glomap mapper`
(main_global_sfm_glomap, /root/reference/sfm/main_sfm.py:161-184; README.md:23
reports 0.057 m Sintel ATE vs 0.104 m for the Theia-mode gcolmap). GLOMAP's core
(Pan et al., ECCV 2024) replaces translation averaging: with rotations fixed,
solve camera positions p_v AND points X_n jointly from bearing constraints,
using auxiliary per-observation depths d_o that make the problem bilinear:

    r_o = X_n - p_v - d_o * ray_o          (ray = world-rotated unit bearing)

TPU-native solver: IRLS block-coordinate iterations with EXACT sub-solves —
  d-step   closed form  d_o = max(<X_n - p_v, ray_o>, eps);
  (p,X)-step: points eliminate in closed form (their Hessian blocks are
  w*I_3), leaving a scalar graph-Laplacian reduced camera system [V, V]
  solved densely with 3 right-hand sides (x/y/z share the matrix);
  scale-step: the gauge direction (uniform shrink of p, X, d) is removed by
  renormalizing mean depth to 1 each iteration — same collapse-guard role as
  the s >= 1 constraint in the LUD estimator.

Everything is segment-sums + one dense [V, V] Cholesky per iteration: scales to
100k+ tracks because points never enter a matrix.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_views", "iters"))
def global_positioning(
    num_views: int,
    rays: jnp.ndarray,        # [N, K, 3] unit world-frame bearings
    fidx: jnp.ndarray,        # [N, K] int32 camera index per observation
    mask: jnp.ndarray,        # [N, K] bool
    key: jax.Array,
    iters: int = 48,
    irls_eps: float = 1e-3,
):
    """Returns (camera positions [V, 3], points [N, 3], depths [N, K])."""
    V = num_views
    N, K = fidx.shape
    m = mask.astype(rays.dtype)

    kp, kx = jax.random.split(key)
    p = jax.random.uniform(kp, (V, 3), rays.dtype, -1.0, 1.0)
    p = p.at[0].set(0.0)
    X = jax.random.uniform(kx, (N, 3), rays.dtype, -1.0, 1.0)
    d = jnp.ones((N, K), rays.dtype)


    def solve_pX(w, d):
        """Exact weighted LS over (p, X) given depths: point elimination +
        scalar Laplacian camera solve. w: [N, K] row weights.

        All accumulations are one-hot contractions (MXU matmuls) — TPU scatters
        would serialize on the [N, K, K] cross terms."""
        c = d[..., None] * rays                        # [N, K, 3]
        Wn = jnp.maximum(jnp.sum(w, axis=1), 1e-12)    # [N]
        oh = jax.nn.one_hot(fidx, V, dtype=rays.dtype)  # [N, K, V]
        A = jnp.einsum("nkv,nk->nv", oh, w)            # [N, V] per-track cam weights
        S = jnp.zeros((V, V), rays.dtype)
        S = S.at[jnp.arange(V), jnp.arange(V)].add(jnp.sum(A, axis=0))
        S = S - jnp.einsum("nv,nw->vw", A / Wn[:, None], A)
        # rhs_v = -sum_{o in v} w c + sum_{o in v} (w/Wn) sum_{o' in n} w' c'
        swc = jnp.einsum("nk,nki->ni", w, c)           # [N, 3]
        b = -jnp.einsum("nkv,nk,nki->vi", oh, w, c)
        b = b + jnp.einsum("nv,ni->vi", A / Wn[:, None], swc)
        # gauge: pin camera 0
        S = S.at[0, :].set(0.0).at[:, 0].set(0.0).at[0, 0].set(1.0)
        b = b.at[0].set(0.0)
        S = S + 1e-9 * jnp.eye(V, dtype=rays.dtype)
        p = jnp.linalg.solve(S, b)
        # back-substitute points: X_n = (sum w (p_v + c)) / Wn
        X = (jnp.einsum("nk,nki->ni", w, p[fidx] + c)) / Wn[:, None]
        return p, X

    def body(carry, _):
        p, X, d = carry
        r = X[:, None, :] - p[fidx] - d[..., None] * rays
        rn = jnp.linalg.norm(r, axis=-1)
        w = m / jnp.maximum(rn, irls_eps)              # L1-IRLS row weights
        p, X = solve_pX(w, d)
        # closed-form depth update + positivity floor
        d = jnp.maximum(
            jnp.einsum("nki,nki->nk", X[:, None, :] - p[fidx], rays), 1e-4
        )
        # scale gauge: mean valid depth = 1 (collapse guard)
        s = jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)
        s = jnp.where(s < 1e-9, 1.0, s)
        return (p / s, X / s, d / s), None

    # first pass with unit weights to leave the random init
    p, X = solve_pX(m, d)
    d = jnp.maximum(jnp.einsum("nki,nki->nk", X[:, None, :] - p[fidx], rays), 1e-4)
    s = jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)
    p, X, d = p / s, X / s, d / s
    (p, X, d), _ = jax.lax.scan(body, (p, X, d), None, length=iters)
    return p, X, d


@partial(jax.jit, static_argnames=("num_views", "iters"))
def global_positioning_joint_focal(
    num_views: int,
    a: jnp.ndarray,           # [N, K, 3] R_v^T [(u-cx), (v-cy), 0] per observation
    b: jnp.ndarray,           # [N, K, 3] R_v^T e_z per observation
    fidx: jnp.ndarray,        # [N, K] int32 camera index per observation
    mask: jnp.ndarray,        # [N, K] bool
    key: jax.Array,
    g0: float | jnp.ndarray = 1e-3,   # initial inverse focal 1/f0
    iters: int = 48,
    irls_eps: float = 1e-3,
):
    """Global positioning with a JOINT closed-form focal update (round-2 ungate
    of GLOMAP mode, VERDICT #5).

    The bearing parametrizes in inverse focal g = 1/f:

        ray_o(g) = g * a_o + b_o,   r_o = X_n - p_v - d_o * ray_o(g)

    so with (p, X, d) fixed the focal subproblem is a scalar weighted least
    squares with the exact solution

        g = sum w d a.(X - p - d b) / sum w d^2 ||a||^2 .

    Alternating it with the existing exact (p, X)- and d-steps keeps every
    subproblem optimal; the shared-focal column of the reference's BA
    (bundle_adjustment.cc refine_focal_length) is what GLOMAP itself relies on,
    but seeding BA inside its basin requires the global solve itself to bend
    focal — this is the observability fix that removes the <=100-view gate.
    Returns (positions [V, 3], points [N, 3], depths [N, K], focal = 1/g).
    """
    V = num_views
    N, K = fidx.shape
    m = mask.astype(a.dtype)
    g = jnp.asarray(g0, a.dtype)

    def solve_pX(w, d, g):
        c = d[..., None] * (g * a + b)                 # [N, K, 3]
        Wn = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
        oh = jax.nn.one_hot(fidx, V, dtype=a.dtype)
        A = jnp.einsum("nkv,nk->nv", oh, w)
        S = jnp.zeros((V, V), a.dtype)
        S = S.at[jnp.arange(V), jnp.arange(V)].add(jnp.sum(A, axis=0))
        S = S - jnp.einsum("nv,nw->vw", A / Wn[:, None], A)
        swc = jnp.einsum("nk,nki->ni", w, c)
        rhs = -jnp.einsum("nkv,nk,nki->vi", oh, w, c)
        rhs = rhs + jnp.einsum("nv,ni->vi", A / Wn[:, None], swc)
        S = S.at[0, :].set(0.0).at[:, 0].set(0.0).at[0, 0].set(1.0)
        rhs = rhs.at[0].set(0.0)
        S = S + 1e-9 * jnp.eye(V, dtype=a.dtype)
        p = jnp.linalg.solve(S, rhs)
        X = (jnp.einsum("nk,nki->ni", w, p[fidx] + c)) / Wn[:, None]
        return p, X

    def body(carry, _):
        p, X, d, g = carry
        ray = g * a + b
        r = X[:, None, :] - p[fidx] - d[..., None] * ray
        rn = jnp.linalg.norm(r, axis=-1)
        w = m / jnp.maximum(rn, irls_eps)
        p, X = solve_pX(w, d, g)
        # focal step: scalar WLS over g with (p, X, d) fixed
        dpx = X[:, None, :] - p[fidx]
        num = jnp.sum(w * d * jnp.einsum("nki,nki->nk", a, dpx - d[..., None] * b))
        den = jnp.sum(w * d * d * jnp.einsum("nki,nki->nk", a, a))
        g = jnp.clip(num / jnp.maximum(den, 1e-12), 1e-5, 1.0)
        # depth step against the updated (non-unit) ray
        ray = g * a + b
        rr = jnp.einsum("nki,nki->nk", ray, ray)
        d = jnp.maximum(
            jnp.einsum("nki,nki->nk", dpx, ray) / jnp.maximum(rr, 1e-12), 1e-4
        )
        # scale gauge: mean valid depth = 1 (collapse guard; g is scale-free)
        s = jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)
        s = jnp.where(s < 1e-9, 1.0, s)
        return (p / s, X / s, d / s, g), None

    # leave the random-init basin with unit weights at the focal prior
    kp, kx = jax.random.split(key)
    p = jax.random.uniform(kp, (V, 3), a.dtype, -1.0, 1.0).at[0].set(0.0)
    X = jax.random.uniform(kx, (N, 3), a.dtype, -1.0, 1.0)
    d = jnp.ones((N, K), a.dtype)
    p, X = solve_pX(m, d, g)
    ray = g * a + b
    rr = jnp.einsum("nki,nki->nk", ray, ray)
    d = jnp.maximum(
        jnp.einsum("nki,nki->nk", X[:, None, :] - p[fidx], ray)
        / jnp.maximum(rr, 1e-12), 1e-4)
    s = jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)
    p, X, d = p / s, X / s, d / s
    (p, X, d, g), _ = jax.lax.scan(body, (p, X, d, g), None, length=iters)
    return p, X, d, 1.0 / g
