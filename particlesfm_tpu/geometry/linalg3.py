"""Closed-form small-matrix factorizations for TPU.

XLA's eigh/svd lower to iterative algorithms whose while-loops run to their
data-dependent worst case on near-singular inputs — and SfM feeds them
near-singular matrices BY DESIGN (8-point null vectors, rank-2 fundamental
matrices, essential projections). Measured on v5e: svd over 43k well-conditioned
3x3s takes 0.1 ms, the same op over 8-point outputs takes 330 ms. These
deterministic-flop replacements (trigonometric symmetric 3x3 eigendecomposition,
Cholesky inverse iteration for smallest eigenvectors) run at fixed cost
regardless of conditioning.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def eigh3x3_desc(A: jnp.ndarray):
    """Analytic symmetric 3x3 eigendecomposition, eigenvalues DESCENDING.

    A: [..., 3, 3] symmetric. Returns (w [..., 3], V [..., 3, 3]) with
    A ~= V diag(w) V^T. Deterministic flops (no iteration).
    """
    dtype = A.dtype
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=dtype)
    B = A - q[..., None, None] * I
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = detB / jnp.maximum(2.0 * p ** 3, 1e-30)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w0 = q + 2.0 * p * jnp.cos(phi)
    w2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    w1 = 3.0 * q - w0 - w2
    w = jnp.stack([w0, w1, w2], axis=-1)          # descending

    # Repeated eigenvalues are the COMMON case here (E^T E of an essential
    # matrix has s0 == s1 exactly), so: extract the eigenvector of the
    # best-separated eigenvalue from the matrix product, then diagonalize the
    # 2x2 restriction of A to its orthogonal complement in closed form.
    def sep_eigvec(wa, wb):
        """Unit eigenvector for the eigenvalue NOT in {wa, wb}."""
        M = jnp.einsum(
            "...ij,...jk->...ik", A - wa[..., None, None] * I,
            A - wb[..., None, None] * I,
        )
        norms = jnp.linalg.norm(M, axis=-2)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(M, best[..., None, None], axis=-1)[..., 0]
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return jnp.where(n > 1e-30, v / jnp.maximum(n, 1e-30),
                         jnp.broadcast_to(I[0], v.shape))

    top_separated = (w0 - w1) >= (w1 - w2)
    v_sep = jnp.where(
        top_separated[..., None],
        sep_eigvec(w1, w2),        # eigvec of w0
        sep_eigvec(w0, w1),        # eigvec of w2
    )
    # orthonormal complement basis of v_sep
    e = jnp.where(
        (jnp.abs(v_sep[..., :1]) < 0.9), jnp.broadcast_to(I[0], v_sep.shape),
        jnp.broadcast_to(I[1], v_sep.shape),
    )
    b1 = jnp.cross(v_sep, e)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-30)
    b2 = jnp.cross(v_sep, b1)
    # 2x2 restriction: [[a, b], [b, c]]
    Ab1 = jnp.einsum("...ij,...j->...i", A, b1)
    Ab2 = jnp.einsum("...ij,...j->...i", A, b2)
    a2 = jnp.sum(b1 * Ab1, -1)
    b2c = jnp.sum(b1 * Ab2, -1)
    c2 = jnp.sum(b2 * Ab2, -1)
    theta = 0.5 * jnp.arctan2(2.0 * b2c, a2 - c2)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    u_hi = ct[..., None] * b1 + st[..., None] * b2       # larger eigenvalue
    u_lo = -st[..., None] * b1 + ct[..., None] * b2
    lam_hi = a2 * ct * ct + 2 * b2c * ct * st + c2 * st * st
    lam_lo = a2 + c2 - lam_hi
    swap = lam_lo > lam_hi
    u_hi, u_lo = (
        jnp.where(swap[..., None], u_lo, u_hi),
        jnp.where(swap[..., None], u_hi, u_lo),
    )
    ts = top_separated[..., None]
    v0 = jnp.where(ts, v_sep, u_hi)
    v1 = jnp.where(ts, u_hi, u_lo)
    v2 = jnp.where(ts, u_lo, v_sep)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w, V


def svd3x3(E: jnp.ndarray):
    """SVD of arbitrary 3x3 batches via analytic eigh of E^T E.

    Returns (U, s, Vt) with s descending and U, V proper for the top-2 singular
    directions; the third left vector is u0 x u1 (adequate for essential-matrix
    work where s2 ~ 0). Deterministic flops.
    """
    AtA = jnp.einsum("...ji,...jk->...ik", E, E)
    w, V = eigh3x3_desc(AtA)
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    Ev = jnp.einsum("...ij,...jk->...ik", E, V)    # columns E v_i
    u0 = Ev[..., :, 0]
    n0 = jnp.linalg.norm(u0, axis=-1, keepdims=True)
    u0 = jnp.where(n0 > 1e-12, u0 / jnp.maximum(n0, 1e-30),
                   jnp.broadcast_to(jnp.eye(3, dtype=E.dtype)[0], u0.shape))
    u1 = Ev[..., :, 1]
    u1 = u1 - jnp.sum(u1 * u0, -1, keepdims=True) * u0
    n1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    alt = jnp.cross(u0, jnp.broadcast_to(jnp.eye(3, dtype=E.dtype)[0], u0.shape))
    altn = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(u0, jnp.broadcast_to(jnp.eye(3, dtype=E.dtype)[1], u0.shape))
    alt = jnp.where(altn > 1e-6, alt, alt2)
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-30)
    u1 = jnp.where(n1 > 1e-6, u1 / jnp.maximum(n1, 1e-30), alt)
    u2 = jnp.cross(u0, u1)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)


def smallest_eigvec_psd(A: jnp.ndarray, num_iters: int = 16) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of PSD A [..., D, D].

    Shifted Cholesky inverse iteration: deterministic flops, robust on the
    near-singular normal matrices of minimal solvers (where XLA's eigh runs to
    its iteration cap). Accuracy ~1e-3 in direction — ample for RANSAC
    hypotheses that are re-fit afterwards.
    """
    D = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    M = A + (1e-7 * tr + 1e-20) * jnp.eye(D, dtype=A.dtype)
    cho, lower = jax.scipy.linalg.cho_factor(M)
    x = jnp.ones(A.shape[:-1], A.dtype)

    def body(x, _):
        y = jax.scipy.linalg.cho_solve((cho, lower), x[..., None])[..., 0]
        return y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30), None

    x, _ = jax.lax.scan(body, x, None, length=num_iters)
    return x
