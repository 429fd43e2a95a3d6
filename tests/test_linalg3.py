"""Closed-form small-matrix factorizations vs LAPACK references."""
import numpy as np
import jax.numpy as jnp

from particlesfm_tpu.geometry.linalg3 import eigh3x3_desc, svd3x3, smallest_eigvec_psd


def test_eigh3x3_random():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(500, 3, 3))
    A = (A + np.swapaxes(A, 1, 2)) / 2
    w, V = eigh3x3_desc(jnp.asarray(A, jnp.float32))
    w, V = np.asarray(w, np.float64), np.asarray(V, np.float64)
    recon = np.einsum("nij,nj,nkj->nik", V, w, V)
    assert np.abs(recon - A).max() < 5e-4
    assert (np.diff(w, axis=1) <= 1e-4).all()  # descending
    # orthonormal
    VtV = np.einsum("nji,njk->nik", V, V)
    assert np.abs(VtV - np.eye(3)).max() < 1e-4


def test_eigh3x3_near_rank_deficient():
    rng = np.random.default_rng(1)
    U = np.linalg.qr(rng.normal(size=(200, 3, 3)))[0]
    s = np.stack([np.ones(200), np.ones(200), 1e-7 * np.ones(200)], 1)
    A = np.einsum("nij,nj,nkj->nik", U, s, U)
    w, V = eigh3x3_desc(jnp.asarray(A, jnp.float32))
    recon = np.einsum("nij,nj,nkj->nik", np.asarray(V, np.float64), np.asarray(w, np.float64), np.asarray(V, np.float64))
    assert np.abs(recon - A).max() < 5e-4


def test_svd3x3_vs_numpy():
    rng = np.random.default_rng(2)
    E = rng.normal(size=(300, 3, 3)).astype(np.float32)
    U, s, Vt = svd3x3(jnp.asarray(E))
    U, s, Vt = map(lambda x: np.asarray(x, np.float64), (U, s, Vt))
    s_np = np.linalg.svd(E.astype(np.float64), compute_uv=False)
    assert np.abs(s - s_np).max() < 2e-3
    # reconstruction with our (possibly sign-flipped u2) must match on the
    # top-2 singular subspace, which is all essential-matrix math uses
    recon2 = np.einsum("nij,nj,njk->nik", U[:, :, :2], s[:, :2], Vt[:, :2, :])
    ref2 = E.astype(np.float64) - np.einsum(
        "nij,nj,njk->nik", U[:, :, 2:], s[:, 2:] * 0, Vt[:, 2:, :]
    )
    # compare against numpy's top-2 reconstruction
    Un, sn, Vtn = np.linalg.svd(E.astype(np.float64))
    ref = np.einsum("nij,nj,njk->nik", Un[:, :, :2], sn[:, :2], Vtn[:, :2, :])
    assert np.abs(recon2 - ref).max() < 5e-3


def test_smallest_eigvec():
    rng = np.random.default_rng(3)
    # PSD with a designated (near-)null direction, like 8-point normal matrices
    B = rng.normal(size=(200, 40, 9))
    v = rng.normal(size=(200, 9))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    P = np.eye(9) - np.einsum("ni,nj->nij", v, v)
    A = np.einsum("nki,nkj->nij", B, B)
    A = np.einsum("nij,njk,nlk->nil", P, A, P)  # exact null space along v
    x = np.asarray(smallest_eigvec_psd(jnp.asarray(A, jnp.float32)))
    dots = np.abs(np.sum(x * v, axis=1))
    assert np.median(dots) > 0.999
    assert dots.min() > 0.98
