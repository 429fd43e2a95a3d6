"""Nonlinear (1DSfM chordal) position refinement unit test."""
import numpy as np
import jax.numpy as jnp

from particlesfm_tpu.globalsfm.nonlinear_position import refine_positions_nonlinear


def test_refines_noisy_positions_toward_truth():
    rng = np.random.default_rng(0)
    V = 12
    centers = np.stack([np.linspace(0, 5, V), np.sin(np.linspace(0, 3, V)),
                        0.2 * rng.normal(size=V)], 1).astype(np.float32)
    edges = np.array([(i, j) for i in range(V) for j in range(i + 1, V)], np.int32)
    w = centers[edges[:, 0]] - centers[edges[:, 1]]
    w = w / np.linalg.norm(w, axis=1, keepdims=True)
    p0 = centers + rng.normal(0, 0.15, centers.shape).astype(np.float32)
    p0[0] = centers[0]
    p = np.asarray(refine_positions_nonlinear(
        V, jnp.asarray(edges), jnp.asarray(w, jnp.float32),
        jnp.ones(len(edges), jnp.float32), jnp.asarray(p0),
    ))
    # scale gauge: compare after optimal scaling about p0's anchor
    def err(x):
        d = x - x[0]
        g = centers - centers[0]
        s = np.sum(d * g) / max(np.sum(d * d), 1e-12)
        return np.linalg.norm(s * d - g, axis=1).mean()
    assert err(p) < 0.3 * err(p0), f"refined {err(p)} vs init {err(p0)}"
