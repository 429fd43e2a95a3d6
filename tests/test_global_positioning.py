"""Unit test: GLOMAP-style global positioning from bearings (random init)."""
import numpy as np
import jax
import jax.numpy as jnp

from particlesfm_tpu.geometry import alignment, rotations as rot
from particlesfm_tpu.globalsfm.global_positioning import global_positioning

from synthetic import orbit_scene


def test_recovers_positions_from_random_init():
    sc = orbit_scene(num_views=10, num_points=250, pixel_noise=0.3, seed=4)
    V = 10
    R = np.asarray(rot.quat_to_rotmat(jnp.asarray(sc["q"])))
    K = V
    N = 250
    fidx = np.zeros((N, K), np.int32)
    rays = np.zeros((N, K, 3), np.float32)
    mask = np.zeros((N, K), bool)
    for n in range(N):
        views = np.nonzero(sc["vis"][:, n])[0]
        for k, v in enumerate(views):
            x = (sc["uv"][v, n] - sc["params"][2:4]) / sc["focal"]
            ray = R[v].T @ np.array([x[0], x[1], 1.0])
            rays[n, k] = ray / np.linalg.norm(ray)
            fidx[n, k] = v
            mask[n, k] = True
    p, X, d = global_positioning(
        V, jnp.asarray(rays), jnp.asarray(fidx), jnp.asarray(mask),
        jax.random.PRNGKey(0),
    )
    ate = alignment.ate_rmse(np.asarray(p), sc["centers"])
    span = np.linalg.norm(sc["centers"][-1] - sc["centers"][0])
    assert ate < 0.02 * span, f"GP ATE {ate} vs span {span}"
    assert bool((np.asarray(d)[np.asarray(mask)] > 0).all())
