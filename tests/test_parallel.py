"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from particlesfm_tpu.parallel import (
    make_mesh, data_sharding, shard_frames, sharded_map_frames,
)
from particlesfm_tpu.ops.flow_ops import occlusion_mask


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh(axes=("data",))


def test_mesh_and_sharding(mesh):
    assert mesh.shape["data"] == 8
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    s, n = shard_frames(x, mesh)
    assert n == 16
    assert s.sharding.spec == P("data", None)


def test_shard_frames_pads_uneven(mesh):
    x = np.arange(10, dtype=np.float32).reshape(5, 2)
    s, n = shard_frames(x, mesh)
    assert n == 5 and s.shape[0] == 8


def test_sharded_flow_check_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    T, H, W = 11, 16, 24
    ff = rng.normal(0, 2, (T, H, W, 2)).astype(np.float32)
    fb = -ff + rng.normal(0, 0.05, ff.shape).astype(np.float32)
    occ_sharded, err_sharded = sharded_map_frames(
        lambda f, b: occlusion_mask(f, b, 1.0), mesh, ff, fb
    )
    occ_ref, err_ref = jax.vmap(lambda f, b: occlusion_mask(f, b, 1.0))(
        jnp.asarray(ff), jnp.asarray(fb)
    )
    np.testing.assert_allclose(np.asarray(occ_sharded), np.asarray(occ_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(err_sharded), np.asarray(err_ref), atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 96, 2)


def test_bundle_adjust_sharded_over_mesh(mesh):
    """BA with observation tensors sharded over the data axis: GSPMD partitions
    the per-observation work and inserts the psums; result matches unsharded."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from synthetic import orbit_scene
    from particlesfm_tpu.globalsfm import bundle_adjust, triangulate_tracks
    from particlesfm_tpu.globalsfm.ba import default_free_masks
    from particlesfm_tpu.globalsfm.tracks3d import TrackObs

    sc = orbit_scene(num_views=8, num_points=64, pixel_noise=0.3, seed=7)
    rng = np.random.default_rng(0)
    N, K = 64, 8
    fidx = np.zeros((N, K), np.int32)
    uv = np.zeros((N, K, 2), np.float32)
    m = np.zeros((N, K), bool)
    for n in range(N):
        views = np.nonzero(sc["vis"][:, n])[0][:K]
        fidx[n, : len(views)] = views
        uv[n, : len(views)] = sc["uv"][views, n]
        m[n, : len(views)] = True
    q = jnp.asarray(sc["q"]); t = jnp.asarray(sc["t"]); params = jnp.asarray(sc["params"])

    def run(obs):
        X0 = triangulate_tracks(q, t, params, obs)
        st = bundle_adjust(q, t, params, X0, obs, default_free_masks(8),
                           jnp.ones(N, jnp.float32), max_iterations=5)
        return np.asarray(st.X), float(st.cost)

    obs_plain = TrackObs(jnp.asarray(fidx), jnp.asarray(uv), jnp.asarray(m))
    X_ref, cost_ref = run(obs_plain)

    sh = data_sharding(mesh, 2)
    obs_sharded = TrackObs(
        jax.device_put(jnp.asarray(fidx), sh),
        jax.device_put(jnp.asarray(uv), data_sharding(mesh, 3)),
        jax.device_put(jnp.asarray(m), sh),
    )
    X_sh, cost_sh = run(obs_sharded)
    assert abs(cost_sh - cost_ref) / max(cost_ref, 1e-9) < 1e-3
    np.testing.assert_allclose(X_sh, X_ref, atol=1e-3)


def test_shard_map_bundle_adjust_matches_plain(mesh):
    """Explicit shard_map BA (device-local point elimination + psum'd camera
    system, parallel/sharded_ba.py) matches plain bundle_adjust. N=65 also
    exercises the pad-to-device-multiple path (padded tracks contribute 0)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from synthetic import orbit_scene
    from particlesfm_tpu.globalsfm import bundle_adjust, triangulate_tracks
    from particlesfm_tpu.globalsfm.ba import default_free_masks
    from particlesfm_tpu.globalsfm.tracks3d import TrackObs
    from particlesfm_tpu.parallel.sharded_ba import sharded_bundle_adjust

    sc = orbit_scene(num_views=8, num_points=65, pixel_noise=0.3, seed=3)
    N, K = 65, 8
    fidx = np.zeros((N, K), np.int32)
    uv = np.zeros((N, K, 2), np.float32)
    m = np.zeros((N, K), bool)
    for n in range(N):
        views = np.nonzero(sc["vis"][:, n])[0][:K]
        fidx[n, : len(views)] = views
        uv[n, : len(views)] = sc["uv"][views, n]
        m[n, : len(views)] = True
    q = jnp.asarray(sc["q"]); t = jnp.asarray(sc["t"]); params = jnp.asarray(sc["params"])
    obs = TrackObs(jnp.asarray(fidx), jnp.asarray(uv), jnp.asarray(m))
    X0 = triangulate_tracks(q, t, params, obs)
    fm = default_free_masks(8)
    pm = jnp.ones(N, jnp.float32)

    ref = bundle_adjust(q, t, params, X0, obs, fm, pm, max_iterations=5)
    sh = sharded_bundle_adjust(mesh, q, t, params, X0, obs, fm, pm,
                               max_iterations=5)
    assert abs(float(sh.cost) - float(ref.cost)) / max(float(ref.cost), 1e-9) < 1e-3
    np.testing.assert_allclose(np.asarray(sh.q), np.asarray(ref.q), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sh.t), np.asarray(ref.t), atol=1e-3)
    assert sh.X.shape == (N, 3)
    np.testing.assert_allclose(np.asarray(sh.X), np.asarray(ref.X), atol=1e-3)
