"""Two-model motion clustering (sfm/correspondences.two_model_motion_clustering).

Reference has no counterpart (it relies entirely on the trained segmentation
net); this is the geometry-only defense for the slow-large-object blended-
geometry case (DESIGN.md known hard case). The tests drive the clustering with
synthetic per-pair model memberships mirroring what sequential two-model RANSAC
produces: short-baseline pairs where both populations are inliers of one blended
model (ambiguous — must cast no vote) and wide-baseline pairs where the
populations separate into models A and B.
"""
import numpy as np

from particlesfm_tpu.sfm.correspondences import PairTensors, two_model_motion_clustering


def _make_pairs(num_tracks, obs, seed=0):
    """obs: list of (member_a_row, member_b_row, track_idx_row, uv_row)."""
    E = len(obs)
    M = max(len(o[2]) for o in obs)
    mA = np.zeros((E, M), bool)
    mB = np.zeros((E, M), bool)
    ti = np.full((E, M), -1, np.int64)
    uv = np.zeros((E, M, 2), np.float32)
    mask = np.zeros((E, M), bool)
    for e, (a, b, t, xy) in enumerate(obs):
        k = len(t)
        mA[e, :k] = a
        mB[e, :k] = b
        ti[e, :k] = t
        uv[e, :k] = xy
        mask[e, :k] = True
    pair_t = PairTensors(
        pairs=np.zeros((E, 2), np.int32), counts=mask.sum(1).astype(np.int32),
        uv1=uv, uv2=uv, mask=mask, track_idx=ti)
    return pair_t, mA, mB


def _scene(num_static=12, num_dyn=6, wide_pairs=6, short_pairs=4, seed=0):
    """Static tracks spread across the frame; dynamic tracks in a compact blob.
    Wide pairs separate the populations (A=static, B=dynamic); short pairs are
    blended (everything a member of A)."""
    rng = np.random.default_rng(seed)
    n = num_static + num_dyn
    is_dyn = np.arange(n) >= num_static
    xy_static = rng.uniform(0, 400, (num_static, 2)).astype(np.float32)
    xy_dyn = (rng.uniform(0, 40, (num_dyn, 2)) + 180).astype(np.float32)
    xy = np.concatenate([xy_static, xy_dyn])
    obs = []
    t = np.arange(n)
    for _ in range(wide_pairs):
        obs.append((~is_dyn, is_dyn, t, xy))
    for _ in range(short_pairs):
        obs.append((np.ones(n, bool), np.zeros(n, bool), t, xy))
    pair_t, mA, mB = _make_pairs(n, obs, seed)
    has_b = np.array([True] * wide_pairs + [False] * short_pairs)
    verified = np.ones(len(obs), bool)
    return n, pair_t, verified, mA, mB, has_b, is_dyn


def test_separating_pairs_identify_dynamic_cluster():
    n, pair_t, ve, mA, mB, has_b, is_dyn = _scene()
    dyn = two_model_motion_clustering(n, pair_t, ve, mA, mB, has_b)
    np.testing.assert_array_equal(dyn, is_dyn)


def test_flipped_model_labels_are_realigned():
    # per-pair model identity is arbitrary: swap A/B on half the wide pairs;
    # the label-alignment step must still produce one consistent clustering
    n, pair_t, ve, mA, mB, has_b, is_dyn = _scene(wide_pairs=6)
    for e in range(0, 6, 2):
        mA[e], mB[e] = mB[e].copy(), mA[e].copy()
    dyn = two_model_motion_clustering(n, pair_t, ve, mA, mB, has_b)
    np.testing.assert_array_equal(dyn, is_dyn)


def test_blended_pairs_alone_flag_nothing():
    # only short-baseline (blended) pairs: every obs is ambiguous or A-only
    # with no B anywhere -> no votes -> nothing flagged
    n, pair_t, ve, mA, mB, has_b, is_dyn = _scene(wide_pairs=0, short_pairs=8)
    dyn = two_model_motion_clustering(n, pair_t, ve, mA, mB, has_b)
    assert not dyn.any()


def test_min_votes_threshold():
    # a single separating pair gives each dynamic track 1 vote < min_votes=3
    n, pair_t, ve, mA, mB, has_b, is_dyn = _scene(wide_pairs=1, short_pairs=6)
    dyn = two_model_motion_clustering(n, pair_t, ve, mA, mB, has_b, min_votes=3)
    assert not dyn.any()


def test_fraction_guard_rejects_implausible_clustering():
    # if the "dynamic" side won most of the scene the clustering is
    # untrustworthy -> return nothing rather than starving SfM
    n, pair_t, ve, mA, mB, has_b, is_dyn = _scene(num_static=3, num_dyn=20)
    dyn = two_model_motion_clustering(
        n, pair_t, ve, mA, mB, has_b, max_dynamic_fraction=0.5)
    assert not dyn.any()


def test_mapper_two_model_non_regression():
    """Mapper-level smoke: two_model_ransac on a dynamic scene must keep the
    reconstruction healthy (the filters may or may not fire; they must not
    break a scene the robust stages already absorb)."""
    import sys
    from pathlib import Path

    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).parent))
    from flow_scenes import make_dynamic_flow_scene

    from particlesfm_tpu.geometry import alignment, se3
    from particlesfm_tpu.ops.flow_ops import flow_check
    from particlesfm_tpu.sfm.mapper import run_global_mapper
    from particlesfm_tpu.tracks.engine import TrackerConfig, run_tracker
    from particlesfm_tpu.tracks.store import assemble_tracks
    from particlesfm_tpu.utils.config import SfmConfig

    sc = make_dynamic_flow_scene(num_views=8)
    fl = sc["flows"]
    H, W = sc["height"], sc["width"]
    occ_f = np.asarray(flow_check(jnp.asarray(fl["flow_f"]), jnp.asarray(fl["flow_b"]), 1.0)[0]).astype(np.float32)
    occ_f2 = np.asarray(flow_check(jnp.asarray(fl["flow_f2"]), jnp.asarray(fl["flow_b2"]), 1.0)[0]).astype(np.float32)
    out = run_tracker(jnp.asarray(fl["flow_f"]), jnp.asarray(occ_f),
                      jnp.asarray(fl["flow_f2"]), jnp.asarray(occ_f2),
                      TrackerConfig(sample_ratio=2, capacity=1 << 12), H, W)
    tracks = assemble_tracks(out, min_len=3)
    cfg = SfmConfig()
    cfg.two_model_ransac = True
    rec = run_global_mapper(tracks, H, W, cfg, log=lambda *a: None)
    assert rec.num_registered == sc["num_views"]
    c_est = np.asarray(se3.camera_center(jnp.asarray(rec.qvec), jnp.asarray(rec.tvec)))
    ate = alignment.ate_rmse(c_est[rec.registered], sc["centers"][rec.registered])
    span = np.linalg.norm(sc["centers"][-1] - sc["centers"][0])
    assert ate < 0.05 * span
