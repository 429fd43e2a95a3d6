"""Native C++ host runtime: build + equivalence vs Python fallbacks."""
import numpy as np
import pytest

from particlesfm_tpu import native
from particlesfm_tpu.graph.viewgraph import _UnionFind
from particlesfm_tpu.tracks.store import TrackArrays

pytestmark = pytest.mark.skipif(
    not native.ensure_built() or not native.available(),
    reason="native toolchain unavailable",
)


def test_connected_components_equivalence():
    rng = np.random.default_rng(0)
    V, E = 200, 300
    edges = rng.integers(0, V, (E, 2)).astype(np.int32)
    fast = native.connected_components(V, edges)
    uf = _UnionFind(V)
    for a, b in edges:
        uf.union(int(a), int(b))
    slow = np.array([uf.find(i) for i in range(V)])
    # same partition (labels may differ): compare co-membership on a sample
    for _ in range(200):
        a, b = rng.integers(0, V, 2)
        assert (fast[a] == fast[b]) == (slow[a] == slow[b])


def test_mst_weight_equivalence():
    rng = np.random.default_rng(1)
    V, E = 50, 400
    edges = rng.integers(0, V, (E, 2)).astype(np.int32)
    keep = edges[:, 0] != edges[:, 1]
    edges = edges[keep]
    w = rng.random(len(edges))
    fast = native.maximum_spanning_tree(V, edges, w)
    # spanning forest of max total weight is unique given distinct weights
    from particlesfm_tpu.graph.viewgraph import maximum_spanning_tree as py_mst
    # call the python branch directly by monkeypatching native off
    order = np.argsort(-w)
    uf = _UnionFind(V)
    chosen = []
    for idx in order:
        a, b = int(edges[idx, 0]), int(edges[idx, 1])
        if uf.find(a) != uf.find(b):
            uf.union(a, b)
            chosen.append(idx)
    assert sorted(fast.tolist()) == sorted(chosen)


def test_mfas_equivalence_on_line_graph():
    # simple consistent line: order must be the identity ordering
    V = 8
    edges = np.array([(i, j) for i in range(V) for j in range(i + 1, V)], np.int32)
    proj = np.array([-(j - i) for i, j in edges], np.float64)  # i->j negative => j before i?
    # positive proj means edge directed edges[:,0] -> edges[:,1]
    proj = -proj  # make all positive: i -> j
    order = native.mfas_order(V, edges, proj)
    assert (np.diff(order) > 0).all()


def test_build_observations_equivalence():
    rng = np.random.default_rng(2)
    N, T, K = 100, 30, 8
    xy = rng.uniform(0, 100, (N, T, 2)).astype(np.float32)
    mask = rng.random((N, T)) < 0.4
    fi, uv, om, rows = native.build_observations(mask, xy, 3, K)
    lengths = mask.sum(1)
    assert (lengths[rows] >= 3).all()
    assert len(rows) == (lengths >= 3).sum()
    for a in range(min(20, len(rows))):
        n = rows[a]
        t = np.nonzero(mask[n])[0]
        got = fi[a][om[a]]
        assert set(got).issubset(set(t))
        np.testing.assert_allclose(uv[a][om[a]], xy[n, got], atol=1e-6)


def test_covisibility_equivalence():
    rng = np.random.default_rng(3)
    N, T = 200, 12
    mask = rng.random((N, T)) < 0.5
    fast = native.covisibility(mask)
    m = mask.astype(np.int32)
    slow = np.triu(m.T @ m, k=1)
    np.testing.assert_array_equal(np.triu(fast, 1), slow)


def test_build_pair_tensors_native_equivalence():
    """C++ fast path == Python fallback for pair-tensor construction."""
    from particlesfm_tpu import native
    from particlesfm_tpu.sfm.correspondences import build_pair_tensors
    from particlesfm_tpu.tracks.store import TrackArrays

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    N, T = 4000, 12
    mask = rng.uniform(size=(N, T)) < 0.4
    xy = rng.uniform(0, 100, (N, T, 2)).astype(np.float32)
    tracks = TrackArrays(xy=xy, mask=mask)
    got = build_pair_tensors(tracks, mask.copy(), min_num_matches=5,
                             max_matches_per_pair=64)

    # python fallback path (force native off)
    import unittest.mock as mock

    with mock.patch.object(native, "build_pair_tensors", lambda *a: None):
        exp = build_pair_tensors(tracks, mask.copy(), min_num_matches=5,
                                 max_matches_per_pair=64)
    np.testing.assert_array_equal(got.pairs, exp.pairs)
    np.testing.assert_array_equal(got.counts, exp.counts)
    np.testing.assert_array_equal(got.mask, exp.mask)
    np.testing.assert_array_equal(got.track_idx, exp.track_idx)
    np.testing.assert_allclose(got.uv1, exp.uv1)
    np.testing.assert_allclose(got.uv2, exp.uv2)
