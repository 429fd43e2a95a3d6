"""Tests for host-side view-graph operations."""
import numpy as np
import jax.numpy as jnp

from particlesfm_tpu.geometry import rotations as rot
from particlesfm_tpu.graph import (
    covisibility_pairs,
    connected_components,
    largest_connected_component,
    maximum_spanning_tree,
    orientations_from_spanning_tree,
    extract_triplets,
    filter_pairs_by_orientation,
    mfas_position_filter,
)


def test_covisibility_pairs():
    # 3 tracks over 4 images
    mask = np.array(
        [
            [1, 1, 1, 0],
            [1, 1, 0, 0],
            [0, 1, 1, 1],
        ],
        bool,
    )
    pairs, counts = covisibility_pairs(mask, min_num_matches=2)
    got = {(int(a), int(b)): int(c) for (a, b), c in zip(pairs, counts)}
    assert got == {(0, 1): 2, (1, 2): 2}


def test_connected_components_and_largest():
    edges = np.array([[0, 1], [1, 2], [3, 4]])
    labels = connected_components(6, edges)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[5] not in (labels[0], labels[3])
    keep = largest_connected_component(6, edges)
    assert keep.tolist() == [True, True, True, False, False, False]


def test_mst_prefers_heavy_edges():
    edges = np.array([[0, 1], [1, 2], [0, 2]])
    weights = np.array([10.0, 10.0, 1.0])
    tree = maximum_spanning_tree(3, edges, weights)
    assert set(tree.tolist()) == {0, 1}


def test_orientation_chain_init():
    rng = np.random.default_rng(0)
    V = 6
    R_abs = np.stack(
        [np.asarray(rot.angle_axis_to_rotmat(jnp.asarray(rng.normal(0, 0.5, 3), jnp.float32)))
         for _ in range(V)]
    )
    edges = np.array([(i, i + 1) for i in range(V - 1)])
    rel = np.stack([R_abs[j] @ R_abs[i].T for i, j in edges])
    R0 = orientations_from_spanning_tree(V, edges, np.ones(len(edges)), rel)
    # chained rotations reproduce relative rotations exactly; gauge differs
    for (i, j), Rij in zip(edges, rel):
        pred = R0[j] @ R0[i].T
        assert np.abs(pred - Rij).max() < 1e-5


def test_extract_triplets():
    edges = np.array([[0, 1], [1, 2], [0, 2], [2, 3]])
    tris = extract_triplets(edges)
    assert tris.tolist() == [[0, 1, 2]]


def test_orientation_filter():
    rng = np.random.default_rng(1)
    V = 5
    R_abs = np.stack(
        [np.asarray(rot.angle_axis_to_rotmat(jnp.asarray(rng.normal(0, 0.4, 3), jnp.float32)))
         for _ in range(V)]
    )
    edges = np.array([(i, j) for i in range(V) for j in range(i + 1, V)])
    rel = np.stack([R_abs[j] @ R_abs[i].T for i, j in edges])
    rel[3] = np.asarray(rot.angle_axis_to_rotmat(jnp.asarray([1.0, 0.0, 0.0], jnp.float32))) @ rel[3]
    keep = filter_pairs_by_orientation(edges, rel, R_abs, max_diff_deg=10.0)
    assert not keep[3]
    assert keep.sum() == len(edges) - 1


def test_mfas_filter_flags_reversed_edge():
    # cameras on a line; one edge direction flipped should be filtered
    centers = np.stack([np.arange(6.0), np.zeros(6), np.zeros(6)], axis=1)
    edges = np.array([(i, j) for i in range(6) for j in range(i + 1, 6)])
    w = centers[edges[:, 0]] - centers[edges[:, 1]]
    w = w / np.linalg.norm(w, axis=1, keepdims=True)
    w[4] = -w[4]  # corrupt one direction
    keep = mfas_position_filter(6, edges, w, num_iterations=24, tolerance=0.1)
    assert not keep[4]
    assert keep.sum() >= len(edges) - 2
