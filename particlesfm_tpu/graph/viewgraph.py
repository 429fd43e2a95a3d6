"""View-graph operations: covisibility, spanning trees, components, triplets, filters.

Host-side NumPy — these are tiny irregular graph problems (the reference runs them
single-threaded in C++: orientation_util.cc, filter_util.cc, triplet_util.cc).
The heavy math they feed (rotation/position averaging, BA) runs on device.

Because our trajectory engine emits tracks natively, the correspondence graph of the
reference (/root/reference/sfm/gmapper/src/base/correspondence_graph.{h,cc}) collapses
to mask algebra over the padded track tensors: image covisibility is one matmul.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def covisibility_pairs(mask: np.ndarray, min_num_matches: int = 15) -> Tuple[np.ndarray, np.ndarray]:
    """Image pairs sharing >= min_num_matches tracks.

    mask: [N_tracks, T_images] bool observation mask. Returns (pairs [E,2] int32
    with i<j, counts [E] int32). One matmul replaces the reference's per-feature
    correspondence graph walk (correspondence_graph.h:149-155).
    """
    m = mask.astype(np.int32)
    covis = m.T @ m  # [T, T]
    iu = np.triu_indices(covis.shape[0], k=1)
    counts = covis[iu]
    keep = counts >= min_num_matches
    pairs = np.stack([iu[0][keep], iu[1][keep]], axis=1).astype(np.int32)
    return pairs, counts[keep].astype(np.int32)


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def connected_components(num_nodes: int, edges: np.ndarray) -> np.ndarray:
    """Component label per node (labels are root indices). edges: [E,2]."""
    from .. import native

    fast = native.connected_components(num_nodes, np.asarray(edges).reshape(-1, 2))
    if fast is not None:
        return fast
    uf = _UnionFind(num_nodes)
    for a, b in np.asarray(edges, np.int64):
        uf.union(int(a), int(b))
    return np.array([uf.find(i) for i in range(num_nodes)])


def largest_connected_component(num_nodes: int, edges: np.ndarray) -> np.ndarray:
    """Boolean node mask of the largest component (filter_util.cc:382-421)."""
    labels = connected_components(num_nodes, edges)
    uniq, counts = np.unique(labels, return_counts=True)
    best = uniq[np.argmax(counts)]
    return labels == best


def maximum_spanning_tree(num_nodes: int, edges: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Indices into `edges` forming a maximum-weight spanning forest (Kruskal).

    Mirrors the heap-ordered MST of orientation_util.cc:102-178 (weight =
    num_correspondences, maximized).
    """
    from .. import native

    fast = native.maximum_spanning_tree(num_nodes, edges, np.asarray(weights))
    if fast is not None:
        return fast
    order = np.argsort(-np.asarray(weights))
    uf = _UnionFind(num_nodes)
    chosen = []
    for idx in order:
        a, b = int(edges[idx, 0]), int(edges[idx, 1])
        if uf.find(a) != uf.find(b):
            uf.union(a, b)
            chosen.append(idx)
    return np.asarray(chosen, np.int64)


def orientations_from_spanning_tree(
    num_nodes: int,
    edges: np.ndarray,
    weights: np.ndarray,
    rel_rotmats: np.ndarray,
    root: int = 0,
) -> np.ndarray:
    """Initialize absolute rotations by chaining relative rotations over the MST.

    rel_rotmats[e] is R_ij for edge (i, j): x_camj = R_ij x_cami (world->cam chain
    R_j = R_ij R_i). Nodes unreachable from the root's component get identity.
    Counterpart of OrientationsFromMaximumSpanningTree (orientation_util.cc:102-178).
    """
    tree = maximum_spanning_tree(num_nodes, edges, weights)
    adj: Dict[int, List[Tuple[int, np.ndarray]]] = {i: [] for i in range(num_nodes)}
    for idx in tree:
        i, j = int(edges[idx, 0]), int(edges[idx, 1])
        Rij = rel_rotmats[idx]
        adj[i].append((j, Rij))        # R_j = R_ij @ R_i
        adj[j].append((i, Rij.T))      # R_i = R_ij^T @ R_j
    R = np.tile(np.eye(3), (num_nodes, 1, 1))
    seen = np.zeros(num_nodes, bool)
    stack = [root]
    seen[root] = True
    while stack:
        u = stack.pop()
        for v, Rrel in adj[u]:
            if not seen[v]:
                R[v] = Rrel @ R[u]
                seen[v] = True
                stack.append(v)
    return R


def extract_triplets(edges: np.ndarray) -> np.ndarray:
    """All triangles (i<j<k with all three edges present). Returns [T,3] int32.

    Counterpart of theia::TripletExtractor used at triplet_util.cc:61-140.
    """
    edges = np.asarray(edges)
    if len(edges) == 0:
        return np.zeros((0, 3), np.int32)
    nbrs: Dict[int, set] = {}
    for a, b in edges:
        nbrs.setdefault(int(a), set()).add(int(b))
        nbrs.setdefault(int(b), set()).add(int(a))
    tris = []
    eset = {(int(a), int(b)) for a, b in edges}
    for a, b in sorted(eset):
        if a > b:
            continue
        common = nbrs[a] & nbrs[b]
        for c in common:
            if c > b:
                tris.append((a, b, c))
    return np.asarray(sorted(set(tris)), np.int32).reshape(-1, 3)


def filter_pairs_by_orientation(
    edges: np.ndarray,
    rel_rotmats: np.ndarray,
    abs_rotmats: np.ndarray,
    max_diff_deg: float = 10.0,
) -> np.ndarray:
    """Keep pairs whose relative rotation agrees with the absolute estimates.

    Rule: angle(R_ij (R_j R_i^T)^T) <= tau (FilterViewPairsFromOrientation,
    filter_util.h:62-65). Returns boolean edge mask.
    """
    i = edges[:, 0]
    j = edges[:, 1]
    pred = abs_rotmats[j] @ np.swapaxes(abs_rotmats[i], -1, -2)  # R_j R_i^T
    loop = rel_rotmats @ np.swapaxes(pred, -1, -2)
    tr = np.trace(loop, axis1=-2, axis2=-1)
    ang = np.degrees(np.arccos(np.clip((tr - 1.0) * 0.5, -1.0, 1.0)))
    return ang <= max_diff_deg


def _mfas_order(num_nodes: int, edges: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """Greedy minimum-feedback-arc-set ordering (OrderTranslationsFromProjections,
    filter_util.cc:131-180). Returns order index per node."""
    from .. import native

    fast = native.mfas_order(num_nodes, edges, proj)
    if fast is not None:
        return fast.astype(np.int64)
    # direct each edge along positive projection
    a = np.where(proj > 0, edges[:, 0], edges[:, 1])
    b = np.where(proj > 0, edges[:, 1], edges[:, 0])
    w = np.abs(proj)
    nodes = set(map(int, edges.reshape(-1)))
    inw = {n: 0.0 for n in nodes}
    outw = {n: 0.0 for n in nodes}
    innb: Dict[int, Dict[int, float]] = {n: {} for n in nodes}
    outnb: Dict[int, Dict[int, float]] = {n: {} for n in nodes}
    for ai, bi, wi in zip(a, b, w):
        ai, bi, wi = int(ai), int(bi), float(wi)
        inw[bi] += wi
        outw[ai] += wi
        innb[bi][ai] = innb[bi].get(ai, 0.0) + wi
        outnb[ai][bi] = outnb[ai].get(bi, 0.0) + wi
    order = np.full(num_nodes, -1, np.int64)
    for rank in range(len(nodes)):
        best, best_score = -1, -1.0
        for n in nodes:
            if not innb[n]:
                best = n
                break
            score = (outw[n] + 1.0) / (inw[n] + 1.0)
            if score > best_score:
                best, best_score = n, score
        order[best] = rank
        for nb, wi in innb[best].items():
            outw[nb] -= wi
            outnb[nb].pop(best, None)
        for nb, wi in outnb[best].items():
            inw[nb] -= wi
            innb[nb].pop(best, None)
        nodes.remove(best)
        innb.pop(best)
        outnb.pop(best)
    return order


def mfas_position_filter(
    num_nodes: int,
    edges: np.ndarray,
    world_directions: np.ndarray,
    num_iterations: int = 48,
    tolerance: float = 0.08,
    seed: int = 100,
) -> np.ndarray:
    """1DSfM relative-translation outlier filter (Wilson & Snavely ECCV'14).

    world_directions[e]: unit direction of p_i - p_j in world frame for edge
    (i, j). Projects onto random axes, orders nodes by greedy MFAS, accumulates
    |projection| for order-inconsistent edges; keeps edges with mean bad weight
    <= tolerance (TranslationFilteringIteration, filter_util.cc:214-267).
    Returns boolean edge mask.
    """
    edges = np.asarray(edges)
    if len(edges) == 0:
        return np.zeros((0,), bool)
    rng = np.random.default_rng(seed)
    mean = world_directions.mean(axis=0)
    var = world_directions.var(axis=0, ddof=1) if len(world_directions) > 1 else np.ones(3)
    bad = np.zeros(len(edges))
    for _ in range(num_iterations):
        axis = rng.normal(mean, np.sqrt(np.maximum(var, 1e-12)))
        axis = axis / max(np.linalg.norm(axis), 1e-12)
        proj = world_directions @ axis
        order = _mfas_order(num_nodes, edges, proj)
        # edge direction: positive projection means edge points edges[:,0]->edges[:,1]
        diff = order[edges[:, 1]] - order[edges[:, 0]]
        inconsistent = ((diff < 0) & (proj > 0)) | ((diff > 0) & (proj < 0))
        bad += np.where(inconsistent, np.abs(proj), 0.0)
    return bad / num_iterations <= tolerance


def loop_consistency_filter(
    num_nodes: int,
    edges: np.ndarray,          # [E, 2] int (i, j), i < j
    R_rel: np.ndarray,          # [E, 3, 3] relative rotations (R_j R_i^T)
    max_err_deg: float = 6.0,
    min_loops: int = 2,
    max_probes: int = 8,
) -> np.ndarray:
    """Per-pair triplet loop-closure gate over the view graph.

    For each pair (i, j), compose R_kj @ R_ik over intermediate views k
    (preferring midpoints, using only sub-pairs of SHORTER span — the
    empirically reliable ones) and compare with the pair's own R_ij. A pair
    whose median loop error exceeds `max_err_deg` carries junk two-view
    geometry. Unlike gating against a single spanning-tree chain, loop
    closure is symmetric: it cannot entrench a drifted chain (measured
    round-5: the chain gate fixed one bowed scene and broke a previously
    perfect one; this filter must not trust either side a priori).

    Returns [E] bool keep mask (pairs with < min_loops testable loops are
    kept — no evidence, no verdict).
    """
    E = len(edges)
    keep = np.ones(E, bool)
    if E == 0:
        return keep
    idx = {(int(a), int(b)): e for e, (a, b) in enumerate(edges)}

    def rel(a, b):
        """R_b R_a^T from the edge list (either orientation)."""
        e = idx.get((a, b))
        if e is not None:
            return R_rel[e]
        e = idx.get((b, a))
        if e is not None:
            return R_rel[e].T
        return None

    for e in range(E):
        i, j = int(edges[e, 0]), int(edges[e, 1])
        span = abs(j - i)
        if span < 2:
            continue
        mid = (i + j) // 2
        ks = sorted(range(min(i, j) + 1, max(i, j)), key=lambda k: abs(k - mid))
        errs = []
        for k in ks[: 4 * max_probes]:
            if max(abs(k - i), abs(k - j)) >= span:
                continue
            Ra = rel(i, k)
            Rb = rel(k, j)
            if Ra is None or Rb is None:
                continue
            dR = R_rel[e] @ (Rb @ Ra).T
            errs.append(np.degrees(
                np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0))))
            if len(errs) >= max_probes:
                break
        if len(errs) >= min_loops and float(np.median(errs)) > max_err_deg:
            keep[e] = False
    return keep
