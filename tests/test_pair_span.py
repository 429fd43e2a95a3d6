"""Covisibility-pair temporal span cap (sfm.max_pair_span).

Dense tracker output keeps >=15 common tracks across 40+-frame baselines, so
`min_num_matches` alone admits the COMPLETE pair graph; wide pairs carry
overfit two-view geometry that biases rotation averaging (DESIGN.md round-5
session 2). The reference's match graph is banded by construction
(trajectory_base.cpp sample_inside_window); the cap restores that parity.
"""
import numpy as np

from particlesfm_tpu.sfm.correspondences import build_pair_tensors
from particlesfm_tpu.tracks.store import TrackArrays


def _tracks(num=200, frames=6):
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 400, (num, frames, 2)).astype(np.float32)
    mask = np.ones((num, frames), bool)
    return TrackArrays(xy=xy, mask=mask, labels=None), mask


def test_uncapped_graph_is_complete():
    tr, mask = _tracks()
    pt = build_pair_tensors(tr, mask, 15)
    assert len(pt.pairs) == 15          # C(6,2)


def test_span_cap_bands_the_graph():
    tr, mask = _tracks()
    pt = build_pair_tensors(tr, mask, 15, max_span=2)
    spans = pt.pairs[:, 1] - pt.pairs[:, 0]
    assert len(pt.pairs) == 9 and spans.max() == 2
    pt1 = build_pair_tensors(tr, mask, 15, max_span=1)
    assert len(pt1.pairs) == 5
    assert (pt1.pairs[:, 1] - pt1.pairs[:, 0]).max() == 1


def test_span_cap_composes_with_count_gate():
    tr, mask = _tracks()
    m2 = mask.copy()
    m2[:150, 3:] = False                # frames 3+ see only 50 tracks
    pt = build_pair_tensors(tr, m2, 60, max_span=2)
    assert len(pt.pairs) > 0
    assert all((b - a) <= 2 for a, b in pt.pairs)
