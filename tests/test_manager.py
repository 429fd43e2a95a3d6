"""Multi-model reconstruction manager tests (reconstruction_manager.h parity:
split sequences produce numbered model subdirs + the largest model's bins up
top, selection by registered-image count)."""
import numpy as np

from synthetic import orbit_scene
from particlesfm_tpu.sfm.manager import (
    largest_model, run_reconstruction_manager, write_models)
from particlesfm_tpu.tracks.store import TrackArrays
from particlesfm_tpu.utils.config import SfmConfig


def _split_scene():
    """Two covisibility components: frames 0-6 see point set A, frames 7-11
    see point set B (a hard cut with a tracking dropout)."""
    sc1 = orbit_scene(num_views=7, num_points=220, seed=0)
    sc2 = orbit_scene(num_views=5, num_points=160, seed=1)
    T = 12
    xy = np.zeros((380, T, 2), np.float32)
    mask = np.zeros((380, T), bool)
    xy[:220, :7] = sc1["tracks"].xy
    mask[:220, :7] = sc1["tracks"].mask
    xy[220:, 7:] = sc2["tracks"].xy
    mask[220:, 7:] = sc2["tracks"].mask
    return TrackArrays(xy=xy, mask=mask), sc1, sc2


def test_split_sequence_two_models(tmp_path):
    tracks, sc1, sc2 = _split_scene()
    cfg = SfmConfig()
    models = run_reconstruction_manager(
        tracks, 480, 640, cfg, log=lambda *a: None
    )
    assert len(models) == 2
    sizes = sorted(m.num_registered for m in models)
    assert sizes == [5, 7]
    # no frame registered by both models
    reg = np.stack([m.registered for m in models])
    assert (reg.sum(axis=0) <= 1).all()

    best = write_models(models, tmp_path / "model", log=lambda *a: None)
    assert best.num_registered == 7
    # numbered subdirs + top-level largest copy (reference layout)
    assert (tmp_path / "model" / "0" / "images.bin").exists()
    assert (tmp_path / "model" / "1" / "images.bin").exists()
    assert (tmp_path / "model" / "images.bin").exists()
    from particlesfm_tpu.io.colmap_model import read_images_binary
    images = read_images_binary(tmp_path / "model" / "images.bin")
    assert len(images) == 7


def test_single_component_single_model():
    sc = orbit_scene(num_views=8, num_points=300, seed=3)
    models = run_reconstruction_manager(
        sc["tracks"], 480, 640, SfmConfig(), log=lambda *a: None
    )
    assert len(models) == 1
    assert models[0].num_registered == 8


def test_largest_model_selection():
    tracks, *_ = _split_scene()
    models = run_reconstruction_manager(
        tracks, 480, 640, SfmConfig(), log=lambda *a: None
    )
    best = largest_model(models)
    assert best is not None and best.num_registered == max(
        m.num_registered for m in models
    )


def test_manager_passes_labels_to_gate():
    """Labels must survive the manager's TrackArrays re-wrap: the pipeline's
    default path is the manager, and dropping labels silently disabled the
    seg-geometry gate (measured ATE 0.164 vs 0.017 at protocol scale)."""
    sc = orbit_scene(num_views=8, num_points=280, pixel_noise=0.3, seed=13)
    tracks = sc["tracks"]
    rng = np.random.default_rng(5)
    labels = np.zeros(tracks.mask.shape, np.int8)
    labels[rng.random(tracks.num_tracks) < 0.4] = 1
    noisy = TrackArrays(xy=tracks.xy, mask=tracks.mask, labels=labels)
    logs = []
    models = run_reconstruction_manager(
        noisy, sc["height"], sc["width"], SfmConfig(),
        log=lambda *a: logs.append(" ".join(map(str, a))))
    assert any("seg-geometry gate" in l for l in logs), "gate never saw labels"
    best = largest_model(models)
    assert best is not None and best.num_registered == 8
    # rescued static structure must be in the model (ungated-label behavior
    # would drop ~40% of it)
    assert best.track_valid.sum() > 0.8 * tracks.num_tracks
