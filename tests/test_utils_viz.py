"""Utility coverage: profiling, timers, visualization CLIs."""
import numpy as np
from pathlib import Path

from particlesfm_tpu.utils.profiling import StageTimer, trace
from particlesfm_tpu.motionseg.visualize import draw_overlay, write_overlay_video
from particlesfm_tpu.tracks.store import TrackArrays


def test_stage_timer_report():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "x2" in rep and "TOTAL" in rep


def test_trace_noop():
    with trace(None):
        pass  # no-op path


def test_overlay_video(tmp_path):
    rng = np.random.default_rng(0)
    T, H, W = 3, 32, 48
    images = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
    xy = rng.uniform(0, [W - 1, H - 1], (10, T, 2)).astype(np.float32)
    mask = np.ones((10, T), bool)
    labels = (rng.random((10, T)) < 0.5).astype(np.int8)
    tracks = TrackArrays(xy=xy, mask=mask, labels=labels)
    write_overlay_video(tmp_path, images, tracks)
    assert (tmp_path / "motion_seg.gif").exists()
    assert (tmp_path / "motion_seg.avi").exists()
    assert len(list(tmp_path.glob("overlay_*.png"))) == T


def test_mjpeg_avi_roundtrip(tmp_path):
    from particlesfm_tpu.io.avi import read_mjpeg_avi_frames, write_mjpeg_avi

    rng = np.random.default_rng(3)
    # constant-color frames so JPEG lossiness stays tiny
    frames = [np.full((24, 32, 3), c, np.uint8) for c in (10, 120, 230)]
    path = tmp_path / "clip.avi"
    write_mjpeg_avi(path, frames, fps=5)
    data = path.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert len(data) == 8 + int.from_bytes(data[4:8], "little")
    back = read_mjpeg_avi_frames(path)
    assert len(back) == 3
    for orig, dec in zip(frames, back):
        assert dec.shape == orig.shape
        assert np.max(np.abs(dec.astype(int) - orig.astype(int))) <= 4


def test_reconstruction_viewer_cli(tmp_path):
    # build a tiny model via the exporter, then run the viewer CLI on it
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from synthetic import orbit_scene
    from particlesfm_tpu.sfm import run_global_mapper, write_colmap_model
    from particlesfm_tpu.sfm.visualize import main as viz_main
    from particlesfm_tpu.utils.config import SfmConfig

    sc = orbit_scene(num_views=6, num_points=80, pixel_noise=0.2, seed=11)
    rec = run_global_mapper(sc["tracks"], sc["height"], sc["width"], SfmConfig(),
                            log=lambda *a: None)
    write_colmap_model(rec, tmp_path / "model")
    rc = viz_main(["-i", str(tmp_path / "model"), "-o", str(tmp_path / "out.ply"),
                   "-w", str(tmp_path / "out.html")])
    assert rc == 0
    txt = (tmp_path / "out.ply").read_text()
    assert txt.startswith("ply") and "end_header" in txt
    html = (tmp_path / "out.html").read_text()
    assert html.startswith("<!DOCTYPE html>") and "__POS_B64__" not in html
    # cameras made it into the embedded metadata
    assert '"num_cameras": 6' in html


def test_ply_nvm_bundler_vrml_exports(tmp_path):
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from synthetic import orbit_scene
    from particlesfm_tpu.sfm import run_global_mapper
    from particlesfm_tpu.sfm.export import write_nvm, write_bundler, write_vrml
    from particlesfm_tpu.sfm.colors import write_ply, extract_point_colors
    from particlesfm_tpu.utils.config import SfmConfig

    sc = orbit_scene(num_views=6, num_points=80, pixel_noise=0.2, seed=12)
    rec = run_global_mapper(sc["tracks"], sc["height"], sc["width"], SfmConfig(),
                            log=lambda *a: None)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (6, sc["height"], sc["width"], 3), dtype=np.uint8)
    colors = extract_point_colors(rec, imgs)
    write_ply(tmp_path / "m.ply", rec, colors)
    write_nvm(tmp_path / "m.nvm", rec)
    write_bundler(tmp_path / "m.out", rec)
    write_vrml(tmp_path / "m.wrl", rec, colors)
    assert (tmp_path / "m.ply").read_text().startswith("ply")
    assert (tmp_path / "m.nvm").read_text().startswith("NVM_V3")
    assert (tmp_path / "m.out").read_text().startswith("# Bundle")
    assert (tmp_path / "m.wrl").read_text().startswith("#VRML")
