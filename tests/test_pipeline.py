"""End-to-end pipeline system test: GT flow -> tracker -> global SfM -> eval.

This is the full spine (minus learned models, which have no released-weight
source in this environment) exercised through the CLI orchestrator with the
reference's on-disk contracts (.flo dirs, tracks, COLMAP model).
"""
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from particlesfm_tpu.geometry import alignment, se3
from particlesfm_tpu.io import flo as flo_io
from particlesfm_tpu.pipeline.run import build_arg_parser, config_from_args, run_pipeline

from flow_scenes import make_flow_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("seq")
    sc = make_flow_scene(num_views=8)
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(sc["num_views"]):
        arr = rng.integers(0, 255, (sc["height"], sc["width"], 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.png")
    out_dir = root / "out"
    for name, flows in sc["flows"].items():
        flo_io.save_flow_dir(out_dir / "optical_flows" / name, flows)
    return root, sc


def test_full_pipeline_static(scene_dir):
    root, sc = scene_dir
    args = build_arg_parser().parse_args(
        ["--image_dir", str(root / "images"), "--output_dir", str(root / "out"),
         "--assume_static", "--skip_exists", "--keep_intermediate", "--sample_ratio", "4"]
    )
    cfg = config_from_args(args)
    cfg.track.capacity = 1 << 13
    rec = run_pipeline(root / "images", root / "out", cfg, log=lambda *a: None)

    assert rec is not None
    assert rec.num_registered == sc["num_views"]
    import jax.numpy as jnp
    c_est = np.asarray(se3.camera_center(jnp.asarray(rec.qvec), jnp.asarray(rec.tvec)))
    ate = alignment.ate_rmse(c_est[rec.registered], sc["centers"][rec.registered])
    span = np.linalg.norm(sc["centers"][-1] - sc["centers"][0])
    assert ate < 0.05 * span, f"pipeline ATE {ate} vs span {span}"

    # on-disk contracts
    assert (root / "out" / "trajectories" / "tracks.npz").exists()
    assert (root / "out" / "sfm" / "model" / "images.bin").exists()
    assert (root / "out" / "colmap_outputs_converted" / "poses").is_dir()
    assert (root / "out" / "config.json").exists()


def test_skip_exists_restart(scene_dir):
    root, sc = scene_dir
    args = build_arg_parser().parse_args(
        ["--image_dir", str(root / "images"), "--output_dir", str(root / "out"),
         "--assume_static", "--skip_exists", "--keep_intermediate", "--sample_ratio", "4"]
    )
    cfg = config_from_args(args)
    cfg.track.capacity = 1 << 13
    msgs = []
    rec = run_pipeline(root / "images", root / "out", cfg, log=lambda *a: msgs.append(" ".join(map(str, a))))
    text = "\n".join(msgs)
    assert "reusing" in text  # stages short-circuited on existing outputs


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    flow = rng.normal(0, 3, (17, 23, 2)).astype(np.float32)
    flo_io.write_flo(tmp_path / "x.flo", flow)
    back = flo_io.read_flo(tmp_path / "x.flo")
    np.testing.assert_array_equal(back, flow)


def test_synthetic_benchmark_smoke(tmp_path):
    """2-sequence run of the acceptance harness (static-only for speed)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "run_synthetic_benchmark",
        str(Path(__file__).parents[1] / "scripts" / "run_synthetic_benchmark.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main([
        "--work_dir", str(tmp_path), "--num_seqs", "2", "--frames", "8",
        "--dynamic_every", "0",
    ])
    assert rc == 0
    report = (tmp_path / "seqs" / "errors_ate.txt").read_text()
    assert "MEAN" in report and "failures 0/2" in report


def test_flow_stage_single_stream(tmp_path):
    """All four direction streams go through ONE batched raft_apply call and
    split back into per-direction .flo dirs with correct pair indexing."""
    from particlesfm_tpu.pipeline import stages
    from particlesfm_tpu.pipeline.run import build_arg_parser, config_from_args

    T, H, W = 5, 16, 24
    rng = np.random.default_rng(0)
    # integral values: the stage device-uploads frames as uint8 (PNG range)
    images = rng.integers(0, 256, (T, H, W, 3)).astype(np.float32)
    calls = []

    def fake_raft(stack, ia, ib):
        # pair-indexed contract (flow/infer.load_flow_apply_pairs): the full
        # frame stack plus per-pair frame indices
        stack = np.asarray(stack, np.float32)
        ia = np.asarray(ia)
        ib = np.asarray(ib)
        calls.append((stack[ia], stack[ib]))
        d = stack[ia].mean(axis=(1, 2, 3)) - stack[ib].mean(axis=(1, 2, 3))
        return np.tile(d[:, None, None, None], (1, H, W, 2)).astype(np.float32)

    args = build_arg_parser().parse_args(
        ["--image_dir", "x", "--output_dir", str(tmp_path)])
    cfg = config_from_args(args)
    # this test checks pair INDEXING through the fused stream: the fake net's
    # identifiable constant flows must come back verbatim, so the photometric
    # post-passes (which would rightly alter them) are off
    cfg.flow.photometric_refine = False
    cfg.flow.selfcal = False
    # .flo files are only materialized when they will outlive the run
    cfg.keep_intermediate = True
    flows = stages.flow_stage(images, tmp_path, cfg, fake_raft, log=lambda *a: None)

    assert len(calls) == 1                       # one fused stream
    assert calls[0][0].shape[0] == (T - 1) * 2 + (T - 2) * 2
    for name, stride in (("flow_f", 1), ("flow_b", -1), ("flow_f2", 2), ("flow_b2", -2)):
        npairs = T - abs(stride)
        assert flows[name].shape == (npairs, H, W, 2)
        for i in range(npairs):
            a = i if stride > 0 else i + abs(stride)
            b = i + abs(stride) if stride > 0 else i
            want = images[a].mean() - images[b].mean()
            np.testing.assert_allclose(flows[name][i, 0, 0, 0], want, rtol=1e-5)
            on_disk = flo_io.read_flo(
                tmp_path / "optical_flows" / name / f"{i:06d}.flo")
            np.testing.assert_allclose(on_disk[0, 0, 0], want, rtol=1e-5)
