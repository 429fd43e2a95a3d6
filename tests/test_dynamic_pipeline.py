"""Dynamic-scene system test: moving object -> motion seg -> clean SfM.

Trains a tiny trajectory classifier on the scene's own GT-labeled tracks (this
tests the full plumbing: training -> checkpoint -> pipeline inference -> label
merge -> dynamic-track exclusion -> SfM), then runs the complete pipeline twice
and checks that segmentation removes the moving-object tracks.
"""
import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from particlesfm_tpu.geometry import alignment, se3
from particlesfm_tpu.io import flo as flo_io
from particlesfm_tpu.io.images import write_depth_png16
from particlesfm_tpu.motionseg.data import find_traj_label
from particlesfm_tpu.pipeline.run import build_arg_parser, config_from_args, run_pipeline
from particlesfm_tpu.eval.traj_iou import trajectory_label_metrics

from flow_scenes import make_dynamic_flow_scene


@pytest.fixture(scope="module")
def dyn_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("dyn")
    sc = make_dynamic_flow_scene(num_views=8)
    T, H, W = sc["num_views"], sc["height"], sc["width"]
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    for i in range(T):
        Image.fromarray(
            rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        ).save(root / "images" / f"{i:06d}.png")
    out = root / "out"
    for name, flows in sc["flows"].items():
        flo_io.save_flow_dir(out / "optical_flows" / name, flows)
    (out / "depth").mkdir(parents=True)
    for i in range(T):
        write_depth_png16(out / "depth" / f"{i:06d}.png", np.full((H, W), 0.5, np.float32))

    # stage 1-2 only: get tracks for training the tiny classifier
    args = build_arg_parser().parse_args(
        ["--image_dir", str(root / "images"), "--output_dir", str(out),
         "--skip_sfm", "--assume_static", "--skip_exists", "--keep_intermediate", "--sample_ratio", "4"]
    )
    cfg = config_from_args(args)
    cfg.track.capacity = 1 << 13
    tracks = run_pipeline(root / "images", out, cfg, log=lambda *a: None)

    gt_labels = find_traj_label(tracks.xy, tracks.mask, sc["gt_dynamic"])

    # train a tiny classifier on these tracks (window 0..7)
    from particlesfm_tpu.models.motionseg import TrajOADepth
    from particlesfm_tpu.motionseg import create_train_state, train_step
    from flax.serialization import msgpack_serialize

    K = min(tracks.num_tracks, 512)
    sel = np.argsort(-tracks.mask.sum(1))[:K]
    traj = tracks.xy[sel] / np.array([W, H], np.float32)
    valid = tracks.mask[sel]
    batch = {
        "traj": jnp.asarray(traj, jnp.float32),
        "depth": jnp.full((1, T, H // 4, W // 4), 0.5, jnp.float32),
        "valid": jnp.asarray(valid[None]),
        "label": jnp.asarray(gt_labels[sel][None]),
        "traj_valid": jnp.ones((1, K), bool),
    }
    batch["traj"] = batch["traj"][None] if batch["traj"].ndim == 3 else batch["traj"]
    model = TrajOADepth(input_hw=(H // 4, W // 4))
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, 3e-4)
    for _ in range(120):
        state, m = train_step(model, tx, state, batch)
    assert float(m["iou"]) > 0.8, f"classifier failed to fit: IoU {float(m['iou'])}"
    ckpt = root / "seg.msgpack"
    with open(ckpt, "wb") as f:
        f.write(msgpack_serialize({
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        }))
    return root, out, sc, tracks, gt_labels, ckpt


def test_dynamic_pipeline_segments_and_reconstructs(dyn_env):
    root, out, sc, tracks, gt_labels, ckpt = dyn_env
    T, H, W = sc["num_views"], sc["height"], sc["width"]
    args = build_arg_parser().parse_args(
        ["--image_dir", str(root / "images"), "--output_dir", str(out),
         "--skip_exists", "--keep_intermediate", "--sample_ratio", "4", "--seg_ckpt", str(ckpt)]
    )
    cfg = config_from_args(args)
    cfg.track.capacity = 1 << 13
    cfg.motionseg.resolution = (H // 4, W // 4)
    rec = run_pipeline(root / "images", out, cfg, log=lambda *a: None)

    # labeled tracks written with reasonable IoU vs GT masks
    from particlesfm_tpu.tracks.store import TrackArrays
    labeled = TrackArrays.load(out / "trajectories_labeled" / "tracks.npz")
    metrics = trajectory_label_metrics(labeled, sc["gt_dynamic"])
    assert metrics["iou"] > 0.5, f"seg IoU too low: {metrics}"

    # SfM succeeded on the static part
    assert rec is not None and rec.num_registered == T
    c_est = np.asarray(se3.camera_center(jnp.asarray(rec.qvec), jnp.asarray(rec.tvec)))
    ate = alignment.ate_rmse(c_est[rec.registered], sc["centers"][rec.registered])
    span = np.linalg.norm(sc["centers"][-1] - sc["centers"][0])
    assert ate < 0.05 * span, f"dynamic-scene ATE {ate} vs span {span}"
