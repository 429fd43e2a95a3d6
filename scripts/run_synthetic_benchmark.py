"""Synthetic multi-sequence acceptance benchmark — the in-environment analog of
the reference's Sintel-13 protocol (README.md:18-23 + evaluation_evo/eval_sintel.py).

Generates K ray-cast sequences (static and dynamic-object scenes) with ground-
truth camera files in Sintel .cam format, sweeps the full pipeline over them in
--root_dir layout, then scores with the evo-equivalent eval CLI (Sim3 ATE + RPE,
<80% registration = failure). Everything end-to-end: .flo contracts, tracking,
motion segmentation (default checkpoint), global SfM, converted outputs, eval.

Usage:
    PALLAS_AXON_POOL_IPS= python scripts/run_synthetic_benchmark.py \
        --work_dir /tmp/synthbench [--num_seqs 6] [--sfm_type glomap]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", required=True)
    ap.add_argument("--num_seqs", type=int, default=6)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--sfm_type", default="global",
                    choices=["global", "incremental", "glomap"])
    ap.add_argument("--dynamic_every", type=int, default=2,
                    help="every k-th sequence gets a moving object")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from PIL import Image

    from flow_scenes import make_flow_scene, make_dynamic_flow_scene
    from particlesfm_tpu.io import flo as flo_io
    from particlesfm_tpu.io.images import write_depth_png16
    from particlesfm_tpu.eval.pose_eval import write_sintel_cam
    from particlesfm_tpu.eval import sintel as eval_sintel
    from particlesfm_tpu.pipeline.run import build_arg_parser, config_from_args, run_pipeline

    work = Path(args.work_dir)
    gt_root = work / "gt"
    seq_root = work / "seqs"
    rng = np.random.default_rng(args.seed)
    names = []

    for s in range(args.num_seqs):
        dynamic = args.dynamic_every > 0 and (s % args.dynamic_every == 1)
        name = f"seq_{s:02d}{'_dyn' if dynamic else ''}"
        names.append(name)
        if dynamic:
            sc = make_dynamic_flow_scene(
                num_views=args.frames,
                box_size=(int(rng.integers(20, 36)), int(rng.integers(24, 44))),
                box_start=(int(rng.integers(4, 40)), int(rng.integers(20, 80))),
                box_vel=(float(rng.uniform(-4, 4)), float(rng.uniform(-2.5, 2.5))),
            )
        else:
            sc = make_flow_scene(num_views=args.frames)
        T, H, W = sc["num_views"], sc["height"], sc["width"]
        img_dir = seq_root / name / "images"
        img_dir.mkdir(parents=True, exist_ok=True)
        out = seq_root / name / "particlesfm_tpu"
        for i in range(T):
            Image.fromarray(
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            ).save(img_dir / f"{i:06d}.png")
        for fname, flows in sc["flows"].items():
            flo_io.save_flow_dir(out / "optical_flows" / fname, flows)
        (out / "depth").mkdir(parents=True, exist_ok=True)
        for i in range(T):
            write_depth_png16(out / "depth" / f"{i:06d}.png",
                              np.full((H, W), 0.5, np.float32))
        fx, fy, cx, cy = sc["K"]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        cam_dir = gt_root / name
        cam_dir.mkdir(parents=True, exist_ok=True)
        for i in range(T):
            w2c = np.concatenate([sc["R"][i], sc["t"][i][:, None]], axis=1)
            write_sintel_cam(cam_dir / f"{i:06d}.cam", K, w2c)

    pargs = build_arg_parser().parse_args(
        ["--root_dir", str(seq_root), "--image_folder", "images",
         "--skip_exists", "--keep_intermediate", "--sample_ratio", "4",
         "--sfm_type", args.sfm_type]
    )
    cfg = config_from_args(pargs)
    cfg.track.capacity = 1 << 13
    t0 = time.time()
    for name in names:
        t1 = time.time()
        run_pipeline(seq_root / name / "images",
                     seq_root / name / "particlesfm_tpu", cfg,
                     log=lambda *a: None)
        print(f"{name}: pipeline {time.time() - t1:.1f}s", flush=True)
    total = time.time() - t0
    fps = args.num_seqs * args.frames / total
    print(f"pipeline total {total:.1f}s = {fps:.2f} frames/s end-to-end", flush=True)

    return eval_sintel.main([
        "--gt_root", str(gt_root), "--pred_root", str(seq_root),
        "--seqs", *names,
        "--plot_dir", str(work / "plots"),
    ])


if __name__ == "__main__":
    raise SystemExit(main())
