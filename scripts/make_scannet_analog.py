"""Render the ScanNet-protocol-analog stress sequence (VERDICT round-3 task 8).

One LONG static indoor-style sequence at the reference's ScanNet protocol
shape — 640x480, ~500 views after stride-3 subsampling
(/root/reference/scripts/prepare_scannet.py:13-15) — from the held-out
family B corridor renderer. Exercises the V~500 paths of the global/glomap
mappers (dense [V,V] covisibility, 3Vx3V rotation tangent solves, 6Vx6V
Schur) that the 48-frame acceptance set never stresses.

Output layout matches make_acceptance_set.py so run_acceptance_benchmark.py
can consume it with --data_dir and the reference's ScanNet flags
(--assume_static --flow_check_thres 3.0, run_particlesfm.py parity).

    python scripts/make_scannet_analog.py --out data/scannet_analog \
        [--frames 500] [--workers 3]
"""
import argparse
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SPEC = dict(height=480, width=640)
NAME = "scn_00"


def _make_scene(frames: int, seed: int):
    from particlesfm_tpu.synth.family_b import random_box_scene

    rng = np.random.default_rng(3000017 * seed + 5)
    h, w = SPEC["height"], SPEC["width"]
    # ScanNet-like regime: slow handheld forward walk, moderate yaw, static
    return random_box_scene(
        rng,
        num_views=frames,
        height=h,
        width=w,
        focal=0.9 * w,            # ScanNet-ish FOV (~58 deg horizontal)
        num_dynamic=0,
        motion_scale=0.25,
        yaw_scale=0.8,
        num_boxes=26,             # long corridor needs structure throughout
    )


def render_range(args):
    lo, hi, frames, out_root, seed = args
    from PIL import Image

    from particlesfm_tpu.eval.pose_eval import write_sintel_cam

    sc = _make_scene(frames, seed)
    out = Path(out_root)
    img_dir = out / "seqs" / NAME / "images"
    gt_dir = out / "gt" / NAME
    K = sc.intrinsics_matrix()
    t0 = time.time()
    for i in range(lo, hi):
        img = sc.render(i)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            img_dir / f"{i:06d}.png")
        write_sintel_cam(gt_dir / f"{i:06d}.cam", K, sc.world_to_cam(i))
    return lo, hi, time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--workers", type=int, default=3)
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--nice", type=int, default=0)
    args = ap.parse_args(argv)

    import os

    if args.nice:
        os.nice(args.nice)
    out = Path(args.out)
    img_dir = out / "seqs" / NAME / "images"
    gt_dir = out / "gt" / NAME
    done = gt_dir / ".done"
    if done.exists():
        print("[scannet-analog] already rendered")
        return 0
    img_dir.mkdir(parents=True, exist_ok=True)
    gt_dir.mkdir(parents=True, exist_ok=True)

    # frames are independent given the (deterministic) scene: shard ranges
    n = args.frames
    k = args.workers
    bounds = [round(i * n / k) for i in range(k + 1)]
    jobs = [(bounds[i], bounds[i + 1], n, args.out, args.seed)
            for i in range(k)]
    if k > 1:
        with mp.get_context("spawn").Pool(k) as pool:
            for lo, hi, dt in pool.imap_unordered(render_range, jobs):
                print(f"[scannet-analog] frames [{lo},{hi}): {dt:.0f}s",
                      flush=True)
    else:
        for job in jobs:
            lo, hi, dt = render_range(job)
            print(f"[scannet-analog] frames [{lo},{hi}): {dt:.0f}s", flush=True)
    done.touch()
    print("[scannet-analog] done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
