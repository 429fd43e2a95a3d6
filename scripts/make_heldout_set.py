"""Render the held-out-family evaluation set (VERDICT round-3 task 3).

6 box-world corridor sequences (synth/family_b.py) at the acceptance protocol
shape (1024x436, 48 frames), half with 1-2 moving boxes. The flow/depth/seg
nets NEVER train on this family — it differs in geometry, texture synthesis,
shading, camera regime and photometric nuisances — so scores here are the
in-environment stand-in for the reference's FlyingThings3D -> Sintel transfer
(/root/reference/motion_seg/train_seq.py -> evaluation_evo/eval_sintel.py).

Same output layout as make_acceptance_set.py, so run_acceptance_benchmark.py
consumes it via --data_dir:

    <out>/seqs/<name>/images/%06d.png
    <out>/gt/<name>/%06d.cam + flow_f/ flow_f2/ depth/ dyn/

Usage:
    python scripts/make_heldout_set.py --out data/heldb6 [--seqs 6] [--frames 48]
"""
import argparse
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SPEC = dict(height=436, width=1024)


def render_sequence(args):
    seq_idx, out_root, frames, seed = args
    from PIL import Image

    from particlesfm_tpu.io import flo as flo_io
    from particlesfm_tpu.io.images import write_depth_png16
    from particlesfm_tpu.eval.pose_eval import write_sintel_cam
    from particlesfm_tpu.synth.family_b import random_box_scene

    rng = np.random.default_rng(2000003 * seed + seq_idx)
    dynamic = seq_idx % 2 == 1
    name = f"hb_{seq_idx:02d}{'_dyn' if dynamic else ''}"
    out = Path(out_root)
    seq_dir = out / "seqs" / name
    gt_dir = out / "gt" / name
    done_marker = gt_dir / ".done"
    if done_marker.exists():
        return name, 0.0
    t0 = time.time()

    h, w = SPEC["height"], SPEC["width"]
    focal = 1.2 * w * rng.uniform(0.85, 1.15)
    sc = random_box_scene(
        rng,
        num_views=frames,
        height=h,
        width=w,
        focal=focal,
        num_dynamic=int(rng.integers(1, 3)) if dynamic else 0,
        motion_scale=float(rng.uniform(0.5, 1.1)),
        yaw_scale=float(rng.uniform(0.5, 1.5)),
        num_boxes=int(rng.integers(8, 15)),
    )

    img_dir = seq_dir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    for sub in ("flow_f", "flow_f2", "depth", "dyn"):
        (gt_dir / sub).mkdir(parents=True, exist_ok=True)

    K = sc.intrinsics_matrix()
    us, vs = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    uv_a = np.stack([us, vs], -1)
    for i in range(frames):
        pts, idx, depth, nrm = sc.hit_points(i)
        # image from the cached cast (render() would re-cast; inline its tail)
        img = np.where(
            (np.abs(pts[..., 2]) < 1e-6)[..., None],
            sc.floor_tex(pts), sc.wall_tex(pts))
        for k, bx in enumerate(sc.boxes):
            m = idx == k
            if m.any():
                img[m] = sc.box_tex[k](pts[m] - bx.lo(i))
        img = sc._shade(img, nrm)
        nrng = np.random.default_rng(sc.seed * 1009 + i)
        expo = 1.0 + sc.exposure_amp * np.sin(
            2 * np.pi * i / max(frames, 1) * 1.7 + sc.seed)
        img = img * expo + nrng.normal(0.0, sc.noise_sigma, img.shape)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            img_dir / f"{i:06d}.png")

        inv = 1.0 / np.maximum(depth, 1e-6)
        lo, hi = inv.min(), inv.max()
        write_depth_png16(gt_dir / "depth" / f"{i:06d}.png",
                          ((inv - lo) / max(hi - lo, 1e-12)).astype(np.float32))
        moving = np.array(
            [bool(np.any(bx.vel != 0)) for bx in sc.boxes] + [False])
        Image.fromarray((moving[idx] * 255).astype(np.uint8)).save(
            gt_dir / "dyn" / f"{i:06d}.png")
        write_sintel_cam(gt_dir / f"{i:06d}.cam", K, sc.world_to_cam(i))

        for stride, sub in ((1, "flow_f"), (2, "flow_f2")):
            b = i + stride
            if b >= frames:
                continue
            pts_b = pts.copy()
            for k, bx in enumerate(sc.boxes):
                m = idx == k
                if m.any():
                    pts_b[m] += stride * bx.vel
            flo_io.write_flo(gt_dir / sub / f"{i:06d}.flo",
                             (sc.project(b, pts_b) - uv_a).astype(np.float32))
    done_marker.touch()
    return name, time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seqs", type=int, default=6)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--workers", type=int, default=3)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args(argv)

    jobs = [(i, args.out, args.frames, args.seed) for i in range(args.seqs)]
    if args.workers > 1:
        with mp.get_context("spawn").Pool(args.workers) as pool:
            for name, dt in pool.imap_unordered(render_sequence, jobs):
                print(f"[heldout] {name}: {dt:.0f}s", flush=True)
    else:
        for job in jobs:
            name, dt = render_sequence(job)
            print(f"[heldout] {name}: {dt:.0f}s", flush=True)
    print("[heldout] done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
