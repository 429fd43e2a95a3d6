"""Render the Sintel-protocol-scale acceptance set (VERDICT round-2 item #2).

13 textured ray-cast sequences at 1024x436, ~48 frames each (the reference's
protocol shape: 13 sequences, 45.6 frames avg, README.md:18-23), roughly half
with 1-2 independently moving textured spheres. Every sequence ships:

    <name>/images/%06d.png          rendered frames (pipeline input — the ONLY
                                    input the pixels-to-poses run may read)
    gt/<name>/%06d.cam              Sintel-format GT camera (eval input)
    gt/<name>/flow_f/%06d.flo       GT stride-1 forward flow   (diagnostics)
    gt/<name>/flow_f2/%06d.flo      GT stride-2 forward flow   (diagnostics)
    gt/<name>/depth/%06d.png        GT inverse-depth PNG16     (diagnostics)
    gt/<name>/dyn/%06d.png          GT dynamic mask            (diagnostics)

Motion/rotation scales are drawn from the flow trainer's calibrated envelope
(flow/data.py FlowPairSpec: stride-1 flow mean ~12 px — Sintel-like), so the
in-environment-trained flow net is evaluated in-distribution, exactly as the
reference's RAFT (trained on FlyingThings) is in-distribution on Sintel.

One hit_points cast per frame is reused for the image, depth, dynamic mask and
all flow targets (flow a->b needs only cast(a) + project(b)).

Usage:
    python scripts/make_acceptance_set.py --out /tmp/acc13 [--seqs 13]
        [--frames 48] [--workers 3]
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
    from particlesfm_tpu.synth import random_scene

    rng = np.random.default_rng(1000003 * seed + seq_idx)
    # index >= 13: fast-motion extension (Sintel ambush-class camera speed —
    # stride-2 displacements reach the 60-100 px range that exposed the
    # round-3 flow net's large-motion tail, VERDICT r3 task 5)
    fast = seq_idx >= 13
    dynamic = (seq_idx % 2 == 1) and not fast
    name = f"seq_{seq_idx:02d}" + ("_fast" if fast else
                                   ("_dyn" if dynamic else ""))
    out = Path(out_root)
    seq_dir = out / "seqs" / name
    gt_dir = out / "gt" / name
    done_marker = gt_dir / ".done"
    if done_marker.exists():
        return name, 0.0
    t0 = time.time()

    h, w = SPEC["height"], SPEC["width"]
    focal = 1.2 * w * rng.uniform(0.85, 1.15)
    sc = random_scene(
        rng,
        num_views=frames,
        height=h,
        width=w,
        focal=focal,
        num_dynamic=int(rng.integers(1, 3)) if dynamic else 0,
        motion_scale=(float(rng.uniform(0.38, 0.55)) if fast
                      else float(rng.uniform(0.06, 0.20))),
        rot_scale=float(rng.uniform(0.08, 0.32)),
        # static foreground objects give the scenes Sintel-like depth contrast
        # (the near-planar surface alone leaves two-view geometry
        # ill-conditioned: rotation/translation separate only through
        # differential parallax, which scales with depth contrast)
        num_static_obj=int(rng.integers(6, 13)),
    )

    img_dir = seq_dir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    for sub in ("flow_f", "flow_f2", "depth", "dyn"):
        (gt_dir / sub).mkdir(parents=True, exist_ok=True)

    K = sc.intrinsics_matrix()
    for i in range(frames):
        pts, idx, depth = sc.hit_points(i)
        # image from the cached cast (Scene.render re-casts; inline its logic)
        img = sc.texture(pts)
        for k, sp in enumerate(sc.spheres):
            m = idx == k
            if m.any():
                img[m] = sc.sphere_textures[k](pts[m] - sp.center(i))
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            img_dir / f"{i:06d}.png")

        inv = 1.0 / np.maximum(depth, 1e-6)
        lo, hi = inv.min(), inv.max()
        write_depth_png16(gt_dir / "depth" / f"{i:06d}.png",
                          ((inv - lo) / max(hi - lo, 1e-12)).astype(np.float32))
        Image.fromarray(((idx >= 0) * 255).astype(np.uint8)).save(
            gt_dir / "dyn" / f"{i:06d}.png")
        write_sintel_cam(gt_dir / f"{i:06d}.cam", K, sc.world_to_cam(i))

        # GT flows from the same cast: move sphere hits, reproject
        us, vs = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64))
        uv_a = np.stack([us, vs], -1)
        for stride, sub in ((1, "flow_f"), (2, "flow_f2")):
            b = i + stride
            if b >= frames:
                continue
            pts_b = pts.copy()
            for k, sp in enumerate(sc.spheres):
                m = idx == k
                if m.any():
                    pts_b[m] += sp.center(b) - sp.center(i)
            flo_io.write_flo(gt_dir / sub / f"{i:06d}.flo",
                             (sc.project(b, pts_b) - uv_a).astype(np.float32))
    done_marker.touch()
    return name, time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seqs", type=int, default=13)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--workers", type=int, default=3)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)

    jobs = [(i, args.out, args.frames, args.seed) for i in range(args.seqs)]
    if args.workers > 1:
        with mp.get_context("spawn").Pool(args.workers) as pool:
            for name, dt in pool.imap_unordered(render_sequence, jobs):
                print(f"[acc] {name}: {dt:.0f}s", flush=True)
    else:
        for job in jobs:
            name, dt = render_sequence(job)
            print(f"[acc] {name}: {dt:.0f}s", flush=True)
    print("[acc] done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
