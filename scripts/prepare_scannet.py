"""ScanNet data prep — parity with /root/reference/scripts/prepare_scannet.py:13-31.

First 20 test scenes, frame stride 3, resized to 640x480, first 1500 frames;
poses copied for evaluation. Run the pipeline afterwards with
`--flow_check_thres 3.0 --assume_static` (reference README.md:142-143).

Usage: python scripts/prepare_scannet.py --scannet_root SCANS --out_dir OUT
"""
import argparse
import shutil
from pathlib import Path

import numpy as np
from PIL import Image


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scannet_root", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--num_scenes", type=int, default=20)
    ap.add_argument("--stride", type=int, default=3)
    ap.add_argument("--max_frames", type=int, default=1500)
    ap.add_argument("--size", type=int, nargs=2, default=[640, 480])
    args = ap.parse_args(argv)

    scenes = sorted(p for p in Path(args.scannet_root).iterdir() if p.is_dir())
    for scene in scenes[: args.num_scenes]:
        color = scene / "color"
        pose = scene / "pose"
        if not color.is_dir():
            continue
        frames = sorted(color.glob("*.jpg")) + sorted(color.glob("*.png"))
        frames = frames[: args.max_frames : args.stride]
        img_out = Path(args.out_dir) / scene.name / "images"
        pose_out = Path(args.out_dir) / scene.name / "pose"
        img_out.mkdir(parents=True, exist_ok=True)
        pose_out.mkdir(parents=True, exist_ok=True)
        for f in frames:
            img = Image.open(f).convert("RGB").resize(tuple(args.size), Image.BILINEAR)
            img.save(img_out / (f.stem + ".png"))
            src_pose = pose / (f.stem + ".txt")
            if src_pose.exists():
                shutil.copy(src_pose, pose_out / src_pose.name)
        print(f"{scene.name}: {len(frames)} frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
