"""FlyingThings3D training-data prep — parity with
/root/reference/scripts/prepare_flyingthings3d.py (241 LoC):

  per 10-frame sequence: compress PFM GT flow to 16-bit PNGs (lines 105-130),
  run the greedy tracker on GT flow (132-164), pad trajectories (166-179),
  derive per-trajectory labels by majority vote of the GT motion mask at the
  trajectory points (85-103, 203-206), and produce relative depth (210-222 —
  here from the GT disparity when present, else the native depth net).

Output layout per sequence dir (consumed by motionseg.data.FlyingThingsSeqDataset):
  pt.npz ('traj' [N, L, 2]), pad_mask.npz ('mask' [N, L]), traj_label.npy [N],
  depth/*.png (16-bit), flow_png/*.png.

Usage:
  python scripts/prepare_flyingthings3d.py --ft3d_root FT3D --out_dir OUT [--max_seqs N]
"""
import argparse
import re
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def read_pfm(path):
    """Minimal PFM reader (FlyingThings3D flow/disparity format)."""
    with open(path, "rb") as f:
        header = f.readline().decode().rstrip()
        color = header == "PF"
        dims = re.match(r"^(\d+)\s(\d+)\s*$", f.readline().decode())
        w, h = int(dims.group(1)), int(dims.group(2))
        scale = float(f.readline().decode().rstrip())
        data = np.fromfile(f, "<f" if scale < 0 else ">f")
    data = data.reshape(h, w, 3 if color else 1)[::-1]
    return data


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ft3d_root", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--max_seqs", type=int, default=None)
    ap.add_argument("--sample_ratio", type=int, default=4)
    ap.add_argument("--traj_min_len", type=int, default=3)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from particlesfm_tpu.motionseg.data import find_traj_label, write_flow_png
    from particlesfm_tpu.io.images import write_depth_png16
    from particlesfm_tpu.ops.flow_ops import flow_check
    from particlesfm_tpu.tracks.engine import TrackerConfig, run_tracker
    from particlesfm_tpu.tracks.store import assemble_tracks

    root = Path(args.ft3d_root)
    # expected FlyingThings3D layout: frames_cleanpass/TRAIN/*/seq/left/*.png,
    # optical_flow/TRAIN/*/seq/into_future/left/*.pfm, motion_boundaries or
    # object masks for dynamic labels
    flow_root = root / "optical_flow"
    seq_dirs = sorted(flow_root.glob("TRAIN/*/*")) if flow_root.is_dir() else []
    if args.max_seqs:
        seq_dirs = seq_dirs[: args.max_seqs]
    if not seq_dirs:
        print(f"no sequences under {flow_root}", file=sys.stderr)
        return 1

    for seq in seq_dirs:
        fwd_dir = seq / "into_future" / "left"
        bwd_dir = seq / "into_past" / "left"
        flows_f = sorted(fwd_dir.glob("*.pfm"))
        flows_b = sorted(bwd_dir.glob("*.pfm"))
        if len(flows_f) < 3:
            continue
        ff = np.stack([read_pfm(p)[..., :2] for p in flows_f[:-1]])
        fb = np.stack([read_pfm(p)[..., :2] for p in flows_b[1:]])
        T1, H, W = ff.shape[:3]
        out = Path(args.out_dir) / seq.parent.name / seq.name
        (out / "flow_png").mkdir(parents=True, exist_ok=True)
        for i, fl in enumerate(ff):
            write_flow_png(out / "flow_png" / f"{i:04d}.png", fl)

        occ, _ = flow_check(jnp.asarray(ff), jnp.asarray(fb), 1.0)
        cfg = TrackerConfig(sample_ratio=args.sample_ratio, capacity=1 << 15,
                            path_consistency=False)
        res = run_tracker(jnp.asarray(ff), occ, None, None, cfg, H, W)
        tracks = assemble_tracks(res, min_len=args.traj_min_len)

        # pad to [N, L] over the window (already dense in our layout)
        np.savez_compressed(out / "pt.npz", traj=tracks.xy)
        np.savez_compressed(out / "pad_mask.npz", mask=tracks.mask)

        # labels: majority vote over GT dynamic masks when available, else zeros
        mask_dir = root / "motion_labels" / seq.parent.name / seq.name
        if mask_dir.is_dir():
            masks = np.stack(
                [np.asarray(Image.open(p)) > 0 for p in sorted(mask_dir.glob("*.png"))]
            ).astype(np.float32)
            labels = find_traj_label(tracks.xy, tracks.mask, masks)
        else:
            labels = np.zeros(tracks.num_tracks, np.float32)
        np.save(out / "traj_label.npy", labels)

        # relative depth from GT disparity when present (depth ~ 1/disp already
        # relative); otherwise leave to the depth net at training time
        disp_dir = root / "disparity" / seq.parent.name / seq.name / "left"
        (out / "depth").mkdir(exist_ok=True)
        if disp_dir.is_dir():
            for i, p in enumerate(sorted(disp_dir.glob("*.pfm"))[: T1 + 1]):
                disp = np.abs(read_pfm(p)[..., 0])
                rel = disp / max(disp.max(), 1e-6)
                write_depth_png16(out / "depth" / f"{i:04d}.png", rel)
        print(f"{seq}: {tracks.num_tracks} tracks")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
