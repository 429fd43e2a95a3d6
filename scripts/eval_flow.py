"""Flow-net accuracy eval at acceptance-protocol scale.

Scores the trained compact-RAFT checkpoint against the acc13 GT flow sidecars
(stride-1 and stride-2 EPE at 1024x436) — the in-environment analog of the
reference's RAFT fork being validated on Sintel flow EPE. Run on the real TPU
(single process) or CPU with --frames limited.

    python scripts/eval_flow.py [--ckpt checkpoints/raft_synth.msgpack]
        [--data_dir data/acc13] [--seqs seq_00 seq_01_dyn] [--frames 8]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/raft_synth.msgpack")
    ap.add_argument("--data_dir", default="data/acc13")
    ap.add_argument("--seqs", nargs="*", default=None)
    ap.add_argument("--frames", type=int, default=8,
                    help="pairs sampled per sequence and stride")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="net inference resolution fraction (flow/infer.py)")
    ap.add_argument("--refine", action="store_true",
                    help="score after full-res photometric refinement")
    args = ap.parse_args(argv)

    from PIL import Image

    import particlesfm_tpu  # noqa: F401
    from particlesfm_tpu.flow.infer import load_flow_apply_batch
    from particlesfm_tpu.io import flo as flo_io

    data = Path(args.data_dir)
    seqs = args.seqs or sorted(p.name for p in (data / "seqs").iterdir())
    apply = load_flow_apply_batch(args.ckpt, iters=args.iters, scale=args.scale)
    refine = None
    if args.refine:
        import jax.numpy as jnp

        from particlesfm_tpu.flow.refine import photometric_refine_scheduled
        from particlesfm_tpu.utils.config import FlowConfig

        fcfg = FlowConfig()

        def refine(i1, i2, fl):
            return np.asarray(photometric_refine_scheduled(
                jnp.asarray(i1 / 255.0), jnp.asarray(i2 / 255.0),
                jnp.asarray(fl), schedule=fcfg.refine_schedule,
                max_total=fcfg.refine_max_total_px))

    # displacement-bucketed EPE (VERDICT r3 task 5: the stride-2 tail past the
    # trained motion range is where the round-2 net failed; buckets by GT
    # displacement magnitude expose it where sequence means hide it)
    BUCKETS = [(0, 20), (20, 40), (40, 60), (60, 85), (85, 1e9)]
    bucket_err = {s: [np.zeros(2) for _ in BUCKETS] for s in (1, 2)}
    all_epe = {1: [], 2: []}
    t0 = time.time()
    npairs = 0
    for seq in seqs:
        img_dir = data / "seqs" / seq / "images"
        imgs = sorted(img_dir.glob("*.png"))
        for stride, sub in ((1, "flow_f"), (2, "flow_f2")):
            gt_dir = data / "gt" / seq / sub
            gts = sorted(gt_dir.glob("*.flo"))
            if not gts:
                continue
            sel = np.linspace(0, len(gts) - 1, min(args.frames, len(gts))).astype(int)
            i1 = np.stack([np.asarray(Image.open(imgs[i]), np.float32) for i in sel])
            i2 = np.stack([np.asarray(Image.open(imgs[i + stride]), np.float32) for i in sel])
            gt = np.stack([flo_io.read_flo(gts[i]) for i in sel])
            pred = np.asarray(apply(i1, i2))
            if refine is not None:
                pred = refine(i1, i2, pred)
            err = np.linalg.norm(pred - gt, axis=-1)
            mag = np.linalg.norm(gt, axis=-1)
            for k, (lo, hi) in enumerate(BUCKETS):
                m = (mag >= lo) & (mag < hi)
                bucket_err[stride][k] += [err[m].sum(), m.sum()]
            epe = err.mean(axis=(1, 2))
            all_epe[stride].extend(epe.tolist())
            npairs += len(sel)
        done = {s: round(float(np.mean(v)), 3) for s, v in all_epe.items() if v}
        print(f"{seq}: cumulative EPE {done}", flush=True)
    dt = time.time() - t0
    print(f"\nmean EPE: stride-1 {np.mean(all_epe[1]):.3f} px "
          f"({len(all_epe[1])} pairs), stride-2 {np.mean(all_epe[2]):.3f} px "
          f"({len(all_epe[2])} pairs) | {npairs/dt:.1f} pairs/s incl. compile")
    for stride in (1, 2):
        parts = []
        for (lo, hi), acc in zip(BUCKETS, bucket_err[stride]):
            if acc[1] > 0:
                tag = f"{lo}-{int(hi)}" if hi < 1e9 else f">{lo}"
                parts.append(f"{tag}px: {acc[0]/acc[1]:.2f} "
                             f"({int(acc[1])/1e6:.1f}M px)")
        print(f"stride-{stride} EPE by GT displacement | " + " | ".join(parts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
