"""SfM-stage A/B harness over cached pipeline artifacts (dev).

Reruns ONLY the SfM stage (labeled trajectories -> poses -> Sim3 ATE) on a
sequence directory produced by a previous pipeline run (trajectories_labeled/
tracks.npz + selfcal.json), so mapper changes can be iterated without paying
flow/tracking/seg. Prints one line per sequence with ATE/RPE + stage seconds.

    python scripts/sfm_ab.py --runs /tmp/acc_r4_final --gt data/acc13/gt \
        --seqs seq_00 seq_11_dyn [--sfm_type global] [--tag base]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", required=True,
                    help="root of per-seq pipeline outputs (<seq>/particlesfm_tpu)")
    ap.add_argument("--gt", default="data/acc13/gt")
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--sfm_type", default="global")
    ap.add_argument("--tag", default="ab")
    ap.add_argument("--set", dest="overrides", action="append", default=[])
    ap.add_argument("--focal", type=float, default=None,
                    help="force this focal prior (writes a synthetic "
                         "high-confidence selfcal.json) — attribution probes")
    ap.add_argument("--log", default=None, help="write mapper logs here")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from particlesfm_tpu.eval.pose_eval import (evaluate_sequence,
                                                load_pose_dir, read_sintel_cam)
    from particlesfm_tpu.pipeline.run import build_arg_parser, config_from_args
    from particlesfm_tpu.pipeline import stages
    from particlesfm_tpu.tracks.store import TrackArrays

    for seq in args.seqs:
        src = Path(args.runs) / seq / "particlesfm_tpu"
        tr_path = src / "trajectories_labeled" / "tracks.npz"
        if not tr_path.exists():
            tr_path = src / "trajectories" / "tracks.npz"
        tracks = TrackArrays.load(tr_path)
        gt_dir = Path(args.gt) / seq
        cams = sorted(gt_dir.glob("*.cam"))
        K0, _ = read_sintel_cam(cams[0])
        H, W = 436, 1024  # acc13 protocol shape

        out = Path(f"/tmp/sfm_ab_{args.tag}/{seq}")
        out.mkdir(parents=True, exist_ok=True)
        # reuse the cached flow-selfcal prior
        sc = src / "selfcal.json"
        if args.focal is not None:
            (out / "selfcal.json").write_text(json.dumps(
                {"focal": args.focal, "confidence": 0.99, "num_pairs": 99,
                 "dip": 0.1, "interior": True}))
        elif sc.exists():
            (out / "selfcal.json").write_text(sc.read_text())

        pargs = build_arg_parser().parse_args(
            ["--image_dir", "x", "--output_dir", str(out),
             "--sfm_type", args.sfm_type]
            + sum([["--set", ov] for ov in args.overrides], []))
        cfg = config_from_args(pargs)

        logf = open(args.log or (out / "mapper.log"), "a")
        t0 = time.time()

        def _log(*a):
            logf.write(f"[{time.time() - t0:7.1f}s][{seq}] " +
                       " ".join(str(x) for x in a) + "\n")
            logf.flush()

        names = [c.stem for c in cams]
        stages.sfm_stage(tracks, H, W, out, cfg, names, log=_log)
        dt = time.time() - t0

        gt = {c.stem: read_sintel_cam(c)[1] for c in cams}
        est = load_pose_dir(out / "colmap_outputs_converted/poses")
        res = evaluate_sequence(est, gt, name=seq)
        if res.failed:
            print(f"{seq} [{args.tag}]: FAILED ({res.registered} registered) "
                  f"sfm={dt:.1f}s", flush=True)
        else:
            print(f"{seq} [{args.tag}]: ATE {res.ate:.4f} RPE-t "
                  f"{res.rpe_trans:.4f} RPE-r {res.rpe_rot_deg:.3f}deg "
                  f"reg {res.registered} sfm={dt:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
