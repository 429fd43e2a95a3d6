"""Benchmark: end-to-end pixels-to-poses throughput at the reference's
Sintel protocol scale (1024x436, ~48 frames, ray-cast photometry, real track
counts ~1e5), plus the SfM-stage number.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published Sintel-13 SfM runtime — gcolmap (Theia
mode) averages 3.35 min per sequence at 45.6 frames
(/root/reference/README.md:22) = 0.2269 frames/s for the SfM stage ALONE
(its end-to-end rate additionally pays RAFT + MiDaS + seg GPU inference and is
strictly lower, so vs_baseline computed against the SfM-stage rate is a
conservative lower bound on the true end-to-end speedup).

The benchmark runs the COMPLETE pipeline from PNG images with the
in-environment-trained flow/depth checkpoints (no precomputed flow): flow net
(stride 1+2, fwd+bwd) -> trajectory engine + path consistency -> motion
segmentation -> global SfM -> converted poses. A warmup pass compiles every
stage (first TPU compiles through the tunnel are slow; the persistent
compilation cache at /tmp/jax_ccache is enabled so repeated runs skip them);
the timed pass measures steady state, matching the reference's per-sequence
steady state.
"""
from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

import numpy as np

REFERENCE_FPS = 45.6 / (3.35 * 60.0)   # 0.2269 frames/s (README.md:22)
ACC_DIR = Path(__file__).parent / "data" / "acc13"
BENCH_SEQ = "seq_01_dyn"               # dynamic sequence: exercises seg too


def ensure_sequence() -> tuple:
    """Return (image_dir, gt_cam_dir), rendering one protocol-scale sequence
    if the acceptance set is absent (fresh checkout)."""
    img = ACC_DIR / "seqs" / BENCH_SEQ / "images"
    gt = ACC_DIR / "gt" / BENCH_SEQ
    if img.is_dir() and len(list(img.glob("*.png"))) > 0:
        return img, gt
    import sys
    sys.path.insert(0, str(Path(__file__).parent / "scripts"))
    from make_acceptance_set import render_sequence

    render_sequence((1, str(ACC_DIR), 48, 0))
    return img, gt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from particlesfm_tpu.eval.pose_eval import (evaluate_sequence,
                                                load_pose_dir, read_sintel_cam)
    from particlesfm_tpu.pipeline.run import (build_arg_parser,
                                              config_from_args, run_pipeline)

    img_dir, gt_dir = ensure_sequence()
    nframes = len(list(img_dir.glob("*.png")))
    pargs = build_arg_parser().parse_args(
        ["--image_dir", str(img_dir), "--output_dir", "/tmp/bench_out",
         "--keep_intermediate"])
    cfg = config_from_args(pargs)
    silent = lambda *a: None

    def run_once(out):
        if Path(out).exists():
            shutil.rmtree(out)
        run_pipeline(img_dir, out, cfg, log=silent)

    run_once("/tmp/bench_out_warm")     # compile all stages at these shapes
    t0 = time.time()
    run_once("/tmp/bench_out")
    dt = time.time() - t0

    # per-stage breakdown from the timed run
    stages = {}
    tfile = Path("/tmp/bench_out/timings.txt")
    if tfile.exists():
        import re
        for line in tfile.read_text().splitlines():
            m = re.match(r"\s*(\S+)\s+([0-9.]+)s\s", line)
            if m and m.group(1) != "TOTAL":
                stages[m.group(1)] = round(float(m.group(2)), 2)

    gt = {c.stem: read_sintel_cam(c)[1] for c in sorted(gt_dir.glob("*.cam"))}
    est = load_pose_dir(Path("/tmp/bench_out/colmap_outputs_converted/poses"))
    res = evaluate_sequence(est, gt, name=BENCH_SEQ)

    e2e_fps = nframes / dt
    sfm_s = stages.get("sfm", 0.0)
    print(json.dumps({
        "metric": "end_to_end_frames_per_s_sintel_scale",
        "value": round(e2e_fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(e2e_fps / REFERENCE_FPS, 3),
        "detail": {
            "protocol": "1024x436 x %d frames, pixels-to-poses (dynamic seq)" % nframes,
            "seconds_per_seq": round(dt, 2),
            "stage_seconds": stages,
            "sfm_stage_fps": round(nframes / sfm_s, 3) if sfm_s else None,
            "sfm_stage_vs_baseline": round(nframes / sfm_s / REFERENCE_FPS, 3) if sfm_s else None,
            "registered": int(res.registered),
            "ate_sim3": round(float(res.ate), 5) if not res.failed else None,
            "rpe_trans": round(float(res.rpe_trans), 5) if not res.failed else None,
            "rpe_rot_deg": round(float(res.rpe_rot_deg), 5) if not res.failed else None,
            "reference_sfm_fps": round(REFERENCE_FPS, 4),
            "note": "vs_baseline uses the reference's published SfM-stage rate "
                    "(its unpublished end-to-end rate is strictly lower)",
        },
    }))


if __name__ == "__main__":
    main()
