"""Two-rep protocol-scale pipeline profile on the real TPU.

Rep 0 is compile-inclusive, rep 1 is the steady-state number that matters
(CLAUDE.md: every new TPU process is compile-cold; the tunnel result-caches
identical dispatches, but pipeline reps see fresh intermediate data so their
timings are trustworthy).

    python scripts/profile_pipeline.py [--seq seq_01_dyn] [--reps 2]
"""
import argparse
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="seq_01_dyn")
    ap.add_argument("--data_dir", default="data/acc13")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/prof_out")
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from particlesfm_tpu.pipeline.run import (build_arg_parser,
                                              config_from_args, run_pipeline)

    img_dir = Path(args.data_dir) / "seqs" / args.seq / "images"
    pargs = build_arg_parser().parse_args(
        ["--image_dir", str(img_dir), "--output_dir", args.out] + args.extra)
    cfg = config_from_args(pargs)

    for rep in range(args.reps):
        if Path(args.out).exists():
            shutil.rmtree(args.out)
        t0 = time.time()
        log = lambda *a: print(f"[r{rep} {time.time() - t0:6.1f}s]", *a,
                               flush=True)
        run_pipeline(img_dir, args.out, cfg, log=log)
        print(f"rep{rep}: total {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
