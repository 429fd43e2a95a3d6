"""Tracker throughput micro-benchmark at Sintel scale (VERDICT round-2 #3).

Times run_tracker on 50 frames at 1024x436 with synthetic smooth flow:
plain tracking, path consistency with full-map LM gathers, and the
gather-free patch LM. Run on the real TPU (single process!):

    python scripts/bench_tracker.py [--frames 50]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_flows(T, H, W):
    rng = np.random.default_rng(0)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    flows = np.empty((T, H, W, 2), np.float32)
    for t in range(T):
        w = 0.002 * np.sin(0.13 * t)
        flows[t, ..., 0] = 3.0 + 40.0 * w * -(ys - H / 2) / H + rng.normal(scale=0.1)
        flows[t, ..., 1] = 1.5 + 40.0 * w * (xs - W / 2) / W + rng.normal(scale=0.1)
    occs = np.zeros((T, H, W), np.float32)
    return flows, occs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--height", type=int, default=436)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import particlesfm_tpu  # noqa: F401  (precision config)
    from particlesfm_tpu.tracks.engine import TrackerConfig, run_tracker

    T, H, W = args.frames, args.height, args.width
    flows, occs = make_flows(T, H, W)
    f1 = jax.device_put(jnp.asarray(flows))
    o1 = jax.device_put(jnp.asarray(occs))
    f2 = jax.device_put(jnp.asarray(flows[:-1] * 2.0))
    o2 = jax.device_put(jnp.asarray(occs[:-1]))

    def run(tag, **kw):
        cfg = TrackerConfig(gn_iters=args.iters, **kw)
        pc = kw.get("path_consistency", True)
        out = run_tracker(f1, o1, f2 if pc else None, o2 if pc else None,
                          cfg, H, W)
        jax.block_until_ready(out.positions)      # compile + run 1
        t0 = time.time()
        out = run_tracker(f1, o1, f2 if pc else None, o2 if pc else None,
                          cfg, H, W)
        jax.block_until_ready(out.positions)
        dt = time.time() - t0
        print(f"{tag}: {dt:.2f}s ({T / dt:.1f} frames/s), "
              f"{int(out.num_trajs)} trajs", flush=True)
        return dt

    run("plain        ", path_consistency=False)
    run("pc full-map  ", path_consistency=True, patch_lm=False)
    run("pc patch     ", path_consistency=True, patch_lm=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
