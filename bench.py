"""Benchmark: global SfM throughput on a Sintel-scale synthetic sequence.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published Sintel-13 SfM runtime — gcolmap (Theia mode)
averages 3.35 min per sequence at 45.6 frames (/root/reference/README.md:22),
i.e. 0.2269 frames/s for the SfM stage (database build + global mapper on CPU;
Ceres BA threads = min(cpu, 64)). We run our global mapper on a synthetic
46-frame orbit scene with comparable track density and report frames/s on the
available accelerator (first run warms the jit caches; the timed run measures
steady-state, matching the reference's per-sequence steady state).
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS = 45.6 / (3.35 * 60.0)   # 0.2269 frames/s (README.md:22)


def make_scene(num_views=46, num_points=1500, seed=0, height=436, width=1024):
    import jax.numpy as jnp
    from particlesfm_tpu.geometry import rotations as rot, se3
    from particlesfm_tpu.tracks.store import TrackArrays

    rng = np.random.default_rng(seed)
    focal = 1100.0
    angles = np.linspace(-0.5, 0.5, num_views)
    centers = np.stack(
        [6 * np.sin(angles), 0.4 * np.sin(2 * angles), -6 * np.cos(angles)], 1
    )
    qs, ts = [], []
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 0)
        qs.append(np.asarray(rot.rotmat_to_quat(jnp.asarray(R, jnp.float32))))
        ts.append(-R @ c)
    q = np.stack(qs).astype(np.float32)
    t = np.stack(ts).astype(np.float32)
    X = rng.uniform([-2.5, -1.5, -1.5], [2.5, 1.5, 1.5], (num_points, 3)).astype(np.float32)
    x_cam = np.asarray(se3.pose_apply(q[:, None], t[:, None], X[None]))
    uv = np.stack(
        [focal * x_cam[..., 0] / x_cam[..., 2] + width / 2,
         focal * x_cam[..., 1] / x_cam[..., 2] + height / 2], -1
    ).astype(np.float32)
    uv += rng.normal(0, 0.4, uv.shape).astype(np.float32)
    vis = ((uv[..., 0] > 0) & (uv[..., 0] < width) & (uv[..., 1] > 0)
           & (uv[..., 1] < height) & (x_cam[..., 2] > 0.1))
    # emulate finite track lifetimes (reference tracks live ~5-20 frames)
    starts = rng.integers(0, num_views - 5, num_points)
    lengths = rng.integers(5, 25, num_points)
    life = (np.arange(num_views)[None, :] >= starts[:, None]) & (
        np.arange(num_views)[None, :] < (starts + lengths)[:, None]
    )
    mask = vis.T & life
    return TrackArrays(xy=np.transpose(uv, (1, 0, 2)).copy(), mask=mask), height, width, centers


def main():
    from particlesfm_tpu.sfm import run_global_mapper
    from particlesfm_tpu.utils.config import SfmConfig
    from particlesfm_tpu.geometry import alignment, se3
    import jax.numpy as jnp

    tracks, height, width, centers = make_scene()
    cfg = SfmConfig()
    silent = lambda *a: None

    # warmup: compile all jitted stages at these shapes
    run_global_mapper(tracks, height, width, cfg, log=silent)
    t0 = time.time()
    rec = run_global_mapper(tracks, height, width, cfg, log=silent)
    dt = time.time() - t0

    fps = tracks.num_frames / dt
    c_est = np.asarray(
        se3.camera_center(jnp.asarray(rec.qvec), jnp.asarray(rec.tvec))
    )
    ate = (
        alignment.ate_rmse(c_est[rec.registered], centers[rec.registered])
        if rec.num_registered >= 3 else float("inf")
    )
    print(json.dumps({
        "metric": "global_sfm_frames_per_s_46frame_synthetic",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
        "detail": {
            "seconds_per_seq": round(dt, 2),
            "registered": int(rec.num_registered),
            "ate_sim3": round(float(ate), 5),
            "reference_fps": round(REFERENCE_FPS, 4),
        },
    }))


if __name__ == "__main__":
    main()
