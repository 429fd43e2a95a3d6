"""Round-4 motion-seg training scenes: tracker-domain, scaled + hardened.

Extends the round-2/3 recipe (run the ACTUAL tracking engine over GT flow so
trajectories carry real slot-pool lifetime/density statistics) with the
weaknesses VERDICT round-3 called out in the shipped classifier (tracker-domain
holdout IoU 0.406, precision 0.09 at protocol scale — task 4):

  - hard negatives: parallax-heavy static structure (up to 16 near-surface
    static spheres at varied heights) that an epipolar-naive classifier
    confuses with movers;
  - hard positives: SLOW movers (velocity scaled to 0.15-1.0x of the draw)
    whose per-frame displacement sits near the static optical-flow scale —
    the "blended essential matrix" case geometry cannot fix (DESIGN.md);
  - density variety: sample_ratio in {2, 4} and capacity up to 2^15 so the
    net sees track densities spanning the inference regime instead of one
    training density;
  - all-static scenes at 25% (precision pressure: the round-3 net flagged
    35% of observations where 7.7% were dynamic).

    python scripts/train/gen_tracker_seg_scenes_r4.py SEED N_SCENES OUT_DIR

Writes OUT_DIR/scene_*.npz consumed by train_seg_tracker_domain_r4.py.
"""
import sys, time; sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[2]))
import os; os.environ["JAX_PLATFORMS"] = "cpu"; os.environ["PALLAS_AXON_POOL_IPS"] = ""
import numpy as np, jax.numpy as jnp
from pathlib import Path
from particlesfm_tpu.synth.render import random_scene
from particlesfm_tpu.ops.flow_ops import flow_check
from particlesfm_tpu.tracks.engine import TrackerConfig, run_tracker
from particlesfm_tpu.tracks.store import assemble_tracks
from particlesfm_tpu.motionseg.data import find_traj_label

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
n_scenes = int(sys.argv[2]) if len(sys.argv) > 2 else 80
out = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/trackscenes_r4")
out.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(100 + seed)
T, H, W = 10, 218, 512
t0 = time.time()
from PIL import Image

for s in range(n_scenes):
    tag = f"{seed:02d}_{s:03d}"
    fout = out / f"scene_{tag}.npz"
    if fout.exists():
        continue
    ndyn = int(rng.integers(1, 4)) if rng.random() < 0.75 else 0
    sc = random_scene(rng, num_views=T, height=H, width=W,
                      focal=1.2 * W * rng.uniform(0.85, 1.15),
                      num_dynamic=ndyn,
                      motion_scale=float(rng.uniform(0.05, 0.28)),
                      rot_scale=float(rng.uniform(0.06, 0.45)),
                      num_static_obj=int(rng.integers(4, 17)))
    # movers drawn by random_scene scale with motion_scale and are tiny at
    # these draws; boost radius so the classifier has signal, and scale the
    # velocity DOWN on a fraction of movers (slow-mover hard positives)
    for sp in sc.spheres:
        if np.any(sp.vel != 0):
            sp.radius *= float(rng.uniform(2.0, 10.0))
            sp.center0[2] = max(sp.center0[2], 1.8)
            if rng.random() < 0.4:
                sp.vel = sp.vel * float(rng.uniform(0.15, 0.5))
    flow_f = np.stack([sc.gt_flow(t, t + 1) for t in range(T - 1)])
    flow_b = np.stack([sc.gt_flow(t + 1, t) for t in range(T - 1)])
    flow_f2 = np.stack([sc.gt_flow(t, t + 2) for t in range(T - 2)])
    flow_b2 = np.stack([sc.gt_flow(t + 2, t) for t in range(T - 2)])
    occ, _ = flow_check(jnp.asarray(flow_f), jnp.asarray(flow_b), 1.0)
    occ2, _ = flow_check(jnp.asarray(flow_f2), jnp.asarray(flow_b2), 1.0)
    cfg = TrackerConfig(sample_ratio=int(rng.choice([2, 4])),
                        capacity=1 << int(rng.choice([14, 15])))
    res = run_tracker(jnp.asarray(flow_f), occ, jnp.asarray(flow_f2), occ2,
                      cfg, H, W)
    tracks = assemble_tracks(res, 3)
    if tracks.num_tracks < 64:
        continue
    dmask = np.stack([sc.gt_dynamic(t) for t in range(T)])
    labels = (find_traj_label(tracks.xy, tracks.mask, dmask)
              if ndyn else np.zeros(tracks.num_tracks, np.float32))
    traj = tracks.xy / np.array([W, H], np.float32)
    deps = np.stack([
        np.asarray(Image.fromarray(
            (sc.gt_inverse_depth_norm(t) * 65535).astype(np.uint16)
        ).resize((53, 30), Image.BILINEAR), np.float32) / 65535.0
        for t in range(T)])
    np.savez_compressed(fout,
                        traj=traj.astype(np.float32), valid=tracks.mask,
                        label=labels.astype(np.float32),
                        depth=deps.astype(np.float32))
    if s % 5 == 0:
        print(f"{tag}: {tracks.num_tracks} tracks dyn={labels.mean():.3f} "
              f"sr={cfg.sample_ratio} ({time.time()-t0:.0f}s)", flush=True)
print("done", time.time() - t0, flush=True)
