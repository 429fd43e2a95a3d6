"""Generate motion-seg training scenes by running the ACTUAL tracking engine
over GT flow of ray-cast scenes (synth.render.random_scene).

Round-1 training used analytic trajectories; the resulting checkpoint did not
transfer to tracker-produced ones (precision 0.03 on real renders). Round-2
recipe: run_tracker over the scene's GT flow produces trajectories with the
true slot-pool lifetime/density statistics, and find_traj_label transfers the
GT dynamic masks. Movers drawn by random_scene scale with motion_scale and are
tiny at seg-training draws (~1%% of tracks — fine-tuning diverged); boosting
their radius 3-8x gives mean dynamic fraction ~0.20 over 60 scenes.

    python scripts/train/gen_tracker_seg_scenes.py [seed] [n_scenes]

Writes /tmp/trackscenes/scene_*.npz consumed by finetune_seg_tracker_domain.py.
"""
import sys, time; sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[2]))
import os; os.environ["JAX_PLATFORMS"]="cpu"; os.environ["PALLAS_AXON_POOL_IPS"]=""
import numpy as np, jax.numpy as jnp
from pathlib import Path
from particlesfm_tpu.synth.render import random_scene
from particlesfm_tpu.ops.flow_ops import flow_check
from particlesfm_tpu.tracks.engine import TrackerConfig, run_tracker
from particlesfm_tpu.tracks.store import assemble_tracks
from particlesfm_tpu.motionseg.data import find_traj_label

out = Path("/tmp/trackscenes"); out.mkdir(exist_ok=True)
rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
n_scenes = int(sys.argv[2]) if len(sys.argv) > 2 else 60
T, H, W = 10, 218, 512
t0 = time.time()
cfg = TrackerConfig(sample_ratio=4, capacity=1<<14)
for s in range(n_scenes):
    ndyn = int(rng.integers(1, 3)) if rng.random() < 0.8 else 0
    sc = random_scene(rng, num_views=T, height=H, width=W,
                      focal=1.2 * W * rng.uniform(0.85, 1.15),
                      num_dynamic=ndyn,
                      motion_scale=float(rng.uniform(0.06, 0.25)),
                      rot_scale=float(rng.uniform(0.08, 0.4)),
                      num_static_obj=int(rng.integers(4, 11)))
    # movers drawn by random_scene scale with motion_scale and are tiny at
    # these draws (~1% of tracks); boost them so the classifier has signal
    for sp in sc.spheres:
        if np.any(sp.vel != 0):
            sp.radius *= float(rng.uniform(3.0, 8.0))
            sp.center0[2] = max(sp.center0[2], 1.8)
    flow_f = np.stack([sc.gt_flow(t, t+1) for t in range(T-1)])
    flow_b = np.stack([sc.gt_flow(t+1, t) for t in range(T-1)])
    flow_f2 = np.stack([sc.gt_flow(t, t+2) for t in range(T-2)])
    flow_b2 = np.stack([sc.gt_flow(t+2, t) for t in range(T-2)])
    occ, _ = flow_check(jnp.asarray(flow_f), jnp.asarray(flow_b), 1.0)
    occ2, _ = flow_check(jnp.asarray(flow_f2), jnp.asarray(flow_b2), 1.0)
    res = run_tracker(jnp.asarray(flow_f), occ, jnp.asarray(flow_f2), occ2, cfg, H, W)
    tracks = assemble_tracks(res, 3)
    dmask = np.stack([sc.gt_dynamic(t) for t in range(T)])
    labels = find_traj_label(tracks.xy, tracks.mask, dmask) if ndyn else np.zeros(tracks.num_tracks, np.float32)
    traj = tracks.xy / np.array([W, H], np.float32)
    # GT inverse depth at seg-model resolution (30x53) for the depth feature
    from PIL import Image
    deps = np.stack([
        np.asarray(Image.fromarray(
            (sc.gt_inverse_depth_norm(t) * 65535).astype(np.uint16)
        ).resize((53, 30), Image.BILINEAR), np.float32) / 65535.0
        for t in range(T)])
    np.savez_compressed(out / f"scene_{s:03d}.npz",
                        traj=traj.astype(np.float32), valid=tracks.mask,
                        label=labels.astype(np.float32), depth=deps.astype(np.float32))
    if s % 5 == 0:
        print(f"{s}: {tracks.num_tracks} tracks dyn={labels.mean():.3f} ({time.time()-t0:.0f}s)", flush=True)
print("done", time.time()-t0, flush=True)
