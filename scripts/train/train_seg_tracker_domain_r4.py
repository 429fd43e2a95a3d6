"""Round-4 motion-seg training: scaled tracker-domain mix + density-matched eval.

Addresses VERDICT round-3 task 4 (tracker-domain holdout IoU 0.406 -> target
>= 0.6; precision 0.09 at protocol scale). Changes vs the round-3 finetune:

  - ~4x the tracker scenes (gen_tracker_seg_scenes_r4.py: hard negatives =
    parallax-heavy static structure, hard positives = slow movers, density
    variety via sample_ratio {2,4});
  - trains at TWO track densities (NP 1280 B=2 and NP 4096 B=1) so the
    InstanceNorm/diff-pool statistics are density-robust — inference chunks
    the track axis at ~4-13k tracks while round-3 training only ever saw 1280;
  - holdout evaluated over ALL tracks of each held-out scene (chunked at 4096,
    matching segment_tracks), with IoU + precision + recall — the round-3
    holdout metric silently truncated scenes to their first 1280 tracks;
  - checkpoint selection on holdout IoU with precision reported alongside.

    python scripts/train/train_seg_tracker_domain_r4.py [steps] [out.msgpack]

Resumes from checkpoints/motionseg_synth3d.msgpack (warm start).
"""
import sys, time; sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[2]))
import os; os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, jax, jax.numpy as jnp
from pathlib import Path
from flax.serialization import msgpack_restore, msgpack_serialize
from particlesfm_tpu.models.motionseg import TrajOADepth
from particlesfm_tpu.motionseg import create_train_state, train_step
from particlesfm_tpu.motionseg.synth3d import synth3d_batch
from particlesfm_tpu.motionseg.train import TrainState, cls_iou

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/seg_r4_best.msgpack"
SCENE_DIR = Path(os.environ.get("SEG_SCENES", "/tmp/trackscenes_r4"))
N_HOLD = 30

scenes = []
for f in sorted(SCENE_DIR.glob("*.npz")):
    d = np.load(f)
    scenes.append((d["traj"], d["valid"], d["label"], d["depth"]))
print(f"{len(scenes)} tracker scenes from {SCENE_DIR}", flush=True)
hold = scenes[-N_HOLD:]
scenes = scenes[:-N_HOLD]

SHAPES = [(1280, 2), (4096, 1)]     # (tracks, batch) alternated during training
EVAL_NP = 4096                      # holdout chunk size (inference-like density)


def track_batch(rng, NP, B):
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
    """Full-scene chunked eval: IoU / precision / recall over all tracks."""
    tp = fp = fn = 0.0
    ious = []
    for tr, va, la, de in hold:
        preds = np.zeros(len(tr), bool)
        for s in range(0, len(tr), EVAL_NP):
            n = min(EVAL_NP, len(tr) - s)
            traj = np.zeros((1, EVAL_NP, 10, 2), np.float32)
            valid = np.zeros((1, EVAL_NP, 10), bool)
            traj[0, :n] = tr[s:s + n]; valid[0, :n] = va[s:s + n]
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                jnp.asarray(traj), jnp.asarray(de[None]), jnp.asarray(valid),
                train=False)
            preds[s:s + n] = np.asarray(
                jax.nn.sigmoid(logits))[0, :n] > 0.5
        has = va.any(1)
        gt = (la > 0.5) & has
        pr = preds & has
        tp += float((pr & gt).sum()); fp += float((pr & ~gt).sum())
        fn += float((~pr & gt).sum())
        if gt.any() or pr.any():
            ious.append(float((pr & gt).sum()) / max(float((pr | gt).sum()), 1.0))
    iou = float(np.mean(ious)) if ious else float("nan")
    prec = tp / max(tp + fp, 1.0)
    rec = tp / max(tp + fn, 1.0)
    return iou, prec, rec


rng = np.random.default_rng(0)
model = TrajOADepth(input_hw=(30, 53))
sample = track_batch(rng, *SHAPES[0])
jb = {k: jnp.asarray(v) for k, v in sample.items()}
state, tx = create_train_state(model, jax.random.PRNGKey(0), jb, 1.5e-4)
ckpt0 = "checkpoints/motionseg_synth3d.msgpack"
if Path(ckpt0).exists():
    blob = msgpack_restore(open(ckpt0, "rb").read())
    state = TrainState(params=blob["params"], batch_stats=blob["batch_stats"],
                       opt_state=state.opt_state, step=jnp.zeros((), jnp.int32))
print("pre-train holdout (iou, prec, rec):", hold_metrics(model, state), flush=True)

t0 = time.time()
best = -1.0
for step in range(1, STEPS + 1):
    NP, B = SHAPES[step % len(SHAPES)]
    if step % 4 == 1 and NP == SHAPES[0][0]:
        # keep the broad procedural prior in the mix; synth3d emits its own
        # track count — pad the track axis up to the training shape
        b = synth3d_batch(rng, B=B, depth_hw=(30, 53))
        n = b["traj"].shape[1]
        if n < NP:
            pad = NP - n
            b["traj"] = np.pad(b["traj"], ((0, 0), (0, pad), (0, 0), (0, 0)))
            b["valid"] = np.pad(b["valid"], ((0, 0), (0, pad), (0, 0)))
            b["label"] = np.pad(b["label"], ((0, 0), (0, pad)))
            b["traj_valid"] = np.pad(b["traj_valid"], ((0, 0), (0, pad)))
        elif n > NP:
            for k in ("traj", "valid", "label", "traj_valid"):
                b[k] = b[k][:, :NP]
    else:
        b = track_batch(rng, NP, B)
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    state, m = train_step(model, tx, state, jb)
    if step % 250 == 0:
        iou, prec, rec = hold_metrics(model, state)
        print(f"step {step}: train iou {float(m['iou']):.3f} | holdout IoU "
              f"{iou:.3f} P {prec:.3f} R {rec:.3f} ({time.time()-t0:.0f}s)",
              flush=True)
        if iou > best:
            best = iou
            blob = msgpack_serialize(
                {"params": jax.tree.map(np.asarray, state.params),
                 "batch_stats": jax.tree.map(np.asarray, state.batch_stats)})
            open(OUT, "wb").write(blob)
print("done best", best, flush=True)
