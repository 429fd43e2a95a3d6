"""Compact-RAFT trainer on synth renders (in-environment flow weights).

Standard RAFT recipe (Teed & Deng ECCV'20) adapted to the compact config:
sequence loss sum_i gamma^(N-i) ||f_i - gt||_1 over GRU iterations, AdamW +
one-cycle LR, gradient clipping. Runs on one TPU chip (or CPU for smoke tests).

Usage:
    python -m particlesfm_tpu.flow.train --out checkpoints/raft_synth.msgpack \
        --scenes 120 --steps 6000
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def sequence_loss(flows_pred, flow_gt, gamma: float = 0.8, max_flow: float = 400.0):
    import jax.numpy as jnp

    mag = jnp.linalg.norm(flow_gt, axis=-1)
    valid = (mag < max_flow).astype(jnp.float32)[None, ..., None]
    n = flows_pred.shape[0]
    weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
    l1 = jnp.abs(flows_pred - flow_gt[None])
    per_iter = jnp.mean(l1 * valid, axis=(1, 2, 3, 4))
    return jnp.sum(weights * per_iter)


def epe(flow_pred, flow_gt):
    return float(np.mean(np.linalg.norm(np.asarray(flow_pred) - flow_gt, axis=-1)))


def save_resume_state(path, params, opt_state, step: int, best_epe: float):
    """Full trainer state for chunked runs (the TPU tunnel is only reliable in
    foreground sessions, so long trainings run as resume chunks)."""
    import jax
    from flax.serialization import msgpack_serialize, to_state_dict

    blob = {
        "params": jax.device_get(params),
        "opt_state": to_state_dict(jax.device_get(opt_state)),
        "step": step,
        "best_epe": float(best_epe),
    }
    Path(path).write_bytes(msgpack_serialize(blob))


def load_resume_state(path, params_tpl, opt_state_tpl):
    from flax.serialization import from_state_dict, msgpack_restore

    blob = msgpack_restore(Path(path).read_bytes())
    params = from_state_dict(params_tpl, blob["params"])
    opt_state = from_state_dict(opt_state_tpl, blob["opt_state"])
    return params, opt_state, int(blob["step"]), float(blob["best_epe"])


def train(
    out_path,
    num_scenes: int = 120,
    steps: int = 6000,
    batch: int = 4,
    iters: int = 12,
    lr: float = 2e-4,
    seed: int = 0,
    dataset_cache: str | None = None,
    workers: int = 4,
    eval_every: int = 500,
    resume: str | None = None,
    max_seconds: float = 0.0,
    save_every: int = 200,
    crop_hw: tuple | None = (192, 256),
    infer_iters: int = 12,
    init_ckpt: str | None = None,
    log=print,
):
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.raft import compact_raft
    from .data import FlowPairSpec, generate_dataset, load_dataset, save_dataset
    from .infer import save_flow_checkpoint

    # chunked runs recompile identical programs; cache them across processes
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    t0 = time.time()
    if dataset_cache and Path(dataset_cache).exists():
        i1, i2, fl = load_dataset(dataset_cache)
        log(f"[flowtrain] loaded cached dataset: {len(i1)} pairs")
    else:
        i1, i2, fl = generate_dataset(num_scenes, FlowPairSpec(), seed=seed,
                                      workers=workers, log=log)
        if dataset_cache:
            save_dataset(dataset_cache, i1, i2, fl)
        log(f"[flowtrain] rendered {len(i1)} pairs in {time.time() - t0:.0f}s")
    # held-out split for EPE tracking
    n_val = min(max(8, len(i1) // 20), len(i1) // 2)
    val = (i1[:n_val], i2[:n_val], fl[:n_val].astype(np.float32))
    i1, i2, fl = i1[n_val:], i2[n_val:], fl[n_val:]

    model = compact_raft(remat=True)
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((64, 64, 3)), jnp.zeros((64, 64, 3)), iters=1)[
        "params"
    ]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    log(f"[flowtrain] compact RAFT: {n_params/1e6:.2f}M params")
    if init_ckpt and Path(init_ckpt).exists():
        from .infer import load_flow_checkpoint
        from flax.serialization import from_state_dict

        loaded, _ = load_flow_checkpoint(init_ckpt)
        params = from_state_dict(params, loaded)
        log(f"[flowtrain] warm-started params from {init_ckpt}")

    # onecycle with <~50 steps produces zero-length segments -> NaN LR
    if steps >= 50:
        sched = optax.linear_onecycle_schedule(steps, lr, pct_start=0.1)
    else:
        sched = lr
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=1e-5),
    )
    opt_state = tx.init(params)

    def loss_fn(p, b1, b2, bf):
        with jax.default_matmul_precision("default"):
            preds = jax.vmap(
                lambda a, b: model.apply({"params": p}, a, b, iters=iters, all_iters=True)
            )(b1, b2)                       # [B, iters, H, W, 2]
        preds = jnp.moveaxis(preds, 1, 0)   # [iters, B, H, W, 2]
        return sequence_loss(preds, bf)

    # the whole dataset lives on device (u8/f16, ~1.5 GB << HBM); batches are
    # gathered on device from host-chosen indices, so each step transfers 4
    # ints instead of ~10 MB of images through the (slow) tunnel. The arrays
    # are passed as arguments, NOT closed over — jit would constant-fold a
    # closed-over dataset into the program (OOM).
    di1 = jax.device_put(i1)
    di2 = jax.device_put(i2)
    dfl = jax.device_put(fl)

    # K optimizer steps per device dispatch: the tunneled chip pays a large
    # host<->device roundtrip per call, so the Python-loop-per-step pattern is
    # latency-bound; a lax.scan over index blocks amortizes it K-fold.
    # K=50 faulted the TPU worker through the tunnel (long-running single
    # dispatch); 10 keeps each dispatch a few seconds.
    K = 10

    # random crops cut per-step pixels (RAFT is fully convolutional; flow
    # vectors are translation-invariant so cropping images+GT together is
    # exact). Offsets are host-generated per step, sliced on device.
    ch, cw = crop_hw if crop_hw else i1.shape[1:3]
    ch, cw = min(ch, i1.shape[1]), min(cw, i1.shape[2])

    def crop(im, oy, ox):
        return jax.lax.dynamic_slice(im, (oy, ox, 0), (ch, cw, im.shape[-1]))

    @jax.jit
    def step(p, s, d1, d2, df, idxs, offs):  # idxs [K, batch], offs [K, batch, 2]
        def body(carry, io):
            p, s = carry
            idx, off = io
            vc = jax.vmap(crop)
            b1 = vc(d1[idx].astype(jnp.float32), off[:, 0], off[:, 1])
            b2 = vc(d2[idx].astype(jnp.float32), off[:, 0], off[:, 1])
            bf = vc(df[idx].astype(jnp.float32), off[:, 0], off[:, 1])
            loss, g = jax.value_and_grad(loss_fn)(p, b1, b2, bf)
            updates, s = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss
        (p, s), losses = jax.lax.scan(body, (p, s), (idxs, offs))
        return p, s, losses

    @jax.jit
    def infer(p, a, b):
        with jax.default_matmul_precision("default"):
            return jax.vmap(
                lambda x, y: model.apply({"params": p}, x, y, iters=iters)
            )(a, b)

    best_epe = np.inf
    start_step = 0
    if resume and Path(resume).exists():
        params, opt_state, start_step, best_epe = load_resume_state(
            resume, params, opt_state)
        log(f"[flowtrain] resumed from {resume} @ step {start_step} "
            f"(best EPE {best_epe:.3f})")
    def run_eval(it):
        nonlocal best_epe
        errs = []
        for k in range(0, len(val[0]), batch):
            pred = infer(params, jnp.asarray(val[0][k:k+batch], jnp.float32),
                         jnp.asarray(val[1][k:k+batch], jnp.float32))
            errs.append(epe(pred, val[2][k:k+batch]))
        cur = float(np.mean(errs))
        log(f"[flowtrain] step {it}: val EPE {cur:.3f} px")
        if cur < best_epe:
            best_epe = cur
            save_flow_checkpoint(out_path, params, "compact",
                                 {"iters": infer_iters, "train_iters": iters,
                                  "val_epe": cur})
            log(f"[flowtrain] saved {out_path} (EPE {cur:.3f})")

    # per-step rng keyed on the step index: identical stream across resumes
    t0 = time.time()
    it = start_step
    H, W = i1.shape[1:3]
    while it < steps:
        k = min(K, steps - it)
        rngs = [np.random.default_rng(seed * 1000003 + it + j) for j in range(k)]
        idxs = np.stack([r.integers(0, len(i1), batch) for r in rngs]).astype(np.int32)
        offs = np.stack([
            np.stack([r.integers(0, H - ch + 1, batch),
                      r.integers(0, W - cw + 1, batch)], axis=-1)
            for r in rngs]).astype(np.int32)
        params, opt_state, losses = step(params, opt_state, di1, di2, dfl,
                                         jnp.asarray(idxs), jnp.asarray(offs))
        losses = np.asarray(losses)
        it += k
        done = it - start_step
        log(f"[flowtrain] step {it}/{steps} loss {losses.mean():.3f} "
            f"({done/(time.time()-t0):.2f} it/s)")
        if it % eval_every < k or it == steps:
            run_eval(it)
        hit_wall = max_seconds > 0 and time.time() - t0 > max_seconds
        if resume and (it % save_every < k or hit_wall or it == steps):
            save_resume_state(resume, params, opt_state, it, best_epe)
        if hit_wall and it < steps:
            log(f"[flowtrain] wall budget hit at step {it}; resume state saved")
            break
    return best_epe


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenes", type=int, default=120)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataset_cache", default=None)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--resume", default=None,
                    help="resume-state file; created/updated for chunked runs")
    ap.add_argument("--max_seconds", type=float, default=0.0,
                    help="stop (saving resume state) after this wall budget")
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--crop", type=int, nargs=2, default=(192, 256),
                    help="random-crop size for training steps (0 0 = full)")
    ap.add_argument("--infer_iters", type=int, default=12,
                    help="GRU iterations recorded in the checkpoint meta for inference")
    ap.add_argument("--init_ckpt", default=None,
                    help="warm-start params from an inference checkpoint")
    args = ap.parse_args(argv)
    crop = tuple(args.crop) if args.crop and args.crop[0] > 0 else None
    best = train(args.out, args.scenes, args.steps, args.batch, args.iters,
                 args.lr, args.seed, args.dataset_cache, args.workers,
                 eval_every=args.eval_every, resume=args.resume,
                 max_seconds=args.max_seconds, crop_hw=crop,
                 infer_iters=args.infer_iters, init_ckpt=args.init_ckpt)
    print(f"best val EPE: {best:.3f} px")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
