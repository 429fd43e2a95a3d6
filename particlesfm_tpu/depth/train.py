"""DepthNet trainer on synth renders (in-environment MiDaS-contract weights).

The reference downloads midas_v21 weights (scripts/download_models_thirdparty.sh)
and consumes depth only through the motion-seg featurization as per-frame
relative inverse depth in [0, 1] (load_cut_seq.py:41). This trainer produces a
checkpoint honoring that contract from the same textured ray-cast world the
flow net trains on, using the scale-shift-invariant loss (models/depth.py).

Usage:
    python -m particlesfm_tpu.depth.train --out checkpoints/depth_synth.msgpack
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time
from pathlib import Path

import numpy as np


def _gen_scene_frames(args):
    seed, hw, frames = args
    from ..synth import random_scene

    rng = np.random.default_rng(seed)
    h, w = hw
    sc = random_scene(
        rng, num_views=frames, height=h, width=w,
        focal=1.2 * w * rng.uniform(0.8, 1.3),
        num_dynamic=int(rng.integers(0, 3)),
        motion_scale=float(rng.uniform(0.2, 0.6)),
        rot_scale=float(rng.uniform(0.3, 1.0)),
        num_static_obj=int(rng.integers(2, 8)),
    )
    out = []
    for t in range(frames):
        out.append((sc.render(t), sc.gt_inverse_depth_norm(t).astype(np.float16)))
    return out

def generate_depth_dataset(num_scenes: int, hw=(256, 320), frames: int = 3,
                           seed: int = 0, workers: int = 4, log=print):
    jobs = [(seed * 77003 + i, hw, frames) for i in range(num_scenes)]
    out = []
    if workers > 1:
        with mp.get_context("spawn").Pool(workers) as pool:
            for i, fr in enumerate(pool.imap_unordered(_gen_scene_frames, jobs)):
                out.extend(fr)
                if (i + 1) % 20 == 0:
                    log(f"[depthdata] {i+1}/{num_scenes} scenes")
    else:
        for job in jobs:
            out.extend(_gen_scene_frames(job))
    imgs = np.stack([o[0] for o in out])
    deps = np.stack([o[1] for o in out])
    return imgs, deps


def train(
    out_path,
    num_scenes: int = 150,
    steps: int = 3000,
    batch: int = 8,
    lr: float = 2e-4,
    seed: int = 0,
    dataset_cache: str | None = None,
    workers: int = 4,
    eval_every: int = 500,
    resume: str | None = None,
    max_seconds: float = 0.0,
    save_every: int = 500,
    log=print,
):
    import jax
    import jax.numpy as jnp
    import optax
    from flax.serialization import msgpack_serialize

    from ..models.depth import DepthNet, scale_shift_invariant_loss
    from ..flow.train import load_resume_state, save_resume_state

    # chunked runs recompile identical programs; cache them across processes
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    t0 = time.time()
    if dataset_cache and Path(dataset_cache).exists():
        z = np.load(dataset_cache)
        imgs, deps = z["images"], z["depths"]
        log(f"[depthtrain] loaded cached dataset: {len(imgs)} frames")
    else:
        imgs, deps = generate_depth_dataset(num_scenes, seed=seed, workers=workers, log=log)
        if dataset_cache:
            np.savez_compressed(dataset_cache, images=imgs, depths=deps)
        log(f"[depthtrain] rendered {len(imgs)} frames in {time.time()-t0:.0f}s")
    n_val = min(max(8, len(imgs) // 20), len(imgs) // 2)
    val = (imgs[:n_val], deps[:n_val].astype(np.float32))
    imgs, deps = imgs[n_val:], deps[n_val:]

    model = DepthNet()
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((64, 64, 3)), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    # onecycle with <~50 steps produces zero-length segments -> NaN LR
    sched = (optax.linear_onecycle_schedule(steps, lr, pct_start=0.1)
             if steps >= 50 else lr)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=1e-5))
    opt_state = tx.init(params)

    def loss_fn(p, bs, bi, bd):
        def one(im, d):
            with jax.default_matmul_precision("default"):
                pred, upd = model.apply(
                    {"params": p, "batch_stats": bs}, im, train=True,
                    mutable=["batch_stats"],
                )
            return scale_shift_invariant_loss(pred, d, jnp.ones_like(d)), upd["batch_stats"]

        losses, upds = jax.vmap(one)(bi, bd)
        # per-sample running-stat updates are averaged across the batch
        new_bs = jax.tree.map(lambda x: x.mean(0), upds)
        return losses.mean(), new_bs

    # the dataset lives on device (u8/f16); batches are gathered on device from
    # host-chosen indices so each dispatch transfers K*batch ints instead of
    # megabytes of images through the (slow) TPU tunnel. Passed as arguments,
    # never closed over (jit would constant-fold the dataset -> OOM).
    dimgs = jax.device_put(imgs)
    ddeps = jax.device_put(deps)
    K = 50

    @jax.jit
    def step(p, bs, s, di, dd, idxs):  # idxs [K, batch]
        def body(carry, idx):
            p, bs, s = carry
            bi = di[idx].astype(jnp.float32)
            bd = dd[idx].astype(jnp.float32)
            (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, bi, bd)
            updates, s = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), bs, s), loss
        (p, bs, s), losses = jax.lax.scan(body, (p, bs, s), idxs)
        return p, bs, s, losses

    @jax.jit
    def infer(p, bs, bi):
        with jax.default_matmul_precision("default"):
            return jax.vmap(
                lambda im: model.apply({"params": p, "batch_stats": bs}, im, train=False)
            )(bi)

    def val_ssi(p, bs):
        errs = []
        for k in range(0, len(val[0]), batch):
            pred = np.asarray(infer(p, bs, jnp.asarray(val[0][k:k+batch], jnp.float32)))
            for j in range(len(pred)):
                t = val[1][k + j].ravel()
                pr = np.nan_to_num(pred[j].ravel(), posinf=1e6, neginf=-1e6)
                # closed-form scale/shift alignment (regularized normal equations)
                var = pr.var() + 1e-8
                s = ((pr - pr.mean()) * (t - t.mean())).mean() / var
                b = t.mean() - s * pr.mean()
                errs.append(float(np.mean((s * pr + b - t) ** 2)))
        return float(np.mean(errs))

    best = np.inf
    start_step = 0
    state = {"p": params, "bs": batch_stats}
    if resume and Path(resume).exists():
        state, opt_state, start_step, best = load_resume_state(
            resume, state, opt_state)
        params, batch_stats = state["p"], state["bs"]
        log(f"[depthtrain] resumed from {resume} @ step {start_step} "
            f"(best SSI {best:.5f})")

    def save_best(it, cur):
        out = Path(out_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_bytes(msgpack_serialize({
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
        }))
        Path(str(out) + ".json").write_text(json.dumps({"val_ssi_mse": cur, "step": it}))
        log(f"[depthtrain] saved {out_path}")

    t0 = time.time()
    it = start_step
    while it < steps:
        k = min(K, steps - it)
        # per-step rng keyed on the step index: identical stream across resumes
        idxs = np.stack([
            np.random.default_rng(seed * 900001 + it + j).integers(
                0, len(imgs), batch)
            for j in range(k)]).astype(np.int32)
        params, batch_stats, opt_state, losses = step(
            params, batch_stats, opt_state, dimgs, ddeps, jnp.asarray(idxs))
        losses = np.asarray(losses)
        it += k
        log(f"[depthtrain] step {it}/{steps} loss {losses.mean():.5f} "
            f"({(it-start_step)/(time.time()-t0):.1f} it/s)")
        if it % eval_every < k or it == steps:
            cur = val_ssi(params, batch_stats)
            log(f"[depthtrain] step {it}: val SSI-MSE {cur:.5f}")
            if cur < best:
                best = cur
                save_best(it, cur)
        hit_wall = max_seconds > 0 and time.time() - t0 > max_seconds
        if resume and (it % save_every < k or hit_wall or it == steps):
            save_resume_state(resume, {"p": params, "bs": batch_stats},
                              opt_state, it, best)
        if hit_wall and it < steps:
            log(f"[depthtrain] wall budget hit at step {it}; resume state saved")
            break
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenes", type=int, default=150)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataset_cache", default=None)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--resume", default=None,
                    help="resume-state file; created/updated for chunked runs")
    ap.add_argument("--max_seconds", type=float, default=0.0,
                    help="stop (saving resume state) after this wall budget")
    ap.add_argument("--eval_every", type=int, default=500)
    args = ap.parse_args(argv)
    best = train(args.out, args.scenes, args.steps, args.batch, args.lr,
                 args.seed, args.dataset_cache, args.workers,
                 eval_every=args.eval_every, resume=args.resume,
                 max_seconds=args.max_seconds)
    print(f"best val SSI-MSE: {best:.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
