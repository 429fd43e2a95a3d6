"""Pipeline orchestrator + CLI — counterpart of /root/reference/run_particlesfm.py.

Same three input modes (--image_dir+--output_dir, --workspace_dir with an images
subfolder, --root_dir looping over sequences — run_particlesfm.py:139-178), same
stage toggles (--assume_static skips motion segmentation, --skip_sfm stops after
trajectories, --skip_path_consistency drops the stride-2 optimization), same
hyperparameter defaults (run_particlesfm.py:124-129).

Usage:
    python -m particlesfm_tpu.pipeline.run --image_dir IMG --output_dir OUT
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from ..io.images import load_image_stack
from ..utils.config import Config, save_config
from . import stages


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native ParticleSfM pipeline")
    p.add_argument("--image_dir", type=str, default=None)
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--workspace_dir", type=str, default=None)
    p.add_argument("--image_folder", type=str, default="images")
    p.add_argument("--root_dir", type=str, default=None)
    # stage toggles (run_particlesfm.py:131-138)
    p.add_argument("--assume_static", action="store_true")
    p.add_argument("--skip_sfm", action="store_true")
    p.add_argument("--skip_path_consistency", action="store_true")
    p.add_argument("--skip_exists", action="store_true")
    p.add_argument("--keep_intermediate", action="store_true")
    # hyperparams (run_particlesfm.py:124-129)
    p.add_argument("--sample_ratio", type=int, default=2)
    p.add_argument("--flow_check_thres", type=float, default=1.0)
    p.add_argument("--traj_min_len", type=int, default=3)
    p.add_argument("--window_size", type=int, default=10)
    p.add_argument("--traj_max_num", type=int, default=100000)
    p.add_argument("--sfm_type", type=str, default="global",
                   choices=["global", "incremental", "glomap"])
    # weights
    p.add_argument("--raft_ckpt", type=str, default=None)
    p.add_argument("--seg_ckpt", type=str, default=None)
    p.add_argument("--depth_ckpt", type=str, default=None)
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="dotted config override, e.g. "
                        "--set sfm.ba.refine_focal_length=false "
                        "(values parse as JSON, falling back to string)")
    return p


def config_from_args(args) -> Config:
    cfg = Config()
    cfg.assume_static = args.assume_static
    cfg.skip_sfm = args.skip_sfm
    cfg.skip_exists = args.skip_exists
    cfg.keep_intermediate = args.keep_intermediate
    cfg.track.sample_ratio = args.sample_ratio
    cfg.track.flow_check_thres = args.flow_check_thres
    cfg.track.traj_min_len = args.traj_min_len
    cfg.track.skip_path_consistency = args.skip_path_consistency
    cfg.motionseg.window_size = args.window_size
    cfg.motionseg.traj_max_num = args.traj_max_num
    cfg.sfm.sfm_type = args.sfm_type
    cfg.flow.checkpoint = args.raft_ckpt
    cfg.motionseg.checkpoint = args.seg_ckpt
    cfg.depth.checkpoint = args.depth_ckpt
    if getattr(args, "overrides", None):
        from ..utils.config import apply_overrides

        ov = {}
        for item in args.overrides:
            key, _, raw = item.partition("=")
            try:
                ov[key] = json.loads(raw)
            except json.JSONDecodeError:
                ov[key] = raw
        apply_overrides(cfg, ov)
    return cfg


_CKPT_DIR = Path(__file__).resolve().parents[2] / "checkpoints"
DEFAULT_SEG_CKPT = _CKPT_DIR / "motionseg_synth3d.msgpack"
DEFAULT_RAFT_CKPT = _CKPT_DIR / "raft_synth.msgpack"
DEFAULT_DEPTH_CKPT = _CKPT_DIR / "depth_synth.msgpack"

# Loader memo across run_pipeline calls: a multi-sequence sweep (--root_dir,
# acceptance benchmark) re-enters run_pipeline per sequence; rebuilding the
# jitted apply fns would retrace + re-look-up every executable through the
# tunnel each time. Keyed on checkpoint path + mtime (a long-lived process
# that retrains/overwrites a checkpoint must not keep serving stale weights)
# + the config fields that change the compiled program.
_APPLY_CACHE: dict = {}


def _ckpt_key(ckpt) -> tuple:
    import os

    try:
        return (str(ckpt), os.path.getmtime(ckpt))
    except OSError:
        return (str(ckpt), None)


def _memo(key, build):
    if key not in _APPLY_CACHE:
        _APPLY_CACHE[key] = build()
    return _APPLY_CACHE[key]


def _load_raft_apply(cfg: Config):
    """Build the jitted flow apply fn; falls back to the in-environment-trained
    compact checkpoint (the reference downloads released raft-things weights via
    scripts/download_models_thirdparty.sh:8-11 — zero egress here, so the
    default is trained on textured renders of the ray-cast scene generator).

    The photometric refinement schedule is fused into the same per-block jit
    as the net forward (flow/infer.py refine_schedule) — one device program
    per pair block instead of a separate chunked pass."""
    ckpt = cfg.flow.checkpoint
    if ckpt is None and DEFAULT_RAFT_CKPT.exists():
        ckpt = str(DEFAULT_RAFT_CKPT)
    if ckpt is None:
        return None
    from ..flow.infer import load_flow_apply_pairs

    schedule = (
        tuple(tuple(p) for p in cfg.flow.refine_schedule)
        if cfg.flow.photometric_refine else None
    )
    key = ("raft", _ckpt_key(ckpt), cfg.flow.iters, cfg.flow.per_device,
           cfg.flow.infer_scale, schedule, cfg.flow.refine_max_total_px)
    return _memo(key, lambda: load_flow_apply_pairs(
        ckpt, iters=cfg.flow.iters, per_device=cfg.flow.per_device,
        scale=cfg.flow.infer_scale, refine_schedule=schedule,
        refine_max_total=cfg.flow.refine_max_total_px,
    ))


def _load_depth_apply(cfg: Config):
    """Build the jitted depth apply fn from a checkpoint (run_midas counterpart,
    /root/reference/run_particlesfm.py:55-57). Default: in-environment-trained
    checkpoint on ray-cast renders with ground-truth inverse depth."""
    ckpt = cfg.depth.checkpoint
    if ckpt is None and DEFAULT_DEPTH_CKPT.exists():
        ckpt = str(DEFAULT_DEPTH_CKPT)
    if ckpt is None:
        return None
    key = ("depth", _ckpt_key(ckpt), cfg.depth.base)
    if key in _APPLY_CACHE:
        return _APPLY_CACHE[key]
    import jax
    import jax.numpy as jnp
    from flax.serialization import msgpack_restore
    from ..models.depth import DepthNet

    with open(ckpt, "rb") as f:
        blob = msgpack_restore(f.read())
    variables = {"params": blob["params"]}
    if "batch_stats" in blob:
        variables["batch_stats"] = blob["batch_stats"]
    model = DepthNet(base=cfg.depth.base)

    from ..parallel.mesh import data_sharding, make_mesh
    import numpy as np

    from ..models.depth import normalize_depth

    mesh = make_mesh()
    nd = int(np.prod(list(mesh.shape.values())))
    block = 4 * nd
    idx_sharding = data_sharding(mesh, 1)

    variables = jax.device_put(variables)   # argument, not a baked-in closure

    @jax.jit
    def run_block(variables, stack, idx):
        def _one(im):
            # net inference skips the package-global f32-highest matmul
            # precision (geometry-solver setting); default keeps the MXU
            # fast path. Per-frame normalization fuses in (the old path did
            # 48 separate normalize round-trips through the tunnel).
            with jax.default_matmul_precision("default"):
                d = model.apply(variables, im, train=False)
            return normalize_depth(d)

        return jax.vmap(_one)(stack[idx].astype(jnp.float32))

    def apply(imgs):
        """Batched (imgs [N, H, W, 3] uint8-range) -> normalized depths
        [N, H, W] in [0, 1]; the uint8 frame stack uploads once and frame
        blocks shard data-parallel over the device mesh (the reference runs
        MiDaS one frame at a time on one GPU). A pre-uploaded device uint8
        stack passes through without a second 64 MB H2D trip."""
        if isinstance(imgs, jax.Array) and imgs.dtype == jnp.uint8:
            stack = imgs
        else:
            stack = jax.device_put(
                jnp.asarray(np.clip(np.round(np.asarray(imgs)), 0, 255),
                            jnp.uint8))
        N = len(imgs)
        out = []
        for k in range(0, N, block):
            idx = np.arange(k, min(k + block, N), dtype=np.int32)
            pad = block - len(idx)
            if pad:
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            di = jax.device_put(jnp.asarray(idx), idx_sharding)
            d = run_block(variables, stack, di).astype(jnp.float16)
            out.append(d[: block - pad] if pad else d)
        return np.concatenate([np.asarray(o, np.float32) for o in out], 0)

    _APPLY_CACHE[key] = apply
    return apply


def _load_seg_apply(cfg: Config):
    """Build the jitted segmentation apply fn from a checkpoint.

    Falls back to the repo's shipped synthetic-pretrained checkpoint when no
    --seg_ckpt is given (the reference ships a FlyingThings3D-pretrained
    artifact via download script; this environment cannot download, so the
    default is trained on procedural 3D scenes — see motionseg/synth3d.py).
    A sidecar <ckpt>.json may carry {"input_hw": [h, w]}; depth maps are
    resized to the model's resolution on the fly.
    """
    import json

    ckpt = cfg.motionseg.checkpoint
    if ckpt is None and DEFAULT_SEG_CKPT.exists():
        ckpt = str(DEFAULT_SEG_CKPT)
    if ckpt is None:
        return None
    key = ("seg", _ckpt_key(ckpt), tuple(cfg.motionseg.resolution))
    if key in _APPLY_CACHE:
        return _APPLY_CACHE[key]
    import jax
    import jax.numpy as jnp
    from flax.serialization import msgpack_restore
    from ..models.motionseg import TrajOADepth

    input_hw = tuple(cfg.motionseg.resolution)
    sidecar_threshold = None
    meta_path = Path(str(ckpt) + ".json")
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        input_hw = tuple(meta["input_hw"])
        # calibrated decision threshold (round-5 trainer sweeps the sigmoid
        # cut on the holdout and stores the pooled-IoU-optimal value)
        sidecar_threshold = meta.get("threshold")
    model = TrajOADepth(input_hw=input_hw)
    with open(ckpt, "rb") as f:
        blob = msgpack_restore(f.read())
    variables = {"params": blob["params"]}
    if "batch_stats" in blob:
        variables["batch_stats"] = blob["batch_stats"]

    variables = jax.device_put(variables)   # argument, not a baked-in closure

    def _apply_body(variables, traj, depth, valid):
        if traj.dtype == jnp.uint16:
            # u16 fixed-point upload (motionseg/infer.py): halves the H2D
            # bytes through the ~4 MB/s tunnel; 1/65535 of the frame is
            # ~0.016 px — far below the classifier's sensitivity
            traj = traj.astype(jnp.float32) * (1.0 / 65535.0)
        L = depth.shape[1]
        depth_r = jax.image.resize(
            depth, (depth.shape[0], L, input_hw[0], input_hw[1]), "bilinear"
        )
        # classifier inference does not need the package-global f32-highest
        # matmuls (geometry-solver accuracy); default keeps the MXU fast path
        with jax.default_matmul_precision("default"):
            return model.apply(variables, traj, depth_r, valid, train=False)

    _apply = jax.jit(_apply_body)

    @jax.jit
    def _apply_chunks(variables, traj, depth, valid):
        """All track chunks in ONE dispatch: lax.scan over the chunk axis
        (traj [C, B, k, L, 2], valid [C, B, k, L]). Each step is bit-identical
        to a standalone per-chunk call; the win is C-1 fewer tunnel dispatches
        (the round-4 seg stage paid ~8 sequential chunk dispatches/seq)."""
        def step(_, tv):
            t, v = tv
            return None, _apply_body(variables, t, depth, v)

        _, out = jax.lax.scan(step, None, (traj, valid))
        return out                                  # [C, B, k]

    def apply(traj, depth, valid):
        return _apply(variables, traj, depth, valid)

    def apply_chunks(traj, depth, valid):
        return _apply_chunks(variables, traj, depth, valid)

    apply.accepts_u16 = True    # motionseg/infer.py packs coords as u16
    apply.scan_chunks = apply_chunks
    apply.threshold = sidecar_threshold
    _APPLY_CACHE[key] = apply
    return apply


def run_pipeline(image_dir, output_dir, cfg: Config, log=print):
    """Run the staged pipeline on one sequence (particlesfm() parity)."""
    from ..utils.profiling import StageTimer

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    timer = StageTimer(report_path=out / "timings.txt")
    save_config(cfg, out / "config.json")
    images, names = load_image_stack(image_dir)
    T, H, W = images.shape[:3]
    log(f"[pipeline] {T} frames at {W}x{H} from {image_dir}")

    # one shared frame-stack upload for the flow + depth nets (~15 s of H2D
    # through the tunnel per 48-frame sequence; uploading twice was measured
    # as a third of the depth stage). LAZY: skip-exists re-runs whose flow and
    # depth stages both short-circuit must not pay the upload at all, so the
    # stages receive a memoizing thunk and call it only on a cache miss.
    raft_apply = _load_raft_apply(cfg)
    _stack_box = [None]

    def device_stack():
        if _stack_box[0] is None:
            with timer.stage("frame_upload"):
                _stack_box[0] = stages.upload_frame_stack(images)
                import jax as _jax

                _jax.block_until_ready(_stack_box[0])
        return _stack_box[0]

    # stage 1+2: flow -> trajectories
    with timer.stage("flow"):
        flows = stages.flow_stage(images, out, cfg, raft_apply,
                                  device_stack=device_stack, log=log)
    with timer.stage("trajectories"):
        tracks = stages.tracking_stage(flows, H, W, out, cfg, log=log)

    # stage 3: motion segmentation (skipped with --assume_static)
    if not cfg.assume_static:
        seg_apply = _load_seg_apply(cfg)
        if seg_apply is None:
            log("[pipeline] no segmentation checkpoint; treating scene as static")
        else:
            try:
                with timer.stage("depth"):
                    depths = stages.depth_stage(
                        images, out, cfg, _load_depth_apply(cfg),
                        device_stack=device_stack, log=log
                    )
            except RuntimeError as e:
                log(f"[pipeline] WARNING: {e}; degrading to assume-static")
                depths = None
            if depths is not None:
                with timer.stage("motion_seg"):
                    tracks = stages.motionseg_stage(
                        tracks, depths, (H, W), out, cfg, seg_apply, log=log
                    )

    # stage 4: global SfM
    rec = tracks
    if not cfg.skip_sfm:
        with timer.stage("sfm"):
            rec = stages.sfm_stage(tracks, H, W, out, cfg, names, log=log)
    # intermediate cleanup (run_particlesfm.py:44-45,66-70 semantics): flow and
    # depth directories are large and re-derivable; drop them unless asked
    if not cfg.keep_intermediate:
        import shutil

        for sub in ("optical_flows", "depth"):
            d = out / sub
            if d.is_dir():
                shutil.rmtree(d)
                log(f"[pipeline] removed intermediate {sub}/")
    log(timer.report())
    (out / "timings.txt").write_text(timer.report() + "\n")
    return rec


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    cfg = config_from_args(args)
    jobs = []
    if args.root_dir:  # loop over sequences (run_particlesfm.py:168-176)
        for seq in sorted(Path(args.root_dir).iterdir()):
            img = seq / args.image_folder
            if img.is_dir():
                jobs.append((img, seq / "particlesfm_tpu"))
    elif args.workspace_dir:
        ws = Path(args.workspace_dir)
        jobs.append((ws / args.image_folder, ws / "particlesfm_tpu"))
    elif args.image_dir and args.output_dir:
        jobs.append((Path(args.image_dir), Path(args.output_dir)))
    else:
        print("need --image_dir+--output_dir, --workspace_dir, or --root_dir",
              file=sys.stderr)
        return 2
    for img_dir, out_dir in jobs:
        run_pipeline(img_dir, out_dir, cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
