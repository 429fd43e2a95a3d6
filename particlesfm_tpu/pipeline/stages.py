"""Pipeline stages with the reference's on-disk contracts + skip-exists restart.

Stage sequencing mirrors /root/reference/run_particlesfm.py:99-119
(flow -> trajectories -> motion seg -> sfm), with the same inter-stage file
contracts (SURVEY.md §1): Middlebury .flo flow dirs, track files, 16-bit depth
PNGs, COLMAP model output — so each stage can consume outputs produced by the
reference and vice versa. `--skip_exists` short-circuits a stage when its output
already exists (run_particlesfm.py:136 semantics).
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..io import flo as flo_io
from ..io.images import read_depth_png16, write_depth_png16
from ..ops.flow_ops import flow_check
from ..tracks.engine import TrackerConfig, run_tracker
from ..tracks.store import TrackArrays, assemble_tracks
from ..utils.config import Config
from ..sfm import (
    compute_model_stats,
    format_model_stats,
    run_global_mapper,
    write_colmap_model,
    write_converted_outputs,
)


def _flow_dir_complete(d: Path, expected: int) -> bool:
    return d.is_dir() and len(list(d.glob("*.flo"))) >= expected


def _write_flow_selfcal(result, height, width, out_dir: Path, cfg, log):
    """Self-calibrate the shared focal from the flow stack -> selfcal.json.

    Runs at the flow stage because flow-level correspondences measure focal
    better than tracker output (path consistency compounds per-step flow bias
    over track length); the SfM stage consumes the JSON as its focal prior."""
    p = Path(out_dir) / "selfcal.json"
    if not cfg.flow.selfcal or "flow_f" not in result:
        return
    if cfg.skip_exists and p.exists():
        return
    import json

    from ..globalsfm.selfcal import estimate_focal_from_flows

    info = estimate_focal_from_flows(result, height, width, seed=0)
    p.write_text(json.dumps(info, indent=2))
    log(f"[flow] self-calibrated focal {info['focal']:.1f} "
        f"(conf {info['confidence']:.2f}, dip {info['dip']:.2f}, "
        f"n {info['num_pairs']})")


def read_flow_selfcal(out_dir: Path, cfg) -> Optional[tuple]:
    """Focal from the flow stage's selfcal.json, if present and trustworthy.

    Returns (focal, bound_frac) — bound_frac is the BA focal trust-region
    half-width the estimate's quality earns — or None when untrustworthy."""
    p = Path(out_dir) / "selfcal.json"
    if not getattr(cfg.sfm, "selfcal_focal", True) or not p.exists():
        return None
    import json

    info = json.loads(p.read_text())
    # AND of all quality signals: measured on degenerate scenes (downward-
    # looking pure translation over a near-planar surface), either signal
    # alone admits a confidently wrong estimate; together they reject every
    # degenerate case seen while keeping the well-conditioned ones
    ok = (
        info.get("interior", True)
        and info.get("num_pairs", 0) >= cfg.sfm.selfcal_min_pairs
        and info.get("dip", 1.0) <= cfg.sfm.selfcal_max_dip
        and info.get("confidence", 0.0) >= cfg.sfm.selfcal_min_conf
    )
    if ok:
        return float(info["focal"]), 0.15
    # marginal tier (round-5): a shallow-dip estimate with decent per-pair
    # agreement is still far better than the 1.2*max(h,w) heuristic — all 13
    # acceptance selfcals landed within 5.5% of GT focal, including the one
    # the dip gate rejected (round-4 seq_05: dip 0.57, focal -1.0% of GT,
    # heuristic prior +11% -> ATE 0.18). Accept it as the prior but hand BA a
    # WIDER trust region so a genuinely bad marginal estimate can be escaped.
    marginal = (
        info.get("interior", True)
        and info.get("num_pairs", 0) >= cfg.sfm.selfcal_min_pairs
        and info.get("dip", 1.0) <= 0.8
        and info.get("confidence", 0.0) >= 0.5
    )
    if marginal:
        return float(info["focal"]), 0.30
    return None


def upload_frame_stack(images: np.ndarray):
    """Upload the uint8 frame stack ONCE per sequence (the tunnel moves H2D
    data at ~4 MB/s; a 48-frame protocol stack is 64 MB ~ 15 s, and flow +
    depth each need it — run_pipeline shares one upload between them)."""
    return jax.device_put(
        jnp.asarray(np.clip(np.round(np.asarray(images)), 0, 255), jnp.uint8))


def flow_stage(
    images: np.ndarray,            # [T, H, W, 3] float32
    out_dir: Path,
    cfg: Config,
    raft_apply: Optional[Callable] = None,   # (img1s, img2s) -> flows [N, H, W, 2]
    device_stack=None,             # optional pre-uploaded uint8 stack (device)
    log=print,
):
    """Pairwise forward/backward flow at stride 1 (and 2 unless disabled).

    Writes flow_f/, flow_b/ (+ flow_f2/, flow_b2/) of .flo files — the
    reference's RAFT-stage contract (run_particlesfm.py:31-36). If the flow
    directories already exist (e.g. produced by the reference's RAFT), they are
    reused; otherwise `raft_apply` must be provided (native RAFT inference,
    batched over the pair axis and data-parallel over the device mesh —
    flow/infer.load_flow_apply_sharded — instead of the reference's
    sequential per-pair GPU loop).
    """
    T = images.shape[0]
    use_pc = not cfg.track.skip_path_consistency
    dirs = {"flow_f": 1, "flow_b": -1}
    if use_pc:
        dirs.update({"flow_f2": 2, "flow_b2": -2})
    flow_root = Path(out_dir) / "optical_flows"
    result = {}
    todo = []                      # (name, stride, dir, npairs) still to compute
    for name, stride in dirs.items():
        d = flow_root / name
        npairs = T - abs(stride)
        if cfg.skip_exists and _flow_dir_complete(d, npairs):
            log(f"[flow] {name}: reusing {npairs} existing .flo files")
            # slice to exactly npairs: stale extra files from a previous longer
            # run of the same output dir must not desynchronize pair indexing
            stack = np.stack(
                [flo_io.read_flo(p) for p in sorted(d.glob("*.flo"))[:npairs]]
            )
            H, W = images.shape[1], images.shape[2]
            if stack.shape != (npairs, H, W, 2):
                raise RuntimeError(
                    f"flow stage: {d} holds flow of shape {stack.shape[1:3]}, "
                    f"expected {(H, W)} for {npairs} pairs — stale flow dir?"
                )
            result[name] = stack
            continue
        todo.append((name, stride, d, npairs))
    if not todo:
        _write_flow_selfcal(result, images.shape[1], images.shape[2],
                            out_dir, cfg, log)
        return result
    if raft_apply is None:
        raise RuntimeError(
            f"flow stage: no precomputed flow at {flow_root} and no RAFT "
            "weights provided (pass --raft_ckpt or precompute flow)"
        )
    # Device-resident pipeline: the uint8 frame stack uploads ONCE (the
    # tunneled TPU moves H2D data at tens of MB/s, so re-sending f32 pair
    # images costs more than the net), pairs are indexed on device, and flow
    # stays on device through refinement/selfcal; the .flo copies come back
    # as one async f16 D2H per direction.
    if callable(device_stack):   # lazy memoizing thunk from run_pipeline
        device_stack = device_stack()
    stack_u8 = (device_stack if device_stack is not None
                else upload_frame_stack(images))
    # ONE batched stream over every direction: the pair-indexed apply
    # processes a flat pair list in fixed-size device blocks, so fusing the
    # 4 directions packs full blocks (the reference runs 4 sequential
    # per-pair GPU loops, run_particlesfm.py:31-36)
    ia_all, ib_all = [], []
    for name, stride, d, npairs in todo:
        ia = np.arange(npairs) + (0 if stride > 0 else abs(stride))
        ib = np.arange(npairs) + (abs(stride) if stride > 0 else 0)
        ia_all.append(ia)
        ib_all.append(ib)
    import time as _time

    _t0 = _time.perf_counter()
    flows_all = raft_apply(
        stack_u8, np.concatenate(ia_all), np.concatenate(ib_all))
    jax.block_until_ready(flows_all)
    log(f"[flow] net+refine: {_time.perf_counter() - _t0:.1f}s for "
        f"{flows_all.shape[0]} pairs")
    off = 0
    computed = set()
    for name, stride, d, npairs in todo:
        result[name] = flows_all[off:off + npairs]
        off += npairs
        computed.add(name)

    # photometric sub-pixel refinement (flow/refine.py): pull each freshly
    # computed flow vector to its photometric optimum on the actual image pair
    # — removes the net's spatially structured sub-pixel bias that metric SfM
    # would otherwise inherit. External (reused) flow is respected as-is.
    # When the apply fn already fuses the refinement into its per-block jit
    # (load_flow_apply_pairs refine_schedule), this standalone pass is skipped.
    if cfg.flow.photometric_refine:
        # mixed reuse/compute runs: reused directions are external data and
        # are respected as-is — say so instead of implying uniform treatment
        reused = [n for n in result if n not in computed]
        if reused:
            log(f"[flow] NOTE: flow reused from disk ({', '.join(reused)}) "
                "bypasses photometric refinement (external flow respected "
                "as-is)")
    if cfg.flow.photometric_refine and getattr(raft_apply, "refines", False):
        log(f"[flow] photometric refinement fused into inference "
            f"(schedule {cfg.flow.refine_schedule})")
    elif cfg.flow.photometric_refine:
        from ..flow.refine import photometric_refine_scheduled

        B = 8

        @jax.jit
        def _prep(stack, idx):
            return stack[idx].astype(jnp.float32) / 255.0

        for (name, stride, d, npairs), ia, ib in zip(todo, ia_all, ib_all):
            fl = result[name]
            out = []
            for s in range(0, npairs, B):
                a, b = ia[s:s + B], ib[s:s + B]
                f0 = fl[s:s + B]
                pad = B - f0.shape[0]
                if pad:  # pad the tail chunk to avoid a second compile
                    a = np.concatenate([a, np.repeat(a[-1:], pad)])
                    b = np.concatenate([b, np.repeat(b[-1:], pad)])
                    f0 = jnp.concatenate([f0, jnp.repeat(f0[-1:], pad, 0)])
                ref = photometric_refine_scheduled(
                    _prep(stack_u8, jnp.asarray(a)),
                    _prep(stack_u8, jnp.asarray(b)), f0,
                    schedule=cfg.flow.refine_schedule,
                    max_total=cfg.flow.refine_max_total_px,
                )
                out.append(ref[:B - pad] if pad else ref)
            result[name] = jnp.concatenate(out) if len(out) > 1 else out[0]
            log(f"[flow] {name}: photometric refinement "
                f"(schedule {cfg.flow.refine_schedule})")

    # stride-2 safety net (see FlowConfig.stride2_compose_disagree_px): only
    # for freshly computed stride-2 — externally supplied flow is respected
    tau = cfg.flow.stride2_compose_disagree_px
    if tau > 0 and use_pc:
        from ..ops.flow_ops import stride2_compose_fallback

        for name2, hop in (("flow_f2", "flow_f"), ("flow_b2", "flow_b")):
            if name2 not in computed or hop not in result:
                continue
            f1 = result[hop]
            if name2 == "flow_f2":
                # pair i: i -> i+2 = (i -> i+1) then (i+1 -> i+2)
                a, b = f1[:-1], f1[1:]
            else:
                # backward pair i: i+2 -> i = (i+2 -> i+1) then (i+1 -> i)
                a, b = f1[1:], f1[:-1]
            blended, used = stride2_compose_fallback(
                jnp.asarray(result[name2]), jnp.asarray(a), jnp.asarray(b),
                disagree_px=tau,
            )
            frac = float(jnp.mean(used.astype(jnp.float32)))
            if frac > 0:
                log(f"[flow] {name2}: composed-stride-1 fallback on "
                    f"{100 * frac:.1f}% of pixels")
            result[name2] = np.asarray(blended)

    # .flo contract writes, only when the files will outlive the run: the
    # pipeline's own consumers (tracker/selfcal/seg) read the device-resident
    # arrays directly, and run_pipeline deletes optical_flows/ at the end
    # unless --keep_intermediate (run_particlesfm.py:44-45 semantics) — so
    # without that flag the D2H (~330 MB through the tens-of-MB/s tunnel) and
    # file writes would be pure waste. With the flag: one async f16 D2H per
    # direction (half the bytes; f16 quantization is <=0.06 px at these flow
    # ranges, far under the net's EPE), overlapped with the selfcal work.
    _t0 = _time.perf_counter()
    fetching = []
    if cfg.keep_intermediate:
        for name, stride, d, npairs in todo:
            if not isinstance(result[name], np.ndarray):
                buf = result[name].astype(jnp.float16)
                try:
                    buf.copy_to_host_async()
                except Exception:
                    pass
                fetching.append((name, d, npairs, buf))
            else:
                fetching.append((name, d, npairs, result[name]))
    _write_flow_selfcal(result, images.shape[1], images.shape[2],
                        out_dir, cfg, log)
    log(f"[flow] selfcal: {_time.perf_counter() - _t0:.1f}s")
    for name, d, npairs, buf in fetching:
        d.mkdir(parents=True, exist_ok=True)
        flows = np.asarray(buf, np.float32)
        for i in range(npairs):
            flo_io.write_flo(d / f"{i:06d}.flo", flows[i])
        log(f"[flow] {name}: computed {npairs} pairs (batched)")
    if not fetching:
        for name, stride, d, npairs in todo:
            log(f"[flow] {name}: computed {npairs} pairs (batched, in-memory)")
    return result


def tracking_stage(
    flows: dict,
    height: int,
    width: int,
    out_dir: Path,
    cfg: Config,
    log=print,
) -> TrackArrays:
    """Occlusion checks + scan tracker + path consistency -> padded tracks.

    Output: trajectories/tracks.npz (+ reference-format track dict via
    TrackArrays.to_reference_dict for interop)."""
    traj_dir = Path(out_dir) / "trajectories"
    traj_path = traj_dir / "tracks.npz"
    if cfg.skip_exists and traj_path.exists():
        log("[tracks] reusing existing tracks.npz")
        return TrackArrays.load(traj_path)
    traj_dir.mkdir(parents=True, exist_ok=True)

    import time as _time

    t0 = _time.perf_counter()
    ff = jnp.asarray(flows["flow_f"])
    fb = jnp.asarray(flows["flow_b"])
    occ, _ = flow_check(ff, fb, cfg.track.flow_check_thres)
    use_pc = "flow_f2" in flows
    if use_pc:
        ff2 = jnp.asarray(flows["flow_f2"])
        fb2 = jnp.asarray(flows["flow_b2"])
        occ2, _ = flow_check(ff2, fb2, cfg.track.flow_check_thres)
    else:
        ff2, occ2 = None, None

    tcfg = TrackerConfig(
        sample_ratio=cfg.track.sample_ratio,
        capacity=cfg.track.capacity,
        path_consistency=use_pc,
    )
    out = run_tracker(ff, occ, ff2, occ2, tcfg, height, width)
    jax.block_until_ready(out.positions)
    t1 = _time.perf_counter()
    tracks = assemble_tracks(out, min_len=cfg.track.traj_min_len)
    t2 = _time.perf_counter()
    tracks.save(traj_path)
    log(f"[tracks] scan {t1 - t0:.1f}s, fetch+assemble {t2 - t1:.1f}s, "
        f"save {_time.perf_counter() - t2:.1f}s")
    log(f"[tracks] {tracks.num_tracks} tracks over {tracks.num_frames} frames "
        f"(overflow={int(out.overflow)})")
    return tracks


def depth_stage(
    images: np.ndarray,
    out_dir: Path,
    cfg: Config,
    depth_apply: Optional[Callable] = None,   # (imgs [N,H,W,3]) -> [N, H, W]
    device_stack=None,             # optional pre-uploaded uint8 stack (device)
    log=print,
) -> np.ndarray:
    """Per-frame relative depth, 16-bit PNG contract (run_midas parity)."""
    d = Path(out_dir) / "depth"
    T = images.shape[0]
    existing = sorted(d.glob("*.png")) if d.is_dir() else []
    # reuse precomputed PNGs under --skip_exists, or unconditionally when no
    # depth net is available (they are the only possible depth source then)
    if len(existing) >= T and (cfg.skip_exists or depth_apply is None):
        log(f"[depth] reusing {T} existing depth PNGs")
        return np.stack([read_depth_png16(p) for p in existing[:T]])
    if depth_apply is None:
        raise RuntimeError(
            f"depth stage: no precomputed depth at {d} and no depth weights provided"
        )
    if callable(device_stack):   # lazy memoizing thunk from run_pipeline
        device_stack = device_stack()
    deps = np.asarray(depth_apply(
        images if device_stack is None else device_stack
    ))   # batched + normalized on device
    # 16-bit PNG contract writes only when the files outlive the run
    # (run_pipeline deletes depth/ at the end unless --keep_intermediate);
    # the seg stage consumes the in-memory array either way
    if cfg.keep_intermediate:
        d.mkdir(parents=True, exist_ok=True)
        for i in range(T):
            write_depth_png16(d / f"{i:06d}.png", deps[i])
    log(f"[depth] computed {T} frames (batched)")
    return deps


def motionseg_stage(
    tracks: TrackArrays,
    depths: np.ndarray,
    image_hw,
    out_dir: Path,
    cfg: Config,
    seg_apply: Optional[Callable] = None,
    log=print,
) -> TrackArrays:
    """Label tracks dynamic/static; writes trajectories_labeled/tracks.npz."""
    labeled_path = Path(out_dir) / "trajectories_labeled" / "tracks.npz"
    if cfg.skip_exists and labeled_path.exists():
        log("[motionseg] reusing existing labeled tracks")
        return TrackArrays.load(labeled_path)
    if seg_apply is None:
        raise RuntimeError("motion-seg stage: no segmentation weights provided")
    from ..motionseg import segment_tracks
    from ..parallel.mesh import make_mesh

    # decision threshold: checkpoint-calibrated value (sidecar) unless the
    # config was explicitly overridden away from the reference default 0.5
    thr = cfg.motionseg.threshold
    side = getattr(seg_apply, "threshold", None)
    if side is not None and abs(thr - 0.5) < 1e-9:
        thr = float(side)
        log(f"[motionseg] using checkpoint-calibrated threshold {thr}")
    labeled = segment_tracks(
        seg_apply, tracks, depths, image_hw,
        window_size=cfg.motionseg.window_size,
        traj_max_num=cfg.motionseg.traj_max_num,
        threshold=thr,
        mesh=make_mesh(),       # windows shard data-parallel over all devices
        log=log,
    )
    labeled_path.parent.mkdir(parents=True, exist_ok=True)
    labeled.save(labeled_path)
    frac = float(labeled.labels[labeled.mask].mean()) if labeled.mask.any() else 0.0
    log(f"[motionseg] dynamic fraction: {frac:.3f}")
    return labeled


def sfm_stage(
    tracks: TrackArrays,
    height: int,
    width: int,
    out_dir: Path,
    cfg: Config,
    image_names=None,
    log=print,
):
    """Global SfM -> COLMAP model + converted outputs + stats (main_sfm parity)."""
    model_dir = Path(out_dir) / "sfm" / "model"
    if cfg.skip_exists and (model_dir / "images.bin").exists():
        log("[sfm] reusing existing model")
        return None
    # focal prior: flow-stage self-calibration beats both the heuristic prior
    # and track-level estimation (see _write_flow_selfcal)
    params = None
    bound_frac = None
    cal = read_flow_selfcal(out_dir, cfg)
    if cal is not None:
        from ..geometry import cameras as _cams

        f_cal, bound_frac = cal
        params = np.asarray(
            _cams.make_default_params(height, width), np.float32).copy()
        log(f"[sfm] focal prior from flow self-calibration: {f_cal:.1f} "
            f"(heuristic {params[0]:.1f}, BA trust region +-{bound_frac:.0%})")
        params[0] = params[1] = f_cal
    # sfm_type dispatch (run_particlesfm.py:73-97): global (gmapper/Theia
    # parity, default), incremental (colmap-mapper parity), glomap (direct
    # global positioning over bearings — handled inside run_global_mapper)
    if cfg.sfm.sfm_type == "incremental":
        # reference parity: colmap mapper runs with multiple_models=0
        from ..sfm.incremental import run_incremental_mapper as _run

        rec = _run(tracks, height, width, cfg.sfm, params=params, log=log)
        write_colmap_model(rec, model_dir, image_names)
    elif cfg.sfm.multiple_models:
        from ..sfm.manager import run_reconstruction_manager, write_models

        models = run_reconstruction_manager(
            tracks, height, width, cfg.sfm, max_models=cfg.sfm.max_models,
            params=params, log=log, focal_bound_frac=bound_frac
        )
        rec = write_models(models, model_dir, image_names, log=log)
        if rec is None:
            from ..sfm.mapper import _failed
            from ..geometry import cameras as _cams

            rec = _failed(
                tracks.num_frames,
                np.asarray(_cams.make_default_params(height, width), np.float32),
                height, width,
            )
            write_colmap_model(rec, model_dir, image_names)
    else:
        from ..sfm.mapper import run_global_mapper as _run

        rec = _run(tracks, height, width, cfg.sfm, params=params, log=log,
                   focal_bound_frac=bound_frac)
        write_colmap_model(rec, model_dir, image_names)
    write_converted_outputs(rec, Path(out_dir) / "colmap_outputs_converted", image_names)
    stats = compute_model_stats(rec)
    log(format_model_stats(stats))
    with open(Path(out_dir) / "sfm" / "stats.txt", "w") as f:
        f.write(format_model_stats(stats) + "\n")
    return rec
