"""Trajectory motion-segmentation inference: windowing + cross-window label merge.

Mirrors the reference driver (/root/reference/motion_seg/main_motion_segmentation.py):
  - cut the sequence into non-overlapping windows of `window_size`, with the last
    window realigned to the sequence end (load_cut_seq.py:64-72);
  - per window, take trajectories with >= min_length observations inside, capped
    at traj_max_num (trajectory_base.cpp:150-154);
  - run the model, threshold sigmoid at 0.5 (main_motion_segmentation.py:80);
  - merge per-window labels back per trajectory over its observation frames
    (main_motion_segmentation.py:98-112).

Windows are independent, so they batch together and shard data-parallel over
the device mesh.
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..tracks.store import TrackArrays, sample_inside_window


def cut_windows(num_frames: int, window_size: int) -> List[np.ndarray]:
    """Non-overlapping windows; last window realigned to the end."""
    if num_frames <= window_size:
        return [np.arange(num_frames)]
    starts = list(range(0, num_frames - window_size + 1, window_size))
    if starts[-1] + window_size < num_frames:
        starts.append(num_frames - window_size)
    return [np.arange(s, s + window_size) for s in starts]


def _run_windows(apply_fn, traj, depth, valid, mesh):
    """One batched forward over [B, K, L] (window axis mesh-sharded if given)."""
    if mesh is not None:
        from ..parallel.mesh import shard_frames

        dtraj, _ = shard_frames(traj, mesh)
        ddepth, _ = shard_frames(depth, mesh)
        dvalid, nb = shard_frames(valid, mesh)
        return np.asarray(apply_fn(dtraj, ddepth, dvalid))[:nb]
    return np.asarray(
        apply_fn(jnp.asarray(traj), jnp.asarray(depth), jnp.asarray(valid))
    )


def segment_tracks(
    apply_fn: Callable,
    tracks: TrackArrays,
    depth_maps: np.ndarray,        # [T, H, W] relative depth in [0, 1] (model res)
    image_hw: Tuple[int, int],     # original image resolution (for normalization)
    window_size: int = 10,
    traj_max_num: int = 100_000,
    min_length: int = 3,
    threshold: float = 0.5,
    seed: int = 0,
    mesh=None,
    max_cells: int = 65536,        # max windows x tracks per device call
    log=None,
) -> TrackArrays:
    """Label every track observation as static (0) / dynamic (1).

    apply_fn(traj [B,K,L,2], depth [B,L,h,w], valid [B,K,L]) -> logits [B,K].
    All windows are stacked into ONE batched call (track axis padded to the
    widest window) and the window axis is sharded data-parallel over `mesh`
    when given — replacing the reference's one-window-per-forward GPU loop
    (main_motion_segmentation.py:60-96). Returns TrackArrays with `labels`.
    """
    import time as _time

    H, W = image_hw
    T = tracks.num_frames
    labels = np.zeros((tracks.num_tracks, T), np.int8)
    rng = np.random.default_rng(seed)

    _t0 = _time.perf_counter()
    wins, samples = [], []
    for win in cut_windows(T, window_size):
        locs, present, rows = sample_inside_window(
            tracks, win, min_length=min_length, max_num_tracks=traj_max_num, rng=rng
        )
        if len(rows) == 0:
            continue
        wins.append(win)
        samples.append((locs, present, rows))
    if not wins:
        return TrackArrays(xy=tracks.xy, mask=tracks.mask, labels=labels)

    kmax = max(s[0].shape[0] for s in samples)
    B, L = len(wins), len(wins[0])
    # u16 fixed-point normalized coordinates when the apply fn supports them
    # (pipeline/run.py sets accepts_u16; rescale by 1/65535 happens on
    # device): half the H2D bytes of f32 — the tunneled chip uploads at
    # ~4 MB/s and a protocol-scale call moves ~40 MB of trajectories.
    # 1/65535 of the frame is ~0.016 px, far below classifier sensitivity.
    u16 = bool(getattr(apply_fn, "accepts_u16", False))
    traj = np.zeros((B, kmax, L, 2), np.uint16 if u16 else np.float32)
    valid = np.zeros((B, kmax, L), bool)
    norm = np.array([W, H], np.float32)
    for b, (locs, present, _rows) in enumerate(samples):
        k = locs.shape[0]
        if u16:
            traj[b, :k] = np.clip(np.round(locs * (65535.0 / norm)), 0, 65535)
        else:
            traj[b, :k] = locs / norm
        valid[b, :k] = present
    depth = depth_maps[np.stack(wins)]                       # [B, L, h, w]

    # OANet activations cost ~64 KB of HBM per trajectory slot; a protocol-
    # scale call (5 windows x 100k tracks) would demand ~32 GB. Chunk the
    # track axis to bound peak memory: the order-aware context (diff_pool soft
    # clusters) is computed per chunk, statistically equivalent for any
    # multi-thousand-track sample. Chunks are padded to one shape (one compile).
    _t1 = _time.perf_counter()
    chunk = max(1024, max_cells // max(B, 1))
    scan_chunks = getattr(apply_fn, "scan_chunks", None)
    n_mesh_dev = (1 if mesh is None else
                  int(np.prod([mesh.shape[a] for a in mesh.axis_names])))
    if kmax > chunk:
        nch = -(-kmax // chunk)
        pad_k = nch * chunk - kmax
        traj = np.pad(traj, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        valid = np.pad(valid, ((0, 0), (0, pad_k), (0, 0)))
        if scan_chunks is not None and n_mesh_dev == 1:
            # single device: all chunks in one dispatch (scan over the chunk
            # axis inside the jit) — saves nch-1 tunnel round-trips
            traj_c = traj.reshape(B, nch, chunk, L, 2).transpose(1, 0, 2, 3, 4)
            valid_c = valid.reshape(B, nch, chunk, L).transpose(1, 0, 2, 3)
            logits = np.asarray(scan_chunks(
                jnp.asarray(traj_c), jnp.asarray(depth), jnp.asarray(valid_c)))
            logits = logits.transpose(1, 0, 2).reshape(B, nch * chunk)[:, :kmax]
        else:
            parts = []
            for c in range(nch):
                sl = slice(c * chunk, (c + 1) * chunk)
                parts.append(_run_windows(apply_fn, traj[:, sl], depth,
                                          valid[:, sl], mesh))
            logits = np.concatenate(parts, axis=1)[:, :kmax]
    else:
        logits = _run_windows(apply_fn, traj, depth, valid, mesh)
    dyn_all = np.asarray(jax.nn.sigmoid(jnp.asarray(logits))) > threshold  # [B, kmax]
    _t2 = _time.perf_counter()
    if log is not None:
        log(f"[motionseg] window-sample {_t1 - _t0:.1f}s, forward "
            f"{_t2 - _t1:.1f}s ({-(-kmax // chunk) if kmax > chunk else 1} "
            f"chunks of {min(chunk, kmax)} x {B} windows)")

    for b, (locs, present, rows) in enumerate(samples):
        k = locs.shape[0]
        dyn = dyn_all[b, :k]
        # write the window label onto each observation frame of each trajectory
        obs = present & dyn[:, None]
        frame_cols = np.broadcast_to(wins[b][None, :], present.shape)
        labels[rows[:, None], frame_cols] = np.where(
            obs, 1, labels[rows[:, None], frame_cols]
        )
    return TrackArrays(xy=tracks.xy, mask=tracks.mask, labels=labels)
