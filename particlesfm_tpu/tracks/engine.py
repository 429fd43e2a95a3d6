"""Dense point-trajectory engine as one `lax.scan` over frames.

TPU-native replacement for the reference's Python/C++ object tracker
(/root/reference/point_trajectory/track.py, track_optimize.py, trajectory.py):

- trajectories live in a fixed-capacity slot pool (arrays [C]) instead of Python
  lists of objects; births/deaths are mask updates + rank-based slot allocation;
- density control is the exact predicate `EDT(occupied) > sample_ratio`, computed
  as a disc convolution (ops/density.py) instead of scipy's host EDT;
- per-frame path-consistency optimization is a vmapped LM solve (tracks/optimize.py)
  instead of a Ceres problem per frame;
- the scan emits per-frame (position, traj_id, valid) rows; trajectories are
  reassembled into padded track tensors on the host (tracks/store.py).

Behavioral contract per frame f (mirrors track_optimize.py:31-50):
  1. spawn new trajectories on all currently-free grid cells (time f);
  2. sample stride-1 flow at active heads, step to time f+1; kill on occlusion
     (sampled occ > 0.1) or out-of-bounds (0 < x < W-1 strictly);
  3. build occupancy from surviving (truncated) new positions; next frame's free
     cells are those with no occupied pixel within Euclidean distance sample_ratio;
  4. for trajectories with >=3 buffered positions, jointly refine positions at
     times (f, f+1) against flow01/flow02 anchors and the flow12 map.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.density import free_cell_mask
from ..ops.sampling import bilinear_sample
from .optimize import optimize_locations


@dataclass(frozen=True)
class TrackerConfig:
    sample_ratio: int = 2
    capacity: int = 1 << 17
    path_consistency: bool = True
    upper_flow: float = 20.0   # flow02 anchor gate (trajectory.py:179)
    gn_iters: int = 12
    patch_lm: bool = True      # gather-free patch sampling inside the LM loop


class TrackerOutput(NamedTuple):
    positions: jnp.ndarray   # [T+1, C, 2] position of slot's trajectory at time t
    traj_ids: jnp.ndarray    # [T+1, C] int32, -1 where invalid
    valid: jnp.ndarray       # [T+1, C] bool
    num_trajs: jnp.ndarray   # scalar int32
    overflow: jnp.ndarray    # scalar int32 — spawns dropped due to pool overflow


class _State(NamedTuple):
    pos: jnp.ndarray         # [C, 2] position at tail time
    prev1: jnp.ndarray       # [C, 2] position one frame back
    prev2: jnp.ndarray       # [C, 2] position two frames back
    active: jnp.ndarray      # [C] bool
    traj_id: jnp.ndarray     # [C] int32
    start_time: jnp.ndarray  # [C] int32
    next_id: jnp.ndarray     # scalar int32
    cand_mask: jnp.ndarray   # [G] bool — flattened free-cell mask for next spawn
    overflow: jnp.ndarray    # scalar int32


def _candidate_grid(height: int, width: int, ratio: int) -> jnp.ndarray:
    """Flattened candidate cell centers [(H//ratio+..)* .., 2] in row-major order,
    matching the reference's xys[::ratio, ::ratio] sampling (trajectory.py:108-113)."""
    ys = jnp.arange(0, height, ratio, dtype=jnp.float32)
    xs = jnp.arange(0, width, ratio, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(xs, ys)
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


@partial(jax.jit, static_argnames=("cfg", "height", "width"))
def run_tracker(
    flows: jnp.ndarray,          # [T, H, W, 2] stride-1 forward flow
    occs: jnp.ndarray,           # [T, H, W] stride-1 occlusion masks
    flows2: Optional[jnp.ndarray],  # [T-1, H, W, 2] stride-2 forward flow (or None)
    occs2: Optional[jnp.ndarray],   # [T-1, H, W] stride-2 occlusion masks (or None)
    cfg: TrackerConfig,
    height: int,
    width: int,
) -> TrackerOutput:
    T = flows.shape[0]
    C = cfg.capacity
    ratio = cfg.sample_ratio
    cand_xy = _candidate_grid(height, width, ratio)  # [G, 2]
    G = cand_xy.shape[0]
    use_pc = cfg.path_consistency and flows2 is not None
    if not use_pc:
        # uniform scan signature: dummy stride-2 inputs, never read
        flows2 = jnp.zeros((1, 1, 1, 2), flows.dtype)
        occs2 = jnp.zeros((1, 1, 1), flows.dtype)

    init = _State(
        pos=jnp.zeros((C, 2), jnp.float32),
        prev1=jnp.zeros((C, 2), jnp.float32),
        prev2=jnp.zeros((C, 2), jnp.float32),
        active=jnp.zeros((C,), bool),
        traj_id=jnp.full((C,), -1, jnp.int32),
        start_time=jnp.zeros((C,), jnp.int32),
        next_id=jnp.zeros((), jnp.int32),
        cand_mask=jnp.ones((G,), bool),
        overflow=jnp.zeros((), jnp.int32),
    )

    def step(state: _State, f):
        flow_map = jax.lax.dynamic_index_in_dim(flows, f, keepdims=False)
        occ_map = jax.lax.dynamic_index_in_dim(occs, f, keepdims=False)

        # --- 1. spawn on free candidate cells -------------------------------
        free = ~state.active
        num_free = jnp.sum(free.astype(jnp.int32))
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        slot_of_rank = jnp.full((C,), C, jnp.int32).at[
            jnp.where(free, free_rank, C)
        ].set(jnp.arange(C, dtype=jnp.int32), mode="drop")

        cand = state.cand_mask
        cand_rank = jnp.cumsum(cand.astype(jnp.int32)) - 1
        num_cand = jnp.sum(cand.astype(jnp.int32))
        spawnable = cand & (cand_rank < num_free)
        target = jnp.where(spawnable, slot_of_rank[jnp.clip(cand_rank, 0, C - 1)], C)

        pos = state.pos.at[target].set(cand_xy, mode="drop")
        traj_id = state.traj_id.at[target].set(state.next_id + cand_rank, mode="drop")
        start_time = state.start_time.at[target].set(f, mode="drop")
        active = state.active.at[target].set(True, mode="drop")
        spawned_now = jnp.zeros((C,), bool).at[target].set(True, mode="drop")
        next_id = state.next_id + jnp.minimum(num_cand, num_free)
        overflow = state.overflow + jnp.maximum(num_cand - num_free, 0)

        # --- 2. step heads by flow, kill on occlusion / out-of-bounds -------
        flow_at = bilinear_sample(flow_map, pos)
        occ_at = bilinear_sample(occ_map[..., None], pos)[..., 0]
        nxt = pos + flow_at
        inb = (
            (nxt[:, 0] > 0) & (nxt[:, 0] < width - 1)
            & (nxt[:, 1] > 0) & (nxt[:, 1] < height - 1)
        )
        survive = active & inb & (occ_at <= 0.1)

        # --- 3. occupancy of surviving new positions -> next candidates -----
        ix = jnp.where(survive, nxt[:, 0].astype(jnp.int32), width)
        iy = jnp.where(survive, nxt[:, 1].astype(jnp.int32), height)
        occupied = jnp.zeros((height, width), jnp.float32).at[iy, ix].set(1.0, mode="drop")
        cand_next = free_cell_mask(occupied, float(ratio))[::ratio, ::ratio].reshape(-1) > 0

        # --- shift history buffers for survivors -----------------------------
        prev2 = jnp.where(survive[:, None], state.prev1, state.prev2)
        prev1 = jnp.where(survive[:, None], pos, state.prev1)
        new_pos = jnp.where(survive[:, None], nxt, pos)

        # --- 4. path-consistency refinement of times (f, f+1) ---------------
        if use_pc:
            eligible = survive & (start_time <= f - 1)
            fprev = jnp.maximum(f - 1, 0)
            flow01 = jax.lax.dynamic_index_in_dim(flows, fprev, keepdims=False)
            flow02 = jax.lax.dynamic_index_in_dim(flows2, fprev, keepdims=False)
            occ02 = jax.lax.dynamic_index_in_dim(occs2, fprev, keepdims=False)
            x0 = prev2
            f01 = bilinear_sample(flow01, x0)
            f02 = bilinear_sample(flow02, x0)
            o02 = bilinear_sample(occ02[..., None], x0)[..., 0]
            uv_ref1 = x0 + f01
            uv_ref2 = x0 + f02
            scale = (1.0 - o02) * (jnp.linalg.norm(f02, axis=-1) < cfg.upper_flow)
            p = jnp.concatenate([prev1, new_pos], axis=-1)
            p_opt = optimize_locations(
                p, uv_ref1, uv_ref2, scale, flow_map,
                mask=eligible.astype(p.dtype), num_iters=cfg.gn_iters,
                patch=cfg.patch_lm,
            )
            prev1 = jnp.where(eligible[:, None], p_opt[:, 0:2], prev1)
            new_pos = jnp.where(eligible[:, None], p_opt[:, 2:4], new_pos)

        # --- emit final positions at time f ----------------------------------
        # survivors: refined prev1 (time f); dying slots: their unstepped head.
        emit_pos = jnp.where(survive[:, None], prev1, pos)
        emit_valid = active
        emit_id = jnp.where(active, traj_id, -1)

        new_state = _State(
            pos=new_pos, prev1=prev1, prev2=prev2,
            active=survive, traj_id=traj_id, start_time=start_time,
            next_id=next_id, cand_mask=cand_next, overflow=overflow,
        )
        return new_state, (emit_pos, emit_id, emit_valid)

    final, (pos_seq, id_seq, valid_seq) = jax.lax.scan(init=init, xs=jnp.arange(T), f=step)

    # final row: positions at time T of still-active trajectories
    last_pos = final.pos[None]
    last_id = jnp.where(final.active, final.traj_id, -1)[None]
    last_valid = final.active[None]
    return TrackerOutput(
        positions=jnp.concatenate([pos_seq, last_pos], axis=0),
        traj_ids=jnp.concatenate([id_seq, last_id], axis=0),
        valid=jnp.concatenate([valid_seq, last_valid], axis=0),
        num_trajs=final.next_id,
        overflow=final.overflow,
    )
