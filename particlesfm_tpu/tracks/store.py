"""Track tensor store: padded trajectory arrays + windowed sampling + file I/O.

Replaces the reference's C++ TrajectorySet container
(/root/reference/point_trajectory/optimize/src/trajectory_base.cpp): since our
engine already produces dense slot arrays, trajectories live as padded tensors
`xy [N, T, 2]` + `mask [N, T]` keyed by absolute frame index — exactly the layout
`sample_inside_window` (trajectory_base.cpp:127-185) had to build from its
object map on every call.

Also provides interop with the reference's labeled on-disk format
(plain dict {traj_id: {"locations", "labels", "frame_ids"}}, written by
motion_seg/main_motion_segmentation.py:121-129).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from .engine import TrackerOutput


@dataclass
class TrackArrays:
    xy: np.ndarray               # [N, T, 2] float32, position at absolute frame t
    mask: np.ndarray             # [N, T] bool, True where observed
    labels: Optional[np.ndarray] = None  # [N, T] int8, 1 = dynamic (after motion seg)

    @property
    def num_tracks(self) -> int:
        return self.xy.shape[0]

    @property
    def num_frames(self) -> int:
        return self.xy.shape[1]

    @property
    def lengths(self) -> np.ndarray:
        return self.mask.sum(axis=1)

    def save(self, path) -> None:
        data = {"xy": self.xy, "mask": self.mask}
        if self.labels is not None:
            data["labels"] = self.labels
        # uncompressed: zlib over the ~120 MB protocol-scale tensors costs
        # 3-6 s of single-thread CPU per write (and this file is written twice
        # per run — raw + labeled); disk is not the constraint
        np.savez(path, **data)

    @classmethod
    def load(cls, path) -> "TrackArrays":
        data = np.load(path)
        return cls(
            xy=data["xy"], mask=data["mask"],
            labels=data["labels"] if "labels" in data.files else None,
        )

    def to_reference_dict(self) -> dict:
        """Export to the reference's labeled track.npy dict format."""
        out = {}
        for i in range(self.num_tracks):
            t = np.nonzero(self.mask[i])[0]
            entry = {
                "locations": self.xy[i, t].astype(np.float64),
                "frame_ids": t.astype(np.int64),
            }
            entry["labels"] = (
                self.labels[i, t].astype(np.int64)
                if self.labels is not None
                else np.zeros(len(t), np.int64)
            )
            out[i] = entry
        return out

    @classmethod
    def from_reference_dict(cls, d: dict, num_frames: Optional[int] = None) -> "TrackArrays":
        n = len(d)
        if num_frames is None:
            num_frames = 1 + max(int(np.max(v["frame_ids"])) for v in d.values())
        xy = np.zeros((n, num_frames, 2), np.float32)
        mask = np.zeros((n, num_frames), bool)
        labels = np.zeros((n, num_frames), np.int8)
        for row, (tid, v) in enumerate(sorted(d.items())):
            t = np.asarray(v["frame_ids"], np.int64)
            xy[row, t] = np.asarray(v["locations"], np.float32)
            mask[row, t] = True
            if "labels" in v:
                labels[row, t] = np.asarray(v["labels"], np.int8)
        return cls(xy=xy, mask=mask, labels=labels)


def assemble_tracks(out: TrackerOutput, min_len: int = 3) -> TrackArrays:
    """Reassemble the scan's per-frame slot emissions into padded track tensors.

    Drops trajectories shorter than min_len, like
    /root/reference/point_trajectory/main_connect_point_trajectories.py:50-55.
    """
    if not isinstance(out.positions, np.ndarray):
        # u16 fixed-point D2H (the tunnel moves D2H at ~10-20 MB/s; the f32
        # [T+1, C, 2] emission plane is ~100 MB at protocol scale): 1/32 px
        # quantization — 0.03 px, an order of magnitude below the flow net's
        # EPE — for half the bytes
        import jax
        import jax.numpy as jnp

        q = jax.jit(
            lambda p: jnp.clip(jnp.round(p * 32.0), 0, 65535).astype(jnp.uint16)
        )(out.positions)
        positions = np.asarray(q).astype(np.float32) * (1.0 / 32.0)
    else:
        positions = np.asarray(out.positions)
    traj_ids = np.asarray(out.traj_ids)
    # the engine emits id=-1 exactly where valid=False, so the valid plane
    # never needs to cross the (slow) device->host link
    valid = traj_ids >= 0
    n = int(out.num_trajs)
    T1 = positions.shape[0]

    tv, cv = np.nonzero(valid)
    ids = traj_ids[tv, cv]
    ok = ids >= 0
    tv, cv, ids = tv[ok], cv[ok], ids[ok]

    xy = np.zeros((n, T1, 2), np.float32)
    mask = np.zeros((n, T1), bool)
    xy[ids, tv] = positions[tv, cv]
    mask[ids, tv] = True

    keep = mask.sum(axis=1) >= min_len
    return TrackArrays(xy=xy[keep], mask=mask[keep])


def sample_inside_window(
    tracks: TrackArrays,
    frame_ids: Sequence[int],
    min_length: int = 3,
    max_num_tracks: int = 100_000,
    rng: Optional[np.random.Generator] = None,
):
    """Padded window view: trajectories with >= min_length observations inside
    the window, randomly capped at max_num_tracks (trajectory_base.cpp:150-154).

    Returns (locations [K, L, 2], present [K, L] bool, traj_indices [K]).
    """
    frame_ids = np.asarray(frame_ids, np.int64)
    sub_mask = tracks.mask[:, frame_ids]  # [N, L]
    counts = sub_mask.sum(axis=1)
    cand = np.nonzero(counts >= min_length)[0]
    if len(cand) > max_num_tracks:
        rng = rng or np.random.default_rng(0)
        cand = rng.permutation(cand)[:max_num_tracks]
        cand.sort()
    locations = tracks.xy[cand][:, frame_ids]
    present = sub_mask[cand]
    locations = locations * present[..., None]
    return locations.astype(np.float32), present, cand
