"""Mesh-sharded bundle adjustment (explicit sparse-Schur communication).

Shards the TRACK axis of the BA problem over the device mesh with shard_map:
each device eliminates its local point blocks (the O(N) work) and only the
reduced camera-system pieces ([V,6,6]-scale) are psum'd over the mesh — the
communication pattern of distributed sparse-Schur BA (cameras replicated,
points partitioned; SURVEY §2.8 TPU plan).

Why not plain GSPMD: bundle_adjust's chunked Schur assembly walks the track
axis with dynamic slices, which GSPMD lowers as all-gathers of the full
[N,K,6,3] tensors when that axis is sharded — measured 6x SLOWER than single
device on an 8-virtual-device mesh. shard_map pins the track axis device-local
and makes every cross-device reduction an explicit psum.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..globalsfm.ba import BAState, _bundle_adjust_impl
from ..globalsfm.tracks3d import TrackObs


def sharded_bundle_adjust(
    mesh: Mesh,
    q, t, params, X, obs: TrackObs, free_mask, point_mask,
    axes: tuple = ("data", "model"),
    **kwargs,
) -> BAState:
    """bundle_adjust with tracks sharded over the given mesh axes.

    Pads the track axis to a multiple of the device count (padded tracks carry
    point_mask=0 and empty obs masks, so they contribute nothing), runs the LM
    loop under shard_map, and returns fully replicated poses plus the sharded
    points gathered back to a single array.
    """
    axes = tuple(a for a in axes if a in mesh.shape)
    nd = int(np.prod([mesh.shape[a] for a in axes])) if axes else 1
    if nd <= 1:
        from ..globalsfm.ba import bundle_adjust

        return bundle_adjust(q, t, params, X, obs, free_mask, point_mask,
                             **kwargs)

    N = X.shape[0]
    pad = (-N) % nd
    if pad:
        X = jnp.pad(X, ((0, pad), (0, 0)))
        point_mask = jnp.pad(point_mask, (0, pad))
        obs = TrackObs(
            frame_idx=jnp.pad(obs.frame_idx, ((0, pad), (0, 0))),
            uv=jnp.pad(obs.uv, ((0, pad), (0, 0), (0, 0))),
            mask=jnp.pad(obs.mask, ((0, pad), (0, 0))),
        )

    def psum_all(x):
        out = x
        for a in axes:
            out = jax.lax.psum(out, a)
        return out

    track = P(axes)
    rep = P()
    fn = shard_map(
        partial(_bundle_adjust_impl, reduce_fn=psum_all, **kwargs),
        mesh=mesh,
        in_specs=(rep, rep, rep, track,
                  TrackObs(frame_idx=track, uv=track, mask=track), rep, track),
        out_specs=BAState(q=rep, t=rep, X=track, params=rep, cost=rep, lam=rep,
                          iters=rep),
        check_rep=False,
    )
    st = jax.jit(fn)(q, t, params, X, obs, free_mask, point_mask)
    if pad:
        st = st._replace(X=st.X[:N])
    return st
