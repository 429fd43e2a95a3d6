"""Device mesh construction + sharding helpers.

The reference's entire parallelism inventory is thread pools and a sequential
per-sequence loop (SURVEY.md §2.11: colmap::ThreadPool per pair, OpenMP, Ceres
threads, single-GPU torch). The TPU-native replacement is one uniform mechanism:
a jax.sharding.Mesh with named axes and NamedShardings, with XLA inserting the
ICI collectives.

Axes used across the framework:
  data  — embarrassingly parallel work items: frames, flow pairs, motion-seg
          windows, RANSAC pair blocks (sequence-parallel in the literal sense);
  model — intra-problem sharding: trajectory/point blocks of the reduced BA
          system, OANet point axis.

Within a pod slice these collectives ride ICI; jax.distributed extends the same
mesh across hosts (DCN between slices) with no code changes here.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axes: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over available devices. Defaults to 1-D 'data' over all."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    n = int(np.prod(shape))
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, tuple(axes))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading dimension over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_frames(x, mesh: Mesh, axis: str = "data"):
    """Device-put an array with its leading (frame/pair/window) dim sharded.

    Pads the leading dim to a multiple of the mesh axis size (XLA requires
    even sharding); returns (sharded_array, original_length)."""
    import jax.numpy as jnp

    n = x.shape[0]
    size = mesh.shape[axis]
    pad = (-n) % size
    if pad:
        x = jnp.concatenate([jnp.asarray(x), jnp.repeat(jnp.asarray(x[-1:]), pad, 0)], 0)
    return jax.device_put(jnp.asarray(x), data_sharding(mesh, x.ndim, axis)), n


def sharded_map_frames(fn, mesh: Mesh, *arrays, axis: str = "data"):
    """jit-map `fn` over the leading axis with data-parallel sharding.

    fn operates on one frame/pair; it is vmapped then jitted with sharded
    in/out specs, so each device processes its shard without communication.
    """
    placed = []
    n = None
    for a in arrays:
        s, n = shard_frames(a, mesh, axis)
        placed.append(s)
    vfn = jax.jit(
        jax.vmap(fn),
        in_shardings=tuple(data_sharding(mesh, a.ndim, axis) for a in placed),
    )
    out = vfn(*placed)
    return jax.tree.map(lambda o: o[:n], out)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host meshes.

    On a pod slice the runtime autodetects everything (call with no args); the
    explicit form covers DCN-connected multi-slice jobs. After this, the same
    make_mesh()/NamedSharding code paths span all hosts — the collectives ride
    ICI within a slice and DCN across slices with no further changes (this is
    the framework's entire 'communication backend', replacing the reference's
    nothing — SURVEY.md §2.11).
    """
    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
