"""Flow-net inference: checkpoint loading, padding, jitted pair apply.

The pipeline-facing counterpart of the reference's RAFT submodule entry points
(`compute_raft_custom_folder`, /root/reference/run_particlesfm.py:31-36): given
a checkpoint, returns `apply(img1, img2) -> flow [H, W, 2]` for arbitrary image
sizes (inputs padded to a multiple of 8 like torch RAFT's InputPadder, flow
cropped back). Checkpoints carry a sidecar JSON with the model configuration so
compact (in-environment-trained) and full (torch-converted) variants load
through one path.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def pad_to_multiple(img, mult: int = 8):
    """Edge-pad [H, W, C] (numpy or jax) to multiples of `mult`; returns
    (padded, (H, W))."""
    H, W = img.shape[0], img.shape[1]
    ph = (-H) % mult
    pw = (-W) % mult
    if ph == 0 and pw == 0:
        return img, (H, W)
    import jax.numpy as jnp

    pad = [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(img, pad, mode="edge"), (H, W)


def model_from_meta(meta: dict):
    from ..models.raft import RAFT, compact_raft

    if meta.get("variant", "compact") == "compact":
        return compact_raft()
    return RAFT()


def save_flow_checkpoint(path, params, variant: str = "compact", extra: dict | None = None):
    from flax.serialization import msgpack_serialize
    import jax

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = {"params": jax.device_get(params)}
    path.write_bytes(msgpack_serialize(blob))
    meta = {"variant": variant}
    meta.update(extra or {})
    Path(str(path) + ".json").write_text(json.dumps(meta, indent=2))


def load_flow_checkpoint(path):
    from flax.serialization import msgpack_restore

    blob = msgpack_restore(Path(path).read_bytes())
    meta_path = Path(str(path) + ".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return blob["params"], meta


def load_flow_apply(ckpt, iters: int = 12):
    """Jitted `apply(img1, img2) -> flow [H, W, 2]` from a checkpoint.

    Images: [H, W, 3] in [0, 255] (any float/uint dtype). The GRU iteration
    count defaults to the checkpoint's training value when recorded.
    """
    import jax
    import jax.numpy as jnp

    params, meta = load_flow_checkpoint(ckpt)
    model = model_from_meta(meta)
    n_iters = int(meta.get("iters", iters))
    params = jax.device_put(params)   # argument, NOT a closure: closed-over
    # weights are baked into the HLO as constants (slow compiles, bloated
    # executables, data-dependent persistent-cache keys)

    @jax.jit
    def _run(params, img1, img2):
        # the flow net does not need the package-global f32-highest matmuls;
        # default (bf16 passes on TPU) keeps the convs on the MXU fast path
        with jax.default_matmul_precision("default"):
            return model.apply({"params": params}, img1, img2, iters=n_iters)

    def apply(img1, img2):
        img1 = jnp.asarray(img1, jnp.float32)
        img2 = jnp.asarray(img2, jnp.float32)
        p1, (H, W) = pad_to_multiple(img1)
        p2, _ = pad_to_multiple(img2)
        return _run(params, p1, p2)[:H, :W]

    return apply


def load_flow_apply_batch(ckpt, iters=None, scale: float = 1.0):
    """Batched `apply(img1s, img2s) -> flows [B, H, W, 2]` (vmapped over pairs;
    under a pjit mesh the leading pair axis shards data-parallel).

    iters=None uses the GRU-iteration count recorded in the checkpoint meta
    (the count the net was validated at); an explicit int always wins.

    scale < 1 runs the net at reduced resolution and bilinearly upsamples the
    (rescaled) flow back to full resolution. The net's correlation lookup is
    gather-bound on TPU (cost ~ pixels x GRU iters; XLA gathers run far below
    HBM bandwidth), so scale=0.5 is ~4x cheaper; the sub-pixel detail lost is
    recovered by the photometric refinement stage, which runs at full
    resolution against the original pair (flow/refine.py)."""
    import jax
    import jax.numpy as jnp

    params, meta = load_flow_checkpoint(ckpt)
    model = model_from_meta(meta)
    n_iters = int(iters) if iters is not None else int(meta.get("iters", 12))
    params = jax.device_put(params)   # argument, not a baked-in closure

    def _one(params, img1, img2):
        with jax.default_matmul_precision("default"):
            return model.apply({"params": params}, img1, img2, iters=n_iters)

    @jax.jit
    def run(params, img1s, img2s):
        B, H, W, _ = img1s.shape
        one = lambda a, b: _one(params, a, b)
        if scale != 1.0:
            hs = int(round(H * scale / 8.0)) * 8
            ws = int(round(W * scale / 8.0)) * 8
            i1 = jax.image.resize(img1s, (B, hs, ws, 3), "bilinear")
            i2 = jax.image.resize(img2s, (B, hs, ws, 3), "bilinear")
            fl = jax.vmap(one)(i1, i2)
            fl = jax.image.resize(fl, (B, H, W, 2), "bilinear")
            return fl * jnp.asarray([W / ws, H / hs], fl.dtype)
        return jax.vmap(one)(img1s, img2s)

    def apply(img1s, img2s):
        img1s = jnp.asarray(img1s, jnp.float32)
        img2s = jnp.asarray(img2s, jnp.float32)
        B, H, W, _ = img1s.shape
        ph = (-H) % 8
        pw = (-W) % 8
        if ph or pw:
            img1s = jnp.pad(img1s, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
            img2s = jnp.pad(img2s, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        return run(params, img1s, img2s)[:, :H, :W]

    return apply


def load_flow_apply_pairs(ckpt, iters=None, mesh=None, per_device: int = 8,
                          scale: float = 1.0, refine_schedule=None,
                          refine_max_total: float = 3.0):
    """Pair-indexed flow apply against a device-resident frame stack.

    Returns `apply(stack, ia, ib) -> flows [N, H, W, 2] (device)` where `stack`
    is the full uint8 frame stack [T, H, W, 3] (device array or host; uploaded
    once) and ia/ib are frame indices per pair. Motivation: the tunneled TPU
    moves host<->device data at tens of MB/s, so sending every pair as two f32
    images (the reference's per-pair GPU loop shape) costs more than the net
    itself — one 64 MB uint8 upload + on-device pair indexing replaces ~2.6 GB
    of H2D traffic for a 48-frame sequence, and outputs stay on device for the
    refinement/selfcal/tracking consumers.

    `refine_schedule`: when set (tuple of (iters, sigma, radius) phases), the
    photometric Lucas-Kanade refinement (flow/refine.py) runs fused in the SAME
    jit dispatch as the net forward — one program per pair block instead of a
    separate chunked refinement pass (the round-3 flow stage spent ~60% of its
    wall time on per-dispatch tunnel latency of the split pipeline). The
    returned apply carries `.refines = True` so the pipeline stage skips its
    standalone refinement loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..parallel.mesh import data_sharding, make_mesh

    if mesh is None:
        mesh = make_mesh()
    nd = int(np.prod(list(mesh.shape.values())))
    block = per_device * nd

    params, meta = load_flow_checkpoint(ckpt)
    model = model_from_meta(meta)
    n_iters = int(iters) if iters is not None else int(meta.get("iters", 12))
    params = jax.device_put(params)   # argument, not a baked-in closure

    def _one(params, img1, img2):
        with jax.default_matmul_precision("default"):
            return model.apply({"params": params}, img1, img2, iters=n_iters)

    def _block_body(params, stack, ia, ib):
        raw1 = stack[ia].astype(jnp.float32)
        raw2 = stack[ib].astype(jnp.float32)
        B, H, W, _ = raw1.shape
        ph = (-H) % 8
        pw = (-W) % 8
        i1, i2 = raw1, raw2
        if ph or pw:
            i1 = jnp.pad(i1, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
            i2 = jnp.pad(i2, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        Hp, Wp = i1.shape[1], i1.shape[2]
        one = lambda a, b: _one(params, a, b)
        if scale != 1.0:
            hs = int(round(Hp * scale / 8.0)) * 8
            ws = int(round(Wp * scale / 8.0)) * 8
            i1 = jax.image.resize(i1, (B, hs, ws, 3), "bilinear")
            i2 = jax.image.resize(i2, (B, hs, ws, 3), "bilinear")
            fl = jax.vmap(one)(i1, i2)
            fl = jax.image.resize(fl, (B, Hp, Wp, 2), "bilinear")
            fl = fl * jnp.asarray([Wp / ws, Hp / hs], fl.dtype)
        else:
            fl = jax.vmap(one)(i1, i2)
        fl = fl[:, :H, :W]
        if refine_schedule:
            from .refine import photometric_refine_scheduled

            fl = photometric_refine_scheduled(
                raw1 / 255.0, raw2 / 255.0, fl,
                schedule=refine_schedule, max_total=refine_max_total,
            )
        return fl

    run_block = jax.jit(_block_body)

    @jax.jit
    def run_chunks(params, stack, ia2, ib2):
        """Many blocks in ONE dispatch: lax.scan over [C, block] index chunks.
        Each scan step is bit-identical to a standalone run_block call (same
        per-block batch, so the per_device=8 bf16 numerics bisected in round 4
        are unchanged); the win is C-1 fewer tunnel dispatches — the round-4
        flow stage spent most of its 36 s/seq on per-dispatch latency of 23
        sequential block dispatches, not on compute (net fwd = 1.77 ms/pair)."""
        def step(_, ab):
            a, b = ab
            return None, _block_body(params, stack, a, b)

        _, fl = jax.lax.scan(step, None, (ia2, ib2))
        return fl                                  # [C, block, H, W, 2]

    idx_sharding = data_sharding(mesh, 1)
    chunk_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data"))
    # bound the per-dispatch footprint: each scan step's flow output is
    # [block, H, W, 2] f32 stacked over C — 48 blocks ≈ 1.4 GB at protocol
    # shape, comfortably inside one chip's HBM
    MAX_CHUNKS = 48

    def apply(stack, ia, ib):
        stack = jax.device_put(jnp.asarray(stack))      # replicated, once
        ia = np.asarray(ia, np.int32)
        ib = np.asarray(ib, np.int32)
        N = len(ia)
        out = []
        k = 0
        while k < N:
            n_here = min(N - k, MAX_CHUNKS * block)
            nch = -(-n_here // block)
            if nch > 1:
                a = ia[k:k + n_here]
                b = ib[k:k + n_here]
                pad = nch * block - n_here
                if pad:
                    a = np.concatenate([a, np.repeat(a[-1:], pad)])
                    b = np.concatenate([b, np.repeat(b[-1:], pad)])
                da = jax.device_put(
                    jnp.asarray(a.reshape(nch, block)), chunk_sharding)
                db = jax.device_put(
                    jnp.asarray(b.reshape(nch, block)), chunk_sharding)
                fl = run_chunks(params, stack, da, db)
                fl = fl.reshape(nch * block, *fl.shape[2:])
                out.append(fl[:n_here] if pad else fl)
            else:
                a, b = ia[k:k + block], ib[k:k + block]
                pad = block - len(a)
                if pad:
                    a = np.concatenate([a, np.repeat(a[-1:], pad)])
                    b = np.concatenate([b, np.repeat(b[-1:], pad)])
                da = jax.device_put(jnp.asarray(a), idx_sharding)
                db = jax.device_put(jnp.asarray(b), idx_sharding)
                fl = run_block(params, stack, da, db)
                out.append(fl[: n_here] if pad else fl)
            k += n_here
        return jnp.concatenate(out, 0) if len(out) > 1 else out[0]

    apply.refines = refine_schedule is not None
    return apply


def load_flow_apply_sharded(ckpt, iters=None, mesh=None, per_device: int = 8,
                            scale: float = 1.0):
    """Flow apply over an arbitrary pair list, data-parallel over a device mesh.

    Returns `apply(img1s, img2s) -> flows [N, H, W, 2]` that processes pairs in
    fixed-size blocks of `per_device * mesh_size` (one static compiled program,
    last block padded), with the block's leading axis sharded over the mesh's
    'data' axis — this is the pipeline counterpart of the reference's
    sequential per-pair RAFT loop (run_particlesfm.py:31-36), SURVEY §2.11.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..parallel.mesh import data_sharding, make_mesh

    if mesh is None:
        mesh = make_mesh()
    nd = int(np.prod(list(mesh.shape.values())))
    block = per_device * nd
    base = load_flow_apply_batch(ckpt, iters=iters, scale=scale)

    sharding = data_sharding(mesh, 4)

    def apply(img1s, img2s):
        img1s = np.asarray(img1s, np.float32)
        img2s = np.asarray(img2s, np.float32)
        N = img1s.shape[0]
        out = []
        for k in range(0, N, block):
            b1, b2 = img1s[k:k + block], img2s[k:k + block]
            pad = block - len(b1)
            if pad:
                b1 = np.concatenate([b1, np.repeat(b1[-1:], pad, 0)])
                b2 = np.concatenate([b2, np.repeat(b2[-1:], pad, 0)])
            d1 = jax.device_put(jnp.asarray(b1), sharding)
            d2 = jax.device_put(jnp.asarray(b2), sharding)
            out.append(np.asarray(base(d1, d2))[: len(img1s[k:k + block])])
        return np.concatenate(out, 0)

    return apply
